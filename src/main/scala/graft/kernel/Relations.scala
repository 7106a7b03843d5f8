package graft.kernel

/** An entity mention with character offsets and a provenance method tag
  * (reference provenance struct, /root/reference/src/types.rs:91-112). */
final case class MentionSpan(
    surface: String,
    entityType: String,
    start: Int,
    end: Int,
    confidence: Double)

/** A raw extracted relation before normalization: subject surface form,
  * Schema.org property (pre-stemming), object (entity surface or
  * literal), plus span provenance: [sentStart, sentEnd) are character
  * offsets of the supporting sentence INTO THE RESOLVED TEXT the
  * relation was extracted from, and sourceText is that sentence — the
  * reference Provenance text_span/source_text
  * (/root/reference/src/types.rs:91-112, attached at
  * extractor.rs:650-666), at sentence rather than whole-chunk grain. */
final case class RawRelation(
    subj: String,
    subjType: String,
    pred: String,
    obj: String,
    objIsEntity: Boolean,
    objType: String,
    sentIdx: Int,
    confidence: Double,
    sentStart: Int = 0,
    sentEnd: Int = 0,
    sourceText: String = "")

/** Deterministic mention detection + pattern relation extraction —
  * the model-free analogues of the reference's GLiNER NER
  * (/root/reference/src/gliner_extractor.rs:192-231) and LLM relation
  * extraction honoring the system-prompt spec
  * (/root/reference/src/extractor.rs:14-117): explicit facts only, fixed
  * entity types, relation direction rules, ISO-8601 dates, nested
  * entities carry only a name, do-not-extract list.
  */
object Relations {

  /** Entity typing dictionary (SURVEY.md §2 T3: capitalized-sequence
    * detector + type dictionary). Suffix/keyword rules first, then a
    * small place gazetteer, then word-count heuristic. */
  private val eduMarkers = Seq("University", "College", "Institute", "School")
  private val orgMarkers = Seq("Corp", "Inc", "LLC", "Ltd", "Company", "Labs", "Group", "Systems")
  val placeGazetteer: Set[String] = Set(
    "Denmark", "France", "Poland", "Germany", "Spain", "Japan", "Brazil",
    "Canada", "Norway", "Sweden", "Austria", "Portugal", "Finland",
    "Ireland", "Iceland", "Belgium", "Hungary", "Croatia", "Estonia",
    "Aarhus", "Lyon", "Krakow", "Hamburg", "Seville", "Osaka", "Recife",
    "Toronto", "Bergen", "Uppsala", "Graz", "Porto", "Tampere", "Galway",
    "Reykjavik", "Ghent", "Szeged", "Split", "Tartu", "Warsaw", "Paris",
    "New York", "San Francisco", "Cupertino", "California")

  def classify(surface: String): String = {
    if (surface.endsWith("Airport")) "Airport"
    else if (eduMarkers.exists(m => surface.contains(m))) "EducationalOrganization"
    else if (orgMarkers.exists(m => surface.contains(m))) "Organization"
    else if (placeGazetteer.contains(surface)) "Place"
    else if (surface.split(" ").length >= 2) "Person"
    else "Place"
  }

  /** GLiNER-type → Schema.org type mapping (gliner_extractor.rs:234-242
    * match table, replicated exactly): person / organization-organisation-
    * company / place-location-city-country / event collapse to the four
    * Schema.org types, anything else passes through as a custom type. */
  def mapToSchemaType(glinerType: String): String =
    glinerType.toLowerCase match {
      case "person" => "Person"
      case "organization" | "organisation" | "company" => "Organization"
      case "place" | "location" | "city" | "country" => "Place"
      case "event" => "Event"
      case _ => glinerType
    }

  /** Scan a text for maximal capitalized sequences (same scan as the
    * coref entity pass, /root/reference/src/coref.rs:275-295) and type
    * them. Offsets are into `text`. */
  def mentions(text: String): Vector[MentionSpan] = {
    val out = Vector.newBuilder[MentionSpan]
    val sentences = text.split('.').filter(_.trim.nonEmpty)
    sentences.foreach { sentence =>
      val sentStart = math.max(0, text.indexOf(sentence))
      val words = Coref.words(sentence)
      var i = 0
      while (i < words.length) {
        if (capWord(words(i)) && Coref.classifyPronoun(stripPunct(words(i))).isEmpty) {
          var j = i + 1
          val ew = Vector.newBuilder[String]
          ew += stripPunct(words(i))
          while (j < words.length && capWord(words(j)) &&
                 !words(j - 1).endsWith(",") && !words(j - 1).endsWith(".")) {
            ew += stripPunct(words(j)); j += 1
          }
          val surface = ew.result().mkString(" ")
          val start = text.indexOf(words(i).takeWhile(c => !",.".contains(c)), sentStart)
          out += MentionSpan(surface, classify(surface),
            math.max(start, 0), math.max(start, 0) + surface.length, 0.9)
          i = j
        } else i += 1
      }
    }
    out.result()
  }

  private def stripPunct(w: String): String =
    w.dropWhile(c => !c.isLetterOrDigit).reverse.dropWhile(c => !c.isLetterOrDigit).reverse

  /** Entity-word predicate for NER/object extraction: starts uppercase.
    * Unlike the coref scan (which excludes ALL-CAPS per coref.rs:474-482),
    * acronyms like "UT"/"MIT" are entity words here — the reference's
    * GLiNER stage and LLM extractor both handle acronyms
    * (test_cases.json:24-29 expects object "UT Austin"). */
  private def capWord(w: String): Boolean = {
    val s = stripPunct(w)
    s.nonEmpty && s.charAt(0).isUpper
  }

  /** All-digit token ("12", "2020") — continues a capitalized entity
    * ("Apollo 12") but can never start one. */
  private def digitWord(w: String): Boolean = {
    val s = stripPunct(w)
    s.nonEmpty && s.forall(_.isDigit)
  }

  /** Leading capitalized entity of a phrase (object side), stopping at a
    * comma — "Aarhus, Denmark" → "Aarhus". Digit tokens extend a
    * running entity ("Apollo 12"). */
  private[kernel] def entityAtStart(phrase: String): Option[String] = {
    val beforeComma = phrase.split(",")(0)
    val words = Coref.words(beforeComma.trim)
    if (words.isEmpty || !capWord(words(0))) return None
    val ew = Vector.newBuilder[String]
    ew += stripPunct(words(0))
    var j = 1
    while (j < words.length && (capWord(words(j)) || digitWord(words(j))) &&
           !words(j - 1).endsWith(".")) {
      ew += stripPunct(words(j)); j += 1
    }
    Some(ew.result().mkString(" "))
  }

  /** Trailing capitalized entity of a phrase (subject side); a trailing
    * digit token joins the capitalized run before it ("Apollo 12"). */
  private[kernel] def entityAtEnd(phrase: String): Option[String] = {
    val words = Coref.words(phrase.trim)
    if (words.isEmpty) return None
    val i0 = words.length - 1
    if (!capWord(words(i0)) &&
        !(digitWord(words(i0)) && i0 > 0 && capWord(words(i0 - 1)))) return None
    var i = i0
    while (i > 0 && (capWord(words(i - 1)) || digitWord(words(i - 1))) &&
           !words(i - 1).endsWith(",") && !words(i - 1).endsWith(".")) i -= 1
    // an entity cannot start on a digit token
    while (i < i0 && digitWord(words(i))) i += 1
    Some(words.slice(i, words.length).map(stripPunct).mkString(" "))
  }

  /** (verb phrase, Schema.org/WebNLG property, object is a date
    * literal). Listed longest-first so "was founded by" wins over
    * "founded" (and "is a part of" over "is part of"). The tail group
    * covers the WebNLG benchmark's dominant lexicalizations
    * (webnlg-sample.xml / webnlg-astronaut.xml phrasings). */
  private val patterns: Seq[(String, String, Boolean)] = Seq(
    ("serves the city of", "location", false),
    ("is headquartered in", "location", false),
    ("was founded by", "foundedBy", false),
    ("is the capital of", "containedInPlace", false),
    ("is a member of", "memberOf", false),
    ("is located in", "location", false),
    ("graduated from", "alumniOf", false),
    ("was born on", "birthDate", true),
    ("was born in", "birthPlace", false),
    ("works for", "worksFor", false),
    ("died on", "deathDate", true),
    // WebNLG lexicalization group
    ("is operated by", "operatingOrganisation", false),
    ("is a part of", "isPartOf", false),
    ("is part of", "isPartOf", false),
    ("is situated in", "location", false),
    ("can be found in", "location", false),
    ("is found in", "location", false),
    ("is led by", "leaderName", false),
    ("founded", "worksFor", false) // direction rule (extractor.rs:34)
  )

  /** Reversed copula form "The <property phrase> of <SUBJ> is <OBJ>" —
    * the other half of the WebNLG lexicalization space ("The leader of
    * Amsterdam is Eberhard van der Laan"). Tried only when no forward
    * pattern matched the sentence. */
  private val reversedPatterns: Seq[(String, String)] = Seq(
    ("the leader of ", "leaderName"),
    ("the location of ", "location"))

  private def tryReversed(sentence: String, sentIdx: Int,
      sentStart: Int, sentEnd: Int): Option[RawRelation] = {
    val lower = sentence.toLowerCase
    reversedPatterns.collectFirst {
      case (prefix, prop) if lower.startsWith(prefix) =>
        val rest = sentence.substring(prefix.length)
        for {
          subj <- entityAtStart(rest)
          subjAt = rest.indexOf(subj)
          if subjAt >= 0
          afterSubj = rest.substring(subjAt + subj.length)
          isAt = afterSubj.indexOf(" is ")
          if isAt >= 0
          obj <- entityAtStart(afterSubj.substring(isAt + 4))
          if Coref.classifyPronoun(subj).isEmpty && Coref.classifyPronoun(obj).isEmpty
        } yield RawRelation(subj, classify(subj), prop, obj, objIsEntity = true,
          classify(obj), sentIdx, 0.9, sentStart, sentEnd, sentence)
    }.flatten
  }

  private val paddedPatterns: Seq[(String, String, Boolean)] =
    patterns.map { case (vp, p, d) => (" " + vp + " ", p, d) }

  /** Extract relations from resolved text, sentence by sentence. Each
    * sentence yields at most one relation (first matching pattern),
    * mirroring the reference's one-fact-per-simple-sentence fixtures.
    * Sentence character offsets into `resolvedText` are tracked so every
    * relation carries its span provenance (O6):
    * resolvedText.substring(sentStart, sentEnd) == sourceText always. */
  def extract(resolvedText: String): Vector[RawRelation] = {
    val pieces = resolvedText.split('.')
    val out = Vector.newBuilder[RawRelation]
    var pos = 0
    var sentIdx = 0
    pieces.foreach { piece =>
      val pieceStart = pos
      pos += piece.length + 1 // the '.' separator
      if (piece.trim.nonEmpty) {
        val sentence = piece.trim
        // the SAME predicate trim uses (c <= ' '), NOT isWhitespace:
        // trim also strips control chars U+0000-U+0008 that isWhitespace
        // rejects, and mixing the two broke the span invariant on such
        // input (ADVICE r02)
        val sentStart = pieceStart + piece.indexWhere(_ > ' ')
        val sentEnd = sentStart + sentence.length
        val forward = paddedPatterns.find { case (vp, _, _) => sentence.contains(vp) }
        forward match {
          case Some((vp, prop, isDate)) =>
            val at = sentence.indexOf(vp)
            val lhs = sentence.substring(0, at)
            val rhs = sentence.substring(at + vp.length)
            val subj = entityAtEnd(lhs)
            val obj: Option[(String, Boolean, String)] =
              if (isDate) Dates.findIso(rhs).map(d => (d, false, ""))
              else entityAtStart(rhs).map(e => (e, true, classify(e)))
            (subj, obj) match {
              case (Some(s), Some((o, isEnt, oType)))
                  // Skip pronoun-surface arguments: the LLM spec resolves
                  // them to entities (extractor.rs:30-33); an unresolved
                  // sentence-initial "He" (the coref self-match quirk,
                  // coref.rs:474-482) must not mint a pronoun entity.
                  if Coref.classifyPronoun(s).isEmpty && Coref.classifyPronoun(o).isEmpty =>
                out += RawRelation(s, classify(s), prop, o, isEnt, oType, sentIdx, 0.9,
                  sentStart, sentEnd, sentence)
              case _ => ()
            }
          case None =>
            tryReversed(sentence, sentIdx, sentStart, sentEnd).foreach(out += _)
        }
        sentIdx += 1
      }
    }
    out.result()
  }

  /** Heuristic triple filter (P12,
    * /root/reference/examples/docred_evaluation.rs:330-358, replicated
    * exactly): drop predicates containing founder/funder/currentceo,
    * the exact predicate "ceo", and alumni not alumniOf. Applied on
    * the *canonical* predicate. */
  def likelyIncorrect(pred: String): Boolean = {
    val p = pred.toLowerCase
    p.contains("founder") || p.contains("funder") || p.contains("currentceo") ||
      p == "ceo" ||
      (p.contains("alumni") && !p.contains("alumniof"))
  }
}

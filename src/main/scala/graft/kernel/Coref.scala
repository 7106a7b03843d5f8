package graft.kernel

/** Result of rule-based coreference resolution (reference `CorefResult`,
  * /root/reference/src/coref.rs:183-196). `mentionMap` is pronoun-word →
  * resolved entity; kept as a sorted Vector of pairs for determinism
  * (the reference's HashMap iteration order is arbitrary). */
final case class CorefOut(
    resolvedText: String,
    mentionMap: Vector[(String, String)],
    nClusters: Int)

/** Rule-based coreference resolution — Stage 0.
  *
  * Bug-for-bug replication of the reference's `resolve_rule_based`
  * (/root/reference/src/coref.rs:261-371), required for the byte-identity
  * contract on resolved text:
  *  - sentences = split on '.' dropping blank segments (coref.rs:263);
  *  - sentence start located via FIRST `indexOf` (coref.rs:269,305 —
  *    repeated sentences resolve to the first occurrence);
  *  - entities = maximal capitalized sequences (coref.rs:275-295) with
  *    `is_proper_noun_start` excluding ALL-CAPS (coref.rs:474-482);
  *  - antecedent = LAST entity (scan order) with
  *    entSent <= sent && sent - entSent <= maxDistance, matching
  *    gender/number heuristics (coref.rs:310-324, 522-543);
  *  - pronoun position via first `indexOf(word, sentStart)`
  *    (coref.rs:326);
  *  - replacements applied in reverse start order, stable
  *    (coref.rs:359-363).
  *
  * Offsets are Java char offsets; fixtures are BMP-safe so this matches
  * the reference's byte offsets on ASCII text.
  */
object Coref {

  val defaultMaxDistance = 3 // coref.rs:98

  sealed trait PronounType
  case object Masculine extends PronounType
  case object Feminine extends PronounType
  case object Neutral extends PronounType
  case object Plural extends PronounType

  /** coref.rs:508-518. Strips non-alphabetic edge chars then lowercases. */
  def classifyPronoun(word: String): Option[PronounType] = {
    val w = word.toLowerCase.dropWhile(c => !c.isLetter).reverse
      .dropWhile(c => !c.isLetter).reverse
    w match {
      case "he" | "him" | "his" | "himself" => Some(Masculine)
      case "she" | "her" | "hers" | "herself" => Some(Feminine)
      case "it" | "its" | "itself" => Some(Neutral)
      case "they" | "them" | "their" | "theirs" | "themselves" => Some(Plural)
      case _ => None
    }
  }

  /** coref.rs:474-482: capitalized, len>1, 2nd char not uppercase. */
  def isProperNounStart(word: String): Boolean =
    word.length > 1 && word.charAt(0).isUpper && !word.charAt(1).isUpper

  /** coref.rs:485-496: capitalized; rest lowercase or non-alphabetic. */
  def isProperNoun(word: String): Boolean =
    word.nonEmpty && word.charAt(0).isUpper &&
      word.drop(1).forall(c => c.isLower || !c.isLetter)

  /** coref.rs:522-543. */
  def matchesPronoun(entity: String, p: PronounType): Boolean = p match {
    case Masculine | Feminine =>
      Coref.words(entity).length <= 3 &&
        !entity.toLowerCase.contains(" and ")
    case Neutral =>
      entity.contains("Corp") || entity.contains("Inc") ||
        entity.contains("LLC") || entity.contains("Ltd") ||
        entity.contains("Company")
    case Plural =>
      entity.contains(" and ") || entity.endsWith("s")
  }

  private val WS = java.util.regex.Pattern.compile("\\s+")
  private[kernel] def words(s: String): Array[String] =
    WS.split(s).filter(_.nonEmpty)

  def resolve(text: String, maxDistance: Int = defaultMaxDistance): CorefOut = {
    val sentences = text.split('.').filter(_.trim.nonEmpty)

    // (entityText, sentIdx) in scan order (offsets unused downstream).
    val entities = Vector.newBuilder[(String, Int)]
    sentences.zipWithIndex.foreach { case (sentence, sentIdx) =>
      val words = Coref.words(sentence)
      var i = 0
      while (i < words.length) {
        if (isProperNounStart(words(i))) {
          var j = i + 1
          val ew = Vector.newBuilder[String]
          ew += words(i)
          while (j < words.length && isProperNoun(words(j))) { ew += words(j); j += 1 }
          entities += ((ew.result().mkString(" "), sentIdx))
          i = j
        } else i += 1
      }
    }
    val ents = entities.result()

    val replacements = Vector.newBuilder[(Int, Int, String)]
    val mentionMap = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val clusterMains = scala.collection.mutable.LinkedHashSet.empty[String]

    sentences.zipWithIndex.foreach { case (sentence, sentIdx) =>
      val sentStart = math.max(0, text.indexOf(sentence)) // find-first quirk
      Coref.words(sentence).foreach { word =>
        classifyPronoun(word).foreach { p =>
          val candidate = ents.filter { case (_, es) =>
            es <= sentIdx && (sentIdx - es) <= maxDistance
          }.filter { case (e, _) => matchesPronoun(e, p) }.lastOption
          candidate.foreach { case (entity, _) =>
            val pronounStart = text.indexOf(word, sentStart)
            if (pronounStart >= 0) {
              val absStart = pronounStart
              val absEnd = absStart + word.length
              replacements += ((absStart, absEnd, entity))
              mentionMap(word) = entity
              clusterMains += entity
            }
          }
        }
      }
    }

    // Apply in reverse start order (stable on ties, coref.rs:359-363).
    var resolved = text
    replacements.result().sortBy(r => -r._1).foreach { case (s, e, rep) =>
      resolved = resolved.substring(0, s) + rep + resolved.substring(e)
    }

    CorefOut(resolved, mentionMap.toVector.sortBy(_._1), clusterMains.size)
  }
}

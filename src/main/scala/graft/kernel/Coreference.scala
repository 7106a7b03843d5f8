package graft.kernel

/** The reference's SECOND rule-based coreference engine
  * (/root/reference/src/coreference.rs — distinct from coref.rs, which
  * graft.kernel.Coref replicates). Replicated bug-for-bug:
  *
  *  - mention detection (coreference.rs:289-315): words from a
  *    whitespace split, but offsets accumulated as len(word)+1 — so
  *    offsets DRIFT after any run of 2+ whitespace chars (the reference
  *    scan assumes single spaces); a pronoun match compares the WHOLE
  *    word lowercased against the pronoun list, so "He." (attached
  *    punctuation) is NOT detected;
  *  - antecedent search (coreference.rs:327-344): last whitespace-word
  *    before the pronoun's (drifted) offset with length > 2, uppercase
  *    first char, not in {The, A, An, This} — punctuation stays attached
  *    (an antecedent can be "Shalev,"), and a capitalized 3+-letter
  *    pronoun like "She" can itself be an antecedent;
  *  - resolution (coreference.rs:349-387): pronouns replaced in REVERSE
  *    order using original offsets; per-pronoun singleton clusters with
  *    confidence 0.6 and canonical_offset 0.
  *
  * Engine selection mirrors the reference's CoreferenceStrategy config
  * (coreference.rs:104-200): None / RuleBased here; the sidecar and
  * LLM strategies are network services and out of scope offline.
  */
object Coreference {

  final case class Mention(text: String, start: Int, end: Int, mentionType: String)
  final case class Cluster(canonical: String, canonicalOffset: Int,
      mentions: Vector[Mention], confidence: Float)
  final case class Result(resolvedText: String, clusters: Vector[Cluster],
      offsetToCanonical: Map[Int, String])

  private val pronouns = Set(
    "he", "him", "his", "she", "her", "hers", "it", "its",
    "they", "them", "their", "theirs")

  private val antecedentStop = Set("The", "A", "An", "This")

  /** Whitespace words with the reference's DRIFTING offset arithmetic
    * (cumulative len+1, coreference.rs:296-303). */
  private def scanWords(text: String): Vector[(Int, String)] = {
    var offset = 0
    text.split("\\s+").filter(_.nonEmpty).toVector.map { w =>
      val start = offset
      offset += w.length + 1
      (start, w)
    }
  }

  /** coreference.rs:289-315. */
  def detectMentions(text: String): Vector[Mention] =
    scanWords(text).collect {
      case (off, w) if pronouns.contains(w.toLowerCase) =>
        Mention(w, off, off + w.length, "Pronominal")
    }

  /** coreference.rs:327-344: last capitalized 3+-char word before the
    * offset, stop-list filtered, punctuation attached. */
  def findAntecedent(text: String, pronounOffset: Int): Option[String] = {
    val before = text.substring(0, math.min(pronounOffset, text.length))
    before.split("\\s+").filter(_.nonEmpty).reverseIterator.find { w =>
      w.length > 2 && w.headOption.exists(_.isUpper) && !antecedentStop.contains(w)
    }
  }

  /** coreference.rs:349-387: reverse-order replacement on the original
    * offsets. */
  def resolve(text: String): Result = {
    val mentions = detectMentions(text)
    if (mentions.isEmpty) return Result(text, Vector.empty, Map.empty)
    val sb = new StringBuilder(text)
    val offsetMap = Map.newBuilder[Int, String]
    val clusters = Vector.newBuilder[Cluster]
    mentions.reverseIterator.foreach { m =>
      findAntecedent(text, m.start).foreach { ant =>
        // drifted offsets can run past the end; clamp like a byte-range
        // replace would panic in Rust — in practice the fixtures stay
        // in range, and clamping keeps the row-tolerant contract (O4)
        val s = math.min(m.start, sb.length)
        val e = math.min(m.end, sb.length)
        sb.replace(s, e, ant)
        offsetMap += (m.start -> ant)
        clusters += Cluster(ant, 0, Vector(m), 0.6f)
      }
    }
    Result(sb.toString, clusters.result(), offsetMap.result())
  }

  /** Adapter to the Coref engine surface: (resolvedText, mentionMap)
    * with alias = pronoun surface, canonical = antecedent — so Kg can
    * switch engines behind one interface. */
  def asCorefResult(text: String): (String, Map[String, String]) = {
    val r = resolve(text)
    (r.resolvedText,
      r.clusters.map(c => c.mentions.head.text -> c.canonical).toMap)
  }
}

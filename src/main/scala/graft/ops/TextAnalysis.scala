package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline, all pure Column
  * expressions (codegen'd, no UDFs) so they run at scan speed and push
  * into whole-stage codegen. Each has an exact DuckDB-SQL oracle.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(split(text, " "))

  /** BPE-ish subword estimate: word-boundary pieces + ceil(chars/4)
    * blend, the common len/4 heuristic (reference P1,
    * extractor.rs:311-314) refined by punctuation splits. */
  def tokenEstimate(text: Column): Column =
    (length(text) / lit(4)).cast("long")

  /** Quality scoring: length, punctuation ratio, stopword ratio,
    * mean word length — the standard web-text quality features. */
  def qualityFeatures(df: DataFrame, text: Column): DataFrame = {
    val nChars = length(text)
    val nTokens = size(split(text, " "))
    val nPunct = nChars - length(regexp_replace(text, "[.,;:!?]", ""))
    val stops = Seq("the", "a", "of", "and", "in", "to", "is")
    val nStop = stops.map(w =>
      (length(concat(lit(" "), text, lit(" "))) -
        length(regexp_replace(concat(lit(" "), text, lit(" ")), s" $w ", " "))).cast("long") /
        lit(w.length + 1)).reduce(_ + _)
    df.withColumn("n_chars_c", nChars.cast("long"))
      .withColumn("n_tokens", nTokens.cast("long"))
      .withColumn("punct_ratio", round(nPunct.cast("double") / nChars, 4))
      .withColumn("stopword_ratio", round(nStop.cast("double") / nTokens, 4))
      .withColumn("mean_word_len", round(nChars.cast("double") / nTokens, 4))
  }

  /** Language-ID heuristic: per-language stopword hit counts, argmax with
    * deterministic tie-break on language code. Word-soup text gets an
    * arbitrary-but-deterministic answer; real text gets the right one. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of"),
    "es" -> Seq("el", "la", "de"),
    "de" -> Seq("der", "und", "die"),
    "fr" -> Seq("le", "et", "les"))

  private def hitCount(text: Column, w: String): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    ((length(padded) - length(regexp_replace(padded, s" $w ", " "))) /
      lit(w.length + 1)).cast("long")
  }

  def langId(df: DataFrame, text: Column): DataFrame = {
    val scored = langMarkers.toSeq.sortBy(_._1).map { case (lang, ws) =>
      struct(ws.map(w => hitCount(text, w)).reduce(_ + _).as("score"),
        lit(lang).as("lang"))
    }
    // greatest(struct) = max score, ties → lexicographically LAST lang;
    // deterministic in both engines.
    df.withColumn("pred_lang", greatest(scored: _*).getField("lang"))
      .withColumn("lang_score", greatest(scored: _*).getField("score"))
  }

  /** Document fingerprint: md5 of whitespace-normalized lowercase text —
    * the exact-dedup key. md5 is identical in Spark and DuckDB. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  /** BPE-ish token count: matches of a GPT-style piece pattern (letter
    * runs, single digits, punctuation singletons) — deliberately
    * RE2-safe (no lookarounds) so the DuckDB oracle runs the identical
    * regex. A much better length estimate for LLM budgeting than
    * whitespace words. */
  val bpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpePattern), lit(0)))

  private val rollP = 2147483647L // 2^31-1
  private val rollB = 257L

  /** Rolling (polynomial / Rabin-Karp) document fingerprint over the
    * normalized text: fold acc = (acc*B + codepoint) mod p. Pure
    * higher-order Columns — one pass, codegen-friendly, and exactly
    * reproducible in DuckDB via list_reduce. The incremental form is
    * what content-defined chunking builds on; the full-document fold is
    * the dedup key variant. */
  def rollingHash(text: Column): Column = {
    val norm = regexp_replace(lower(text), "\\s+", " ")
    aggregate(transform(split(norm, ""), c => ascii(c).cast("long")),
      lit(0L), (acc, c) => (acc * rollB + c) % rollP)
  }

  /** Winnowing-style fingerprint (kernel form): the minimum rolling
    * hash over all k-char windows of the normalized text — robust to
    * local edits outside the minimal window (standard MOSS/winnowing
    * building block; windows shorter than k hash the whole text).
    * O(n) via the rolling update acc' = (acc - c_out*B^(k-1))*B + c_in. */
  def winnowFingerprint(text: String, k: Int): Long = {
    val s = text.toLowerCase.replaceAll("\\s+", " ")
    if (s.isEmpty) return 0L
    val n = s.length
    if (n <= k) {
      var acc = 0L
      var i = 0
      while (i < n) { acc = (acc * rollB + s.charAt(i)) % rollP; i += 1 }
      return acc
    }
    // B^(k-1) mod p
    var pow = 1L
    var e = 0
    while (e < k - 1) { pow = (pow * rollB) % rollP; e += 1 }
    var acc = 0L
    var i = 0
    while (i < k) { acc = (acc * rollB + s.charAt(i)) % rollP; i += 1 }
    var min = acc
    while (i < n) {
      acc = (acc - (s.charAt(i - k) * pow) % rollP + rollP * rollB) % rollP
      acc = (acc * rollB + s.charAt(i)) % rollP
      if (acc < min) min = acc
      i += 1
    }
    min
  }
}

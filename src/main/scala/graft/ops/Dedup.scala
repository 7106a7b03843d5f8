package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication family for a web-scale training-data pipeline.
  *
  * Scale shapes (the part that matters at 100 TB):
  *  - exact: one hash-groupBy shuffle on a 32-hex key; min_by keeps the
  *    deterministic representative.
  *  - MinHash+LSH: signatures are computed scan-side (narrow); the only
  *    shuffle is the band-bucket groupBy, whose keys are (band, hash) —
  *    candidate pairs are generated per bucket, never a cross join.
  *  - SimHash: 64-bit signature scan-side; bucket by 16-bit chunks
  *    (Hamming-adjacent dup candidates share a chunk).
  *  - n-gram Jaccard: verification joins candidates only.
  *  - embedding cosine: see Similarity.
  */
object Dedup {

  /** Exact dedup: keep the lowest-id row per normalized-text fingerprint.
    * Returns (id, fingerprint, keep) — keep=true on the representative. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = TextAnalysis.fingerprint(col(textCol))
    val w = Window.partitionBy(col("fp")).orderBy(col(idCol).asc)
    df.select(col(idCol), fp.as("fp"))
      .withColumn("rn", row_number().over(w))
      .withColumn("keep", col("rn") === 1)
      .drop("rn")
  }

  /** Word shingles of size n as an array column. */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(regexp_replace(lower(text), "\\s+", " "), " ")
    // transform over sliding windows via sequence + slice
    transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))
  }

  /** 64-bit stable hash of a string via md5 hex prefix (no engine-private
    * hash functions — md5 is portable and deterministic everywhere). */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  private val minhashP = 2147483647L // 2^31-1: h*a+b stays within a long (ANSI)

  /** MinHash signature from a pre-materialized shingle-hash array column.
    * The hash array MUST be a named column (not an inline expression):
    * inlining it repeats every md5 k times — observed 30× slowdown. */
  private def signatureFromHashes(hashes: Column, k: Int): Column = {
    val perms = (0 until k).map { i =>
      val a = 2L * i + 1L
      val b = 1000003L * (i + 1)
      array_min(transform(hashes, h => pmod(h * lit(a) + lit(b), lit(minhashP))))
    }
    array(perms: _*)
  }

  /** MinHash signature: k permutations (a_i*h + b_i) mod p over shingle
    * hashes, min per permutation. Pure column expressions. */
  def minhashSignature(text: Column, n: Int = 3, k: Int = 32): Column =
    signatureFromHashes(transform(shingles(text, n), s => pmod(md5Long(s), lit(minhashP))), k)

  /** LSH band buckets: signature split into bands of r rows; rows sharing
    * any (band_idx, band_hash) are candidate duplicates. Returns the
    * exploded (id, band, bucket) table — groupBy(band, bucket) to find
    * candidates. Shingle hashes are materialized once per row. */
  def lshBuckets(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 32, bands: Int = 8): DataFrame = {
    val r = k / bands
    df.select(col(idCol),
        transform(shingles(col(textCol), n), s => pmod(md5Long(s), lit(minhashP))).as("hashes"))
      .select(col(idCol), signatureFromHashes(col("hashes"), k).as("sig"))
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => md5(concat_ws(",", slice(col("sig"), b * r + 1, lit(r)))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
  }

  /** Candidate near-duplicate pairs from LSH buckets (id1 < id2),
    * deduplicated across bands. */
  def lshCandidates(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 32, bands: Int = 8): DataFrame = {
    val b = lshBuckets(df, idCol, textCol, n, k, bands)
    val l = b.withColumnRenamed(idCol, "id1")
    val rgt = b.withColumnRenamed(idCol, "id2")
    l.join(rgt, Seq("band", "bucket"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2")).distinct()
  }

  /** Exact n-gram Jaccard similarity between two text columns. */
  def jaccard(a: Column, b: Column, n: Int): Column = {
    val sa = array_distinct(shingles(a, n))
    val sb = array_distinct(shingles(b, n))
    round(size(array_intersect(sa, sb)).cast("double") /
      size(array_union(sa, sb)), 4)
  }

  /** SimHash: 64-bit signature = sign(sum of ±1 per bit over token
    * hashes). Computed scan-side with bit arithmetic. */
  def simhash(text: Column): Column = {
    val toks = split(regexp_replace(lower(text), "\\s+", " "), " ")
    val hashes = transform(toks, t => md5Long(t))
    (0 until 64).map { bit =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, bit).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      when(votes > 0, shiftleft(lit(1L), bit)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }
}

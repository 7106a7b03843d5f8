package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic membership sketches — the seen-set primitive a crawl
  * pipeline consults before re-fetching/re-ingesting (Bloom 1970). The
  * filter is deterministic here (md5-derived positions, no seed state),
  * so two engines — and two cluster runs — build bit-identical sketches
  * from the same keyset.
  */
object Sketch {

  /** The k bit positions of a key: position i = the verified md5→60-bit
    * toolbox hash of "i:key", mod mBits. Pure columns, codegen'd; the
    * DuckDB oracle re-derives the identical positions. */
  def bloomPositions(key: Column, mBits: Int, kHashes: Int): Column =
    array((0 until kHashes).map { i =>
      pmod(conv(substring(md5(concat(lit(s"$i:"), key)), 1, 15), 16, 10)
        .cast("long"), lit(mBits.toLong))
    }: _*)

  /** Kernel twin of bloomPositions (equivalence-tested in OpsSpec):
    * the same md5 prefix parsed as 60 bits — used by the probe scan so
    * the hot path is one digest per hash, not a plan-side expression
    * re-evaluated per branch. */
  def bloomPositionsKernel(key: String, mBits: Int, kHashes: Int): Array[Long] = {
    val out = new Array[Long](kHashes)
    var i = 0
    while (i < kHashes) {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:$key".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = md.take(8).map(b => f"${b & 0xff}%02x").mkString.take(15)
      val v = java.lang.Long.parseLong(hex, 16) // 60 bits, never negative
      out(i) = v % mBits
      i += 1
    }
    out
  }

  /** Build the filter from a keyset: ONE distinct aggregation of bit
    * positions — never more than mBits rows regardless of corpus size,
    * the vocabulary/codebook driver tier — packed into a bitset the
    * probe side broadcasts. At 100 TB the build is a narrow scan + an
    * mBits-bounded shuffle; the artifact is mBits/8 bytes. */
  def bloomBuild(keys: DataFrame, keyCol: String, mBits: Int, kHashes: Int): Array[Long] = {
    val pos = keys
      .select(explode(bloomPositions(col(keyCol), mBits, kHashes)).as("p"))
      .distinct()
      .collect().map(_.getLong(0))
    val bits = new Array[Long]((mBits + 63) / 64)
    pos.foreach(p => bits((p >>> 6).toInt) |= (1L << (p & 63)))
    bits
  }

  /** Probe every row against a built filter: a narrow mapPartitions
    * scan with the broadcast bitset — k digests + k bit tests per row,
    * no join, no shuffle. maybe_seen = all k positions set (no false
    * negatives by construction; false-positive rate governed by the
    * build's fill factor). Returns (idCol, maybe_seen). */
  def bloomProbe(df: DataFrame, idCol: String, keyCol: String,
      bits: Array[Long], mBits: Int, kHashes: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(bits)
    df.select(col(idCol).cast("long"), col(keyCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val bs = bc.value
        it.map { case (id, key) =>
          val pos = bloomPositionsKernel(key, mBits, kHashes)
          var ok = true
          var i = 0
          while (i < pos.length && ok) {
            ok = (bs((pos(i) >>> 6).toInt) & (1L << (pos(i) & 63))) != 0
            i += 1
          }
          (id, ok)
        }
      }
      .toDF(idCol, "maybe_seen")
  }

  /** Columnar executable spec of build∘probe (equivalence-tested in
    * OpsSpec, and the shape a no-driver-collect variant would use):
    * probe positions exploded, broadcast-joined to the build's distinct
    * position table, maybe_seen = every one of the k rows matched. */
  def bloomProbeSpec(df: DataFrame, idCol: String, keyCol: String,
      keys: DataFrame, buildKeyCol: String, mBits: Int, kHashes: Int): DataFrame = {
    val built = keys
      .select(explode(bloomPositions(col(buildKeyCol), mBits, kHashes)).as("p"))
      .distinct()
      .withColumn("hit", lit(1))
    df.select(col(idCol).cast("long").as(idCol),
        explode(bloomPositions(col(keyCol), mBits, kHashes)).as("p"))
      .join(broadcast(built), Seq("p"), "left")
      .groupBy(col(idCol))
      .agg((count(col("hit")) === kHashes).as("maybe_seen"))
  }
}

package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline.{Checkpointed, Corpus}

/** spark-submit entry point: resumable KG construction over the
  * synthesized Common-Crawl-style corpus.
  *
  *   spark-submit --class graft.Main <jar> <nPages> <baseDir> [nBuckets] [runId]
  *
  * Re-running after a kill resumes: completed url-domain buckets are
  * skipped via their _done manifests (see pipeline.Checkpointed). On a
  * real cluster the session builder inherits master/executors from
  * spark-submit; local runs default to local[*]. */
object Main {
  def main(args: Array[String]): Unit = {
    val nPages = if (args.nonEmpty) args(0).toLong else 100000L
    val baseDir = if (args.length > 1) args(1) else "/tmp/graft_kg"
    val nBuckets = if (args.length > 2) args(2).toInt else 64
    val runId = if (args.length > 3) args(3).toLong else 1L
    val spark = SparkSession.builder()
      .appName("graft-kg-construct")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "128"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    Checkpointed.runAll(Corpus.pages(spark, nPages), Corpus.kb(spark), baseDir, nBuckets, runId)
    val dt = (System.nanoTime() - t0) / 1e9
    val nt = spark.read.parquet(s"$baseDir/triples").count()
    val ne = spark.read.parquet(s"$baseDir/edges").count()
    println(f"""{"main":"kg","pages":$nPages,"sec":$dt%.2f,"triples":$nt,"edges":$ne,"docs_per_sec":${nPages / dt}%.1f}""")
    spark.stop()
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.pipeline.{Checkpointed, Kg, Page, TripleRow}

/** Structured Streaming extension (SURVEY.md §2.9: the reference is
  * batch-only; this is the natural streaming surface for continuous
  * crawl ingestion — readStream → the SAME fused extraction transform →
  * foreachBatch append, with Trigger.AvailableNow for catch-up runs).
  *
  * The extraction transform is shared verbatim with the batch path
  * (Kg.extractTriplesFused), so streaming and batch produce identical
  * triples for identical pages; per-batch dedup happens in foreachBatch
  * and global dedup is deferred to the graph build (same as batch).
  */
object StreamIngest {

  /** The streaming-safe transform: narrow only (no global dedup —
    * a streaming groupBy would need full state; dedup is per-batch). */
  def transform(pages: Dataset[Page]): Dataset[TripleRow] =
    Kg.extractTriplesFused(pages)

  /** File-source ingestion: watch `pagesDir` for parquet page files,
    * extract, write bucketed triples under `outDir/triples`.
    * Trigger.AvailableNow processes the backlog then stops.
    *
    * Exactly-once sink on an at-least-once contract: foreachBatch can
    * REPLAY a batch after a failure, so a blind append would duplicate
    * that batch's triples and break the streaming==batch equivalence
    * (triples must stay unique on (url,subj,pred,obj) for the graph
    * build). The output is therefore partitioned by (batch, pk) and
    * written with dynamic partition overwrite: a replayed batchId
    * replaces exactly its own partitions, byte-identical (the kernel is
    * deterministic), never appending twice. */
  def run(spark: SparkSession, pagesDir: String, outDir: String,
      checkpointDir: String, nBuckets: Int = 16): StreamingQuery = {
    import spark.implicits._
    val pages = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Page]].schema)
      .parquet(pagesDir)
      .as[Page]
    transform(pages).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[TripleRow], batchId: Long) =>
        writeBatch(batch, batchId, outDir, nBuckets)
      }
      .start()
  }

  /** The idempotent per-batch sink (see `run`). Public so the replay
    * contract is directly testable: writing the same (batch, batchId)
    * twice yields the same rows as writing it once. */
  def writeBatch(batch: Dataset[TripleRow], batchId: Long, outDir: String,
      nBuckets: Int): Unit = {
    batch.sparkSession.conf
      .set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    Kg.dedup(batch)
      .withColumn("batch", lit(batchId))
      .withColumn("pk", Checkpointed.bucketOf(col("url"), nBuckets))
      .write.mode("overwrite").partitionBy("batch", "pk")
      .parquet(s"$outDir/triples")
    ()
  }

  /** Windowed throughput monitor: triples per 1-hour warc_ts window with
    * a 2-hour watermark — the standard watermark + window aggregation
    * shape, usable on the stream or (as here) testable on any Dataset. */
  def windowedCounts(triplesWithTs: DataFrame): DataFrame =
    triplesWithTs
      .withWatermark("warc_ts", "2 hours")
      .groupBy(window(col("warc_ts"), "1 hour"), col("pred"))
      .agg(count(lit(1)).as("n_triples"))
}

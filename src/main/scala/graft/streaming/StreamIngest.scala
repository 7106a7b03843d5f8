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

  /** Extraction transform that KEEPS the page's warc_ts on every triple
    * (the event-time column streaming-stateful operators key on). */
  def transformWithTs(pages: Dataset[Page]): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.flatMap(p => Kg.extractPage(p).map(t => (t, p.warc_ts)))
      .select(col("_1.*"), col("_2").as("warc_ts"))
  }

  /** Streaming-native cross-batch dedup: dropDuplicatesWithinWatermark
    * on the triple key — a recrawl of the same page inside the
    * watermark horizon emits nothing new, and state is BOUNDED by the
    * watermark (the unbounded-state trap of a plain dropDuplicates on a
    * stream). Use a delay ≥ the recrawl window. */
  def dedupedTriples(pagesStream: Dataset[Page], delay: String): DataFrame =
    transformWithTs(pagesStream)
      .withWatermark("warc_ts", delay)
      .dropDuplicatesWithinWatermark("url", "subj", "pred", "obj")

  /** File-source ingestion with streaming dedup: like `run`, but
    * duplicates arriving in LATER micro-batches (recrawls) are dropped
    * by keyed state instead of surviving until the graph build. */
  def runDeduped(spark: SparkSession, pagesDir: String, outDir: String,
      checkpointDir: String, delay: String = "20000 hours",
      maxFilesPerTrigger: Int = 1, nBuckets: Int = 16): StreamingQuery = {
    import spark.implicits._
    val pages = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Page]].schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(pagesDir)
      .as[Page]
    dedupedTriples(pages, delay).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        writeBatch(batch.drop("warc_ts").as[TripleRow], batchId, outDir, nBuckets)
      }
      .start()
  }

  /** Streaming LINKING: the flagship enrichment run continuously — each
    * micro-batch's triples link against the static KB and materialize
    * straight to the edge table (stream-static enrichment inside
    * foreachBatch, where the top-1 link window is legal). Soundness is
    * the same invariant the incremental batch build rests on: a
    * surface's IRI is a PURE function of (surface, KB), so per-batch
    * edge builds union to exactly the all-at-once batch edges
    * (StreamIngestSpec asserts streamed == batch). The sink reuses the
    * (batch, pk) dynamic-overwrite idempotence contract of `run`.
    *
    * The NODE table streams too: each micro-batch writes its
    * vocabulary-sized node rows as a DELTA under `outDir/nodes/batch=N`
    * (same dynamic-overwrite replay contract as the edges — a replayed
    * batch replaces exactly its own delta, never appends), and
    * `streamedNodes` folds the deltas with the associative
    * `Pipeline.reduceNodes` merge `Checkpointed.runAll` uses for
    * incremental batch. A delta log beats per-batch read-modify-write
    * of one nodes table inside the sink: no torn-table crash window
    * between reading the previous table and overwriting it, and replay
    * idempotence comes from the partition contract instead of relying
    * on the merge's idempotence. Deltas are vocabulary-sized, so the
    * read-time reduce is bounded; `compactNodes` caps the delta count
    * for long-lived streams. */
  def runLinked(spark: SparkSession, pagesDir: String, outDir: String,
      checkpointDir: String, kb: Dataset[graft.pipeline.KbEntry],
      kbCountHint: Option[Long] = None, nBuckets: Int = 16,
      maxFilesPerTrigger: Option[Int] = None,
      batchVocabBroadcastable: Boolean = true): StreamingQuery = {
    import spark.implicits._
    val reader = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Page]].schema)
    // bound files per micro-batch so AvailableNow genuinely exercises
    // the MULTI-batch path (kg_stream_parity's setup) instead of
    // swallowing the whole backlog in one batch
    val pages = maxFilesPerTrigger
      .fold(reader)(m => reader.option("maxFilesPerTrigger", m))
      .parquet(pagesDir)
      .as[Page]
    transform(pages).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[TripleRow], batchId: Long) =>
        // Eagerly materialize the batch's deduped triples ONCE: the
        // graph build references them from four plan branches (the
        // surfaceInfo union twice, nodes, edges), and in a micro-batch
        // there is no parquet checkpoint upstream — each branch would
        // re-run the batch's extraction + dedup shuffle (measured: the
        // whole slice extracts in ~0.5 s but runLinked paid ~7 s per
        // batch). Batch-sized, released in the finally below (the
        // checkpoint-RDD leak the StreamIngestSpec guard watches for).
        val trip = Kg.dedup(batch).localCheckpoint(true)
        // Per-batch graph build. Default: the LEAN batch-bounded path —
        // a micro-batch's surface vocabulary is bounded by the batch
        // (maxFilesPerTrigger), so the vocabulary→IRI table is built in
        // ONE eager materialization (no per-batch persist+count pair to
        // size the broadcast tier — the bound IS the tier decision) and
        // the link/join-back sides broadcast. Identical rows to
        // graphFromTriplesReleasable (same rollup, same linkSurfaces,
        // same mint — StreamIngestSpec's streamed==batch law pins it);
        // measured ~2 fewer driver-planned jobs per batch. A caller
        // whose batches are NOT vocabulary-bounded (no file cap, jumbo
        // backfills) passes batchVocabBroadcastable=false to keep the
        // size-tiered build.
        val (nodes, edges, release) =
          if (!batchVocabBroadcastable)
            graft.pipeline.Pipeline
              .graphFromTriplesReleasable(trip, kb, kbCountHint = kbCountHint)
          else {
            val surfaceInfo = graft.pipeline.Pipeline.surfaceRollup(trip.toDF)
            val links = graft.pipeline.Pipeline.linkSurfaces(
              surfaceInfo.select(col("surface")), kb, kbCountHint = kbCountHint)
            val surfaceIri = graft.pipeline.Pipeline
              .mintIris(surfaceInfo, links, useBroadcast = true)
              .localCheckpoint(true)
            val nodes0 = graft.pipeline.Pipeline.reduceNodes(
              surfaceIri.select(col("iri"), col("entity_type"),
                col("surface").as("name"), col("slug")))
            val edges0 = graft.pipeline.Pipeline
              .edgesFromVocab(trip.toDF, surfaceIri, useBroadcast = true)
            (nodes0, edges0, () => {
              org.apache.spark.sql.graftbridge.Bridge.releaseLocalCheckpoint(surfaceIri)
              ()
            })
          }
        try {
          batch.sparkSession.conf
            .set("spark.sql.sources.partitionOverwriteMode", "dynamic")
          // repartition by the partition column before the write: the
          // edge plan ends with ~32 narrow tasks that would each open a
          // file in every pk directory (~32×nBuckets tiny files per
          // batch, and the dynamic-overwrite commit walks them all) —
          // one pk-keyed shuffle of the batch-sized edges yields one
          // file per pk (guide §6 small-files; identical rows)
          edges.withColumn("batch", lit(batchId))
            .withColumn("pk", Checkpointed.bucketOf(col("url"), nBuckets))
            .repartition(col("pk"))
            .write.mode("overwrite").partitionBy("batch", "pk")
            .parquet(s"$outDir/edges")
          // node delta: this batch's vocabulary-sized node rows (both
          // writes reuse the build's forced surfaceIri cache). A crash
          // between the two writes replays the whole batch — both sinks
          // are partition-idempotent, so the rewrite is byte-identical.
          nodes.withColumn("batch", lit(batchId))
            .repartition(1)
            .write.mode("overwrite").partitionBy("batch")
            .parquet(s"$outDir/nodes")
        } finally {
          release()
          org.apache.spark.sql.graftbridge.Bridge.releaseLocalCheckpoint(trip)
          ()
        }
      }
      .start()
  }

  /** The streamed NODE table: every micro-batch delta folded by the
    * associative `Pipeline.reduceNodes` merge. Equal to the all-at-once
    * batch node table over the same pages (kg_stream_parity_nodes pins
    * this under the driver's DuckDB oracle) because a surface's node
    * row is a pure function of (surface, KB) and the reduce is
    * associative over any batching of the surface set. */
  def streamedNodes(spark: SparkSession, outDir: String): DataFrame =
    graft.pipeline.Pipeline.reduceNodes(
      spark.read.parquet(s"$outDir/nodes").drop("batch"))

  /** Bound the node-delta count for a long-lived stream: replace all
    * deltas with ONE compacted delta under batch=-1 (streaming batchIds
    * are non-negative, so it can never collide with a live batch).
    * Run between AvailableNow catch-up runs, never concurrently with
    * an active stream. Same staging-swap crash contract as
    * Checkpointed.runAll's node rewrite: the compacted table is fully
    * materialized to `_nodes_next` BEFORE the directory it was read
    * from is overwritten. */
  def compactNodes(spark: SparkSession, outDir: String): Unit = {
    val tmp = s"$outDir/_nodes_next"
    streamedNodes(spark, outDir).withColumn("batch", lit(-1L))
      .write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "static") // replace ALL deltas
      .partitionBy("batch").parquet(s"$outDir/nodes")
    val p = java.nio.file.Paths.get(tmp)
    if (java.nio.file.Files.exists(p)) {
      val s0 = java.nio.file.Files.list(p)
      try {
        import scala.jdk.CollectionConverters._
        s0.iterator().asScala.toList.foreach(java.nio.file.Files.delete)
      } finally s0.close()
      java.nio.file.Files.delete(p)
    }
  }

  /** Streaming CONTENT dedup: pages deduplicated across micro-batches
    * by the md5 fingerprint of their normalized text, NOT the url — a
    * recrawl republished under a DIFFERENT url is still dropped (the
    * url-keyed dedup above cannot catch that). First-arriving batch
    * wins; keyed state is bounded by the watermark. Returns
    * (url, warc_ts, fp) of the surviving pages. */
  def dedupedPagesByContent(pagesStream: Dataset[Page], delay: String): DataFrame =
    pagesStream.toDF
      .select(col("url"), col("warc_ts"),
        graft.ops.TextAnalysis.fingerprint(col("text")).as("fp"))
      .withWatermark("warc_ts", delay)
      .dropDuplicatesWithinWatermark("fp")

  final case class DomainStats(domain: String, n_triples: Long, n_batches: Long)

  /** Custom keyed streaming state (flatMapGroupsWithState): cumulative
    * per-url-domain triple counts, one updated row emitted per domain
    * per micro-batch — the monitoring analogue of the reference's
    * per-run metrics, maintained incrementally instead of recomputed. */
  def domainStats(triples: Dataset[TripleRow]): Dataset[DomainStats] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = triples.sparkSession
    import spark.implicits._
    def domainOf(url: String): String = {
      val m = "^https?://([^/]+)".r.findFirstMatchIn(url)
      m.map(_.group(1)).getOrElse("")
    }
    triples.groupByKey(t => domainOf(t.url))
      .flatMapGroupsWithState[(Long, Long), DomainStats](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (domain, it, state: GroupState[(Long, Long)]) =>
          val (nt, nb) = state.getOption.getOrElse((0L, 0L))
          val updated = (nt + it.size, nb + 1)
          state.update(updated)
          Iterator.single(DomainStats(domain, updated._1, updated._2))
      }
  }
}

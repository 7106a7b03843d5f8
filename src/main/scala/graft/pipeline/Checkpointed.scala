package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Resumable, checkpointed batch execution (SURVEY.md §2.9, §7.1 M7;
  * north rule: "per-partition checkpointed lineage + metrics enabling
  * resume at 10^12-document scale").
  *
  * Layout under `baseDir`:
  *   triples/pk=[k]/part-....parquet  hash-partitioned by url-domain bucket
  *   nodes/, edges/                   parquet graph tables
  *   _done/pk=[k].json                per-partition completion manifest +
  *                                    lineage (pages, triples, run id)
  *   _metrics/run=[r].json            per-run rollup
  *
  * Protocol: a run processes only buckets without a manifest, writes
  * their triples with dynamic partition-overwrite (idempotent — a
  * half-written bucket from a killed run is fully replaced on retry,
  * never appended), then commits one manifest per bucket. Manifests are
  * written AFTER the data, so a crash between data and manifest merely
  * re-does that bucket; the deterministic kernel makes the rewrite
  * byte-identical. This is the Iceberg-commit pattern expressed on plain
  * partitioned parquet (no Iceberg jars in this sandbox —
  * `format("iceberg")` + REPLACE PARTITIONS is the one-line swap,
  * SURVEY.md §7.0).
  */
object Checkpointed {

  /** url-domain of a url column (north rule: partition by url-domain). */
  def domainOf(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_extract(url, "^https?://([^/]+)", 1)

  /** Stable bucket 0..nBuckets-1 from the domain (not Spark's `hash`,
    * whose seed is engine-private: crc32 is portable and stable). */
  def bucketOf(url: org.apache.spark.sql.Column, nBuckets: Int): org.apache.spark.sql.Column =
    pmod(crc32(domainOf(url)), lit(nBuckets.toLong)).cast("int")

  final case class BucketManifest(pk: Int, nPages: Long, nTriples: Long, runId: Long)

  private def markerBuckets(baseDir: String, sub: String): Set[Int] = {
    val dir = Paths.get(baseDir, sub)
    if (!Files.exists(dir)) Set.empty
    else {
      val s = Files.list(dir)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case n if n.startsWith("pk=") && n.endsWith(".json") =>
          n.stripPrefix("pk=").stripSuffix(".json").toInt
        }.toSet
      finally s.close()
    }
  }

  def doneBuckets(baseDir: String): Set[Int] = markerBuckets(baseDir, "_done")

  /** Buckets whose GRAPH stage (nodes merge + edges partition) has
    * committed — markers written only after the edges write, so a crash
    * between the triple manifest and the graph writes leaves the bucket
    * visibly pending and the next run rebuilds it (the incremental
    * analogue of the old full-rebuild self-heal). */
  def graphDoneBuckets(baseDir: String): Set[Int] = markerBuckets(baseDir, "_done_graph")

  private val runIdRe = """"run_id"\s*:\s*(-?\d+)""".r

  /** pk → run_id parsed from the pk=N.json markers of `sub`. */
  private def markerRunIds(baseDir: String, sub: String): Map[Int, Long] =
    markerBuckets(baseDir, sub).flatMap { pk =>
      val f = Paths.get(baseDir, sub, s"pk=$pk.json")
      val txt = new String(Files.readAllBytes(f), "UTF-8")
      runIdRe.findFirstMatchIn(txt).map(m => pk -> m.group(1).toLong)
    }.toMap

  /** The graph marker records the run_id of the bucket's TRIPLE manifest
    * it was built from — a graph commit is valid only while those two
    * ids match, so a bucket whose triples were re-extracted (new _done
    * run_id) is pending again even though an old graph marker exists. */
  private def commitGraphMarker(baseDir: String, pk: Int, tripleRunId: Long): Unit = {
    val dir = Paths.get(baseDir, "_done_graph")
    Files.createDirectories(dir)
    Files.write(dir.resolve(s"pk=$pk.json"),
      s"""{"pk":$pk,"run_id":$tripleRunId}""".getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  private def commitManifest(baseDir: String, m: BucketManifest): Unit = {
    val dir = Paths.get(baseDir, "_done")
    Files.createDirectories(dir)
    val json =
      s"""{"pk":${m.pk},"n_pages":${m.nPages},"n_triples":${m.nTriples},"run_id":${m.runId}}"""
    Files.write(dir.resolve(s"pk=${m.pk}.json"), json.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  /** Run (or resume) the triple-extraction stage over `pages` into
    * `baseDir/triples`, bucketed by url-domain. Returns the manifests
    * committed by THIS run (empty when everything was already done). */
  def runTriples(pages: Dataset[Page], baseDir: String, nBuckets: Int = 64,
      runId: Long = 0L): Seq[BucketManifest] = {
    val spark = pages.sparkSession
    val done = doneBuckets(baseDir)
    val withPk = pages.withColumn("pk", bucketOf(col("url"), nBuckets))
    val todo = withPk.filter(!col("pk").isin(done.toSeq: _*))

    // lineage inputs: pages per remaining bucket (one cheap agg)
    val pageCounts = todo.groupBy(col("pk")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    if (pageCounts.isEmpty) return Seq.empty

    val trip = Kg.pagesToTriples(todo.drop("pk").as[Page](pages.encoder))
      .withColumn("pk", bucketOf(col("url"), nBuckets))

    // idempotent per-partition overwrite: a killed run's partial bucket
    // directories are replaced wholesale on retry
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    trip.write.mode("overwrite").partitionBy("pk").parquet(s"$baseDir/triples")

    // per-bucket lineage from the written files (ground truth, not the
    // plan) — restricted to THIS run's fresh buckets: the pk filter is
    // partition-pruned, so an incremental run with one fresh bucket
    // reads one bucket directory, never the whole table (at 10^12 docs
    // a full-table rescan per incremental run would dwarf the run).
    val freshKeys = pageCounts.keys.toSeq
    val written = spark.read.parquet(s"$baseDir/triples")
      .filter(col("pk").isin(freshKeys: _*))
      .groupBy(col("pk")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap

    val manifests = pageCounts.keys.toSeq.sorted.map { pk =>
      BucketManifest(pk, pageCounts(pk), written.getOrElse(pk, 0L), runId)
    }
    manifests.foreach(m => commitManifest(baseDir, m))
    writeRunMetrics(baseDir, runId, manifests)
    manifests
  }

  private def writeRunMetrics(baseDir: String, runId: Long, ms: Seq[BucketManifest]): Unit = {
    val dir = Paths.get(baseDir, "_metrics")
    Files.createDirectories(dir)
    val json = ms.map(m =>
      s"""{"pk":${m.pk},"n_pages":${m.nPages},"n_triples":${m.nTriples}}""")
      .mkString("[", ",", "]")
    Files.write(dir.resolve(s"run=$runId.json"),
      s"""{"run_id":$runId,"buckets":${ms.length},"detail":$json}""".getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  /** Full resumable pipeline: triples (resumable by bucket) → graph
    * tables — INCREMENTALLY. An incremental run touches only the fresh
    * buckets plus vocabulary-sized tables:
    *
    *  - a surface's IRI is a PURE function of (surface, KB) — exact/
    *    fuzzy linking and the md5 mint have no corpus-wide inputs — so
    *    edges for fresh buckets can be built from the fresh triples
    *    alone and written with dynamic partition overwrite (old-bucket
    *    edge files are never rewritten, asserted by CheckpointedSpec);
    *  - APPEND-ONLY ingest (never-before-seen buckets): the node table
    *    merges the previous nodes with the fresh buckets' nodes and
    *    re-reduces by IRI — min_by is associative, so for row ADDITION
    *    the merge equals a full rebuild (result-identity tested);
    *  - RE-EXTRACTION (a bucket whose triples were invalidated and
    *    redone, detected as a pending bucket that already carries a
    *    graph marker): the union-merge can only ever ADD node rows, so
    *    entities that existed solely in the bucket's previous
    *    extraction would persist forever (ADVICE r03). These runs
    *    rebuild the node table from ALL triples instead — an O(corpus)
    *    scan, paid only on the rare invalidation path, never by
    *    append-only ingest.
    *
    * At 10^12 documents this is the difference between an incremental
    * run costing O(fresh) and one costing O(corpus). */
  def runAll(pages: Dataset[Page], kb: Dataset[KbEntry], baseDir: String,
      nBuckets: Int = 64, runId: Long = 0L): Unit = {
    val spark = pages.sparkSession
    import spark.implicits._
    val fresh = runTriples(pages, baseDir, nBuckets, runId)
    val nodesPath = Paths.get(baseDir, "nodes")
    val hadGraph = Files.exists(nodesPath)
    // graph work set: every triple-committed bucket whose graph marker
    // is missing OR carries a different run_id than its triple manifest
    // — covers this run's fresh buckets, crash windows between the
    // triple commit and the graph writes (ADVICE r02), AND buckets an
    // operator invalidated and re-extracted in an earlier run that then
    // crashed before the graph commit (a bare marker-presence check
    // would trust the stale marker forever — review finding r03)
    val tripleRuns = markerRunIds(baseDir, "_done")
    val graphRuns = markerRunIds(baseDir, "_done_graph")
    val pending = (fresh.map(_.pk).toSet ++
      tripleRuns.collect { case (pk, r) if !graphRuns.get(pk).contains(r) => pk })
      .toSeq.sorted
    if (pending.isEmpty && hadGraph) return
    // a pending bucket with ANY previous graph marker was re-extracted
    // (its old rows are already inside nodes/) — append-only merge is
    // unsound for it, so the node table must be rebuilt from all triples
    val reextracted = hadGraph && pending.exists(pk => graphRuns.contains(pk))
    // partition-pruned read: only pending buckets (everything, when the
    // graph tables don't exist yet or a re-extraction forces a rebuild)
    val tripAll = spark.read.parquet(s"$baseDir/triples")
    val tripIn =
      if (hadGraph && !reextracted) tripAll.filter(col("pk").isin(pending: _*))
      else tripAll
    val (nodesFresh, edgesAll) =
      Pipeline.graphFromTriples(tripIn.drop("pk").as[TripleRow], kb)
    // on the rebuild path only the pending buckets' edge partitions are
    // (re)written — old-bucket edge files stay untouched either way
    val edgesFresh =
      if (hadGraph && reextracted)
        edgesAll.withColumn("__pk", bucketOf(col("url"), nBuckets))
          .filter(col("__pk").isin(pending: _*)).drop("__pk")
      else edgesAll

    // nodes: vocabulary-sized associative merge on the append-only path;
    // full rebuild (nodesFresh already spans ALL triples) on re-extraction
    val nodesMerged =
      if (!hadGraph || reextracted) nodesFresh
      else Pipeline.reduceNodes(
        spark.read.parquet(s"$baseDir/nodes").unionByName(nodesFresh))
    // materialize BEFORE overwriting the directory being read
    val tmpNodes = s"$baseDir/_nodes_next"
    nodesMerged.write.mode("overwrite").parquet(tmpNodes)
    spark.read.parquet(tmpNodes).write.mode("overwrite").parquet(s"$baseDir/nodes")
    // drop the staging dir (left in place it triggers spurious
    // "All paths were ignored" warnings on later reads of baseDir)
    val tmpPath = Paths.get(tmpNodes)
    if (Files.exists(tmpPath)) {
      val s0 = Files.list(tmpPath)
      try s0.iterator().asScala.toList.foreach(Files.delete) finally s0.close()
      Files.delete(tmpPath)
    }

    // edges: dynamic overwrite replaces ONLY the fresh pk partitions.
    // Pre-delete the pending buckets' partitions first: dynamic
    // overwrite cannot clear a rebuilt bucket that now yields ZERO edge
    // rows, which would otherwise freeze stale edges in place behind a
    // fresh graph marker (review finding r03).
    if (hadGraph) pending.foreach { pk =>
      val d = Paths.get(baseDir, "edges", s"pk=$pk")
      if (Files.exists(d)) {
        val s = Files.list(d)
        try s.iterator().asScala.toList.foreach(Files.delete) finally s.close()
        Files.delete(d)
      }
    }
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    edgesFresh.withColumn("pk", bucketOf(col("url"), nBuckets))
      .write.mode("overwrite").partitionBy("pk").parquet(s"$baseDir/edges")

    // graph markers LAST, each stamped with its bucket's TRIPLE-manifest
    // run_id: a crash anywhere above leaves the bucket pending and the
    // next run redoes it (nodes re-merge is idempotent — min_by
    // re-reduction of duplicate rows — and the edges rebuild is
    // per-partition wholesale)
    val committed = if (hadGraph) pending else tripleRuns.keys.toSeq.sorted
    committed.foreach(pk =>
      commitGraphMarker(baseDir, pk, tripleRuns.getOrElse(pk, runId)))
  }
}

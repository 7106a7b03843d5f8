package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class CheckpointedSpec extends SparkTestBase {

  private def freshDir(): String = {
    val d = Files.createTempDirectory("graft_ckpt").toString
    d
  }

  test("first run processes all buckets and commits manifests") {
    val dir = freshDir()
    val pages = Corpus.pages(spark, 200, 4)
    val ms = Checkpointed.runTriples(pages, dir, nBuckets = 8, runId = 1)
    assert(ms.nonEmpty)
    assert(Checkpointed.doneBuckets(dir) == ms.map(_.pk).toSet)
    val total = spark.read.parquet(s"$dir/triples").count()
    assert(total == ms.map(_.nTriples).sum)
    assert(total == Kg.pagesToTriples(pages).count())
  }

  test("resume skips completed buckets (their files are NOT rewritten)") {
    import scala.jdk.CollectionConverters._
    val dir = freshDir()
    val pages = Corpus.pages(spark, 200, 4)
    val ms = Checkpointed.runTriples(pages, dir, nBuckets = 8, runId = 1)
    val donePk = ms.head.pk
    // drop manifests for every bucket except one
    val doneDir = Paths.get(dir, "_done")
    Files.list(doneDir).iterator().asScala.toList.foreach { p =>
      if (p.getFileName.toString != s"pk=$donePk.json") Files.delete(p)
    }
    val bucketDir = Paths.get(dir, "triples", s"pk=$donePk")
    def mtimes() = Files.list(bucketDir).iterator().asScala.toList
      .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis).toMap
    val before = mtimes()
    Thread.sleep(1100)
    val redone = Checkpointed.runTriples(pages, dir, nBuckets = 8, runId = 2)
    assert(!redone.map(_.pk).contains(donePk)) // skipped
    assert(mtimes() == before, "completed bucket files were touched")
  }

  test("resume run recomputes only missing buckets; final table complete and duplicate-free") {
    val dir = freshDir()
    val pages = Corpus.pages(spark, 300, 4)
    val all = Checkpointed.runTriples(pages, dir, nBuckets = 8, runId = 1)
    val expected = spark.read.parquet(s"$dir/triples").drop("pk")
      .orderBy("url", "subj", "pred", "obj").collect().toSeq
    // wipe manifests for half the buckets + delete their data (simulated
    // crash before commit)
    val doneDir = Paths.get(dir, "_done")
    val toRedo = all.map(_.pk).filter(_ % 2 == 1)
    toRedo.foreach { pk =>
      Files.deleteIfExists(doneDir.resolve(s"pk=$pk.json"))
    }
    val redone = Checkpointed.runTriples(pages, dir, nBuckets = 8, runId = 2)
    assert(redone.map(_.pk).toSet == toRedo.toSet)
    val after = spark.read.parquet(s"$dir/triples").drop("pk")
      .orderBy("url", "subj", "pred", "obj").collect().toSeq
    assert(after == expected) // deterministic rewrite, no dupes, complete
    // fully-done rerun is a no-op
    assert(Checkpointed.runTriples(pages, dir, nBuckets = 8, runId = 3).isEmpty)
  }

  test("incremental lineage count reads ONLY fresh bucket files (partition-pruned)") {
    import scala.jdk.CollectionConverters._
    val dir = freshDir()
    val pages = Corpus.pages(spark, 200, 4)
    val ms = Checkpointed.runTriples(pages, dir, nBuckets = 8, runId = 1)
    // the lineage read runTriples issues for a run that refreshed only
    // bucket `fresh`: the pk filter must prune every other directory.
    // Execution-truth check: plan the pruned read, then DELETE every
    // other bucket's data files — a scan that touched them would throw
    // FileNotFoundException; a pruned scan never opens them.
    val fresh = ms.head.pk
    val pruned = spark.read.parquet(s"$dir/triples")
      .filter(col("pk").isin(Seq(fresh): _*))
    val tripDir = Paths.get(dir, "triples")
    Files.list(tripDir).iterator().asScala.toList
      .filter(p => p.getFileName.toString.startsWith("pk=") &&
        p.getFileName.toString != s"pk=$fresh")
      .foreach { bucket =>
        Files.list(bucket).iterator().asScala.toList.foreach(Files.delete)
        Files.delete(bucket)
      }
    val n = pruned.groupBy(col("pk")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(n == Map(fresh -> ms.head.nTriples))
  }

  test("incremental runAll: kept edge partitions untouched; result == full rebuild") {
    import scala.jdk.CollectionConverters._
    val dirA = freshDir()
    val dirB = freshDir()
    val pages = Corpus.pages(spark, 250, 4)
    val kb = Corpus.kb(spark, 300)
    Checkpointed.runAll(pages, kb, dirA, nBuckets = 8, runId = 1) // reference: one shot
    Checkpointed.runAll(pages, kb, dirB, nBuckets = 8, runId = 1)
    // simulate a partial crash: odd buckets lose their manifests
    val doneDir = Paths.get(dirB, "_done")
    val redo = Checkpointed.doneBuckets(dirB).filter(_ % 2 == 1)
    assert(redo.nonEmpty)
    redo.foreach(pk => Files.delete(doneDir.resolve(s"pk=$pk.json")))
    val kept = Checkpointed.doneBuckets(dirB)
    assert(kept.nonEmpty)
    def edgeMtimes(pk: Int): Map[String, Long] = {
      val d = Paths.get(dirB, "edges", s"pk=$pk")
      val s = Files.list(d)
      try s.iterator().asScala.toList
        .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis).toMap
      finally s.close()
    }
    val before = kept.map(pk => pk -> edgeMtimes(pk)).toMap
    Thread.sleep(1100)
    Checkpointed.runAll(pages, kb, dirB, nBuckets = 8, runId = 2) // incremental
    // O(fresh): the kept buckets' edge files were NOT rewritten
    kept.foreach(pk => assert(edgeMtimes(pk) == before(pk), s"bucket $pk rewritten"))
    // result identity with the one-shot rebuild
    def table(dir: String, name: String) =
      spark.read.parquet(s"$dir/$name").drop("pk")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(table(dirB, "nodes") == table(dirA, "nodes"))
    assert(table(dirB, "edges") == table(dirA, "edges"))
  }

  test("graph done marker: crash between triple commit and graph writes self-heals") {
    val dirA = freshDir()
    val dirB = freshDir()
    val pages = Corpus.pages(spark, 250, 4)
    val kb = Corpus.kb(spark, 300)
    Checkpointed.runAll(pages, kb, dirA, nBuckets = 8, runId = 1) // reference
    Checkpointed.runAll(pages, kb, dirB, nBuckets = 8, runId = 1)
    assert(Checkpointed.graphDoneBuckets(dirB) == Checkpointed.doneBuckets(dirB))
    // simulate the ADVICE crash: a bucket's triple manifest committed
    // but its graph writes lost — delete the graph marker AND the edge
    // partition of one bucket (triple manifest intact)
    val victim = Checkpointed.graphDoneBuckets(dirB).head
    Files.delete(Paths.get(dirB, "_done_graph", s"pk=$victim.json"))
    import scala.jdk.CollectionConverters._
    val edgeDir = Paths.get(dirB, "edges", s"pk=$victim")
    Files.list(edgeDir).iterator().asScala.toList.foreach(Files.delete)
    Files.delete(edgeDir)
    // no new pages: the old code saw fresh.isEmpty && nodes-exists and
    // returned, leaving the bucket's edges missing forever
    Checkpointed.runAll(pages, kb, dirB, nBuckets = 8, runId = 2)
    assert(Checkpointed.graphDoneBuckets(dirB).contains(victim))
    def table(dir: String, name: String) =
      spark.read.parquet(s"$dir/$name").drop("pk")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(table(dirB, "edges") == table(dirA, "edges"))
    assert(table(dirB, "nodes") == table(dirA, "nodes"))
  }

  test("stale graph marker (run_id mismatch) is detected and the bucket rebuilt") {
    import scala.jdk.CollectionConverters._
    val dirA = freshDir()
    val dirB = freshDir()
    val pages = Corpus.pages(spark, 200, 4)
    val kb = Corpus.kb(spark, 300)
    Checkpointed.runAll(pages, kb, dirA, nBuckets = 8, runId = 1)
    Checkpointed.runAll(pages, kb, dirB, nBuckets = 8, runId = 1)
    val victim = Checkpointed.graphDoneBuckets(dirB).head
    // simulate: the bucket's triples were re-extracted by run 2 (its
    // _done manifest now carries run_id 2) but the process crashed
    // before the graph commit — the old run-1 graph marker survives
    val mf = Paths.get(dirB, "_done", s"pk=$victim.json")
    val txt = new String(Files.readAllBytes(mf), "UTF-8")
      .replace("\"run_id\":1", "\"run_id\":2")
    Files.write(mf, txt.getBytes("UTF-8"))
    val edgeDir = Paths.get(dirB, "edges", s"pk=$victim")
    Files.list(edgeDir).iterator().asScala.toList.foreach(Files.delete)
    Files.delete(edgeDir)
    // marker-presence alone would skip the bucket forever; the run_id
    // comparison must flag it pending
    Checkpointed.runAll(pages, kb, dirB, nBuckets = 8, runId = 3)
    assert(Files.exists(edgeDir), "stale bucket was not rebuilt")
    val gm = new String(Files.readAllBytes(
      Paths.get(dirB, "_done_graph", s"pk=$victim.json")), "UTF-8")
    assert(gm.contains("\"run_id\":2"), s"marker should record the manifest run_id: $gm")
    def table(dir: String, name: String) =
      spark.read.parquet(s"$dir/$name").drop("pk")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(table(dirB, "edges") == table(dirA, "edges"))
    assert(table(dirB, "nodes") == table(dirA, "nodes"))
  }

  test("re-extracted bucket with SHRUNK content: stale nodes are dropped (full-rebuild identity)") {
    import scala.jdk.CollectionConverters._
    val dir = freshDir()
    val kb = Corpus.kb(spark, 300)
    val pagesA = Corpus.pages(spark, 250, 4)
    Checkpointed.runAll(pagesA, kb, dir, nBuckets = 8, runId = 1)
    // invalidate one bucket and re-extract it from a SMALLER corpus:
    // entities its old extraction contributed must disappear from nodes
    // (the union-merge could only ever ADD rows — ADVICE r03)
    val victim = Checkpointed.graphDoneBuckets(dir).head
    Files.delete(Paths.get(dir, "_done", s"pk=$victim.json"))
    val pagesB = Corpus.pages(spark, 120, 4)
    Checkpointed.runAll(pagesB, kb, dir, nBuckets = 8, runId = 2)
    // invariant: the node table equals a full rebuild from the CURRENT
    // triples — no stale rows from the victim's previous extraction
    import spark.implicits._
    val trip = spark.read.parquet(s"$dir/triples").drop("pk").as[TripleRow]
    val (expectNodes, expectEdges) = Pipeline.graphFromTriples(trip, kb)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(canon(spark.read.parquet(s"$dir/nodes")) == canon(expectNodes))
    // edges stay per-bucket consistent too
    assert(canon(spark.read.parquet(s"$dir/edges").drop("pk")) == canon(expectEdges))
    // and the rebuild actually removed something (the scenario is real):
    // bucket[victim] of pagesA had triples that pagesB lacks
    val aCount = Kg.pagesToTriples(pagesA)
      .withColumn("pk", Checkpointed.bucketOf(col("url"), 8))
      .filter(col("pk") === victim).count()
    val bCount = trip.toDF.withColumn("pk", Checkpointed.bucketOf(col("url"), 8))
      .filter(col("pk") === victim).count()
    assert(bCount < aCount, s"victim bucket did not shrink ($aCount -> $bCount)")
  }

  test("runAll produces graph tables partitioned by domain bucket") {
    val dir = freshDir()
    val pages = Corpus.pages(spark, 200, 4)
    Checkpointed.runAll(pages, Corpus.kb(spark, 500), dir, nBuckets = 8, runId = 1)
    assert(Files.exists(Paths.get(dir, "nodes")))
    val edges = spark.read.parquet(s"$dir/edges")
    assert(edges.count() > 0)
    assert(edges.columns.contains("pk"))
    // partition pruning works on the bucket column
    val pruned = edges.filter(col("pk") === 0)
    assert(pruned.count() >= 0)
  }
}

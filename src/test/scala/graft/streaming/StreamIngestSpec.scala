package graft.streaming

import graft.SparkTestBase
import graft.pipeline.{Corpus, Kg}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StreamIngestSpec extends SparkTestBase {

  test("streaming ingestion produces the same triples as the batch path") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft_stream").toString
    val pages = Corpus.pages(spark, 150, 4)
    // stage pages as two file drops (two micro-batches under AvailableNow)
    pages.filter(col("url").isNotNull).limit(75)
      .write.mode("overwrite").parquet(s"$work/pages")
    val q = StreamIngest.run(spark, s"$work/pages", s"$work/out", s"$work/ckpt")
    q.awaitTermination()
    // second drop: append more page files, run catch-up again
    pages.write.mode("append").parquet(s"$work/pages")
    val q2 = StreamIngest.run(spark, s"$work/pages", s"$work/out", s"$work/ckpt")
    q2.awaitTermination()

    val streamed = spark.read.parquet(s"$work/out/triples")
      .select("url", "subj", "pred", "obj").distinct()
    val batch = Kg.pagesToTriples(pages).toDF.select("url", "subj", "pred", "obj")
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
    assert(batch.count() > 0)
  }

  test("replayed foreachBatch batch is idempotent (at-least-once sink)") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft_replay").toString
    val pages = Corpus.pages(spark, 60, 2)
    val batch = Kg.pagesToTriples(pages)
    StreamIngest.writeBatch(batch, 7L, s"$work/out", nBuckets = 4)
    val once = spark.read.parquet(s"$work/out/triples").count()
    // simulate the at-least-once replay: same batchId written again
    StreamIngest.writeBatch(batch, 7L, s"$work/out", nBuckets = 4)
    val twice = spark.read.parquet(s"$work/out/triples").count()
    assert(once == twice && once > 0)
  }

  test("windowed counts group triples into hourly warc_ts windows") {
    import spark.implicits._
    val df = Seq(
      (java.sql.Timestamp.valueOf("2025-01-01 10:05:00"), "worksfor"),
      (java.sql.Timestamp.valueOf("2025-01-01 10:55:00"), "worksfor"),
      (java.sql.Timestamp.valueOf("2025-01-01 11:05:00"), "worksfor"))
      .toDF("warc_ts", "pred")
    val r = StreamIngest.windowedCounts(df)
      .select(col("window.start").cast("string"), col("n_triples"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("2025-01-01 10:00:00") == 2L)
    assert(r("2025-01-01 11:00:00") == 1L)
  }
}

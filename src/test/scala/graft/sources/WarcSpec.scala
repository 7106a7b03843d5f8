package graft.sources

import graft.SparkTestBase
import graft.pipeline.{Corpus, Kg}
import org.apache.spark.sql.functions._

/** Common-Crawl-style WARC round-trip: pages → per-partition .warc.gz
  * shards → binaryFile read + Content-Length parse → byte-identical
  * html and identical downstream triples. */
class WarcSpec extends SparkTestBase {

  test("record grammar: version line, headers, Content-Length body, CRLF framing") {
    val body = "<html>abc\r\n\r\nWARC/1.0 fake boundary inside body</html>"
      .getBytes("UTF-8")
    val ts = java.sql.Timestamp.valueOf("2024-03-01 12:00:00")
    val rec = Warc.record("https://x.test/a", ts, body)
    val parsed = Warc.parseRecords(rec).toList
    assert(parsed.size == 1)
    val (url, date, got) = parsed.head
    assert(url == "https://x.test/a")
    assert(date.endsWith("Z"))
    // body with record-boundary-looking bytes survives verbatim:
    // parsing is Content-Length-driven, never a delimiter scan
    assert(got.sameElements(body))
  }

  test("warc.gz round-trip: html byte-identical, triples identical") {
    import spark.implicits._
    val pages = Corpus.pages(spark, 150, 4)
    val dir = java.nio.file.Files.createTempDirectory("graft_warc").toString + "/w"
    Warc.writeWarcGz(pages, dir)
    // one shard per input partition
    val shards = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".warc.gz"))
    assert(shards.length == 4, shards.mkString(","))
    val back = Warc.readPages(spark, dir)
    val orig = pages.toDF.select(col("url"), col("warc_ts"), col("html"))
    // byte-identity per url (md5 of html bytes) + timestamp round-trip
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("url"), col("warc_ts").cast("string"), md5(col("html")))
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(canon(back) == canon(orig))
    // downstream equality: triples from the warc-ingested pages match
    val langByUrl = pages.map(p => (p.url, p.lang)).toDF("url", "lang")
    val restored = back.join(langByUrl, "url")
      .as[(String, java.sql.Timestamp, Array[Byte], String)]
      .map { case (url, ts, html, lang) =>
        graft.pipeline.Page(url, ts, html, graft.kernel.HtmlText.extract(html), lang)
      }
    val a = Kg.pagesToTriples(restored).collect().map(_.toString).sorted.toSeq
    val b = Kg.pagesToTriples(pages).collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }
}

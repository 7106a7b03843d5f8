package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Page

/** Common-Crawl-style WARC ingest — the north rule's actual input
  * format ("Iceberg table of Common-Crawl-style web pages"): pages
  * serialized as WARC/1.0 response records in per-partition `.warc.gz`
  * files (one gzip stream per file, as crawl archives ship), read back
  * with Spark's `binaryFile` source and parsed executor-side into the
  * engine's Page table.
  *
  * The record grammar is the real one (ISO 28500): a version line,
  * `Name: value` headers, an empty line, then EXACTLY `Content-Length`
  * body bytes followed by two CRLFs. Parsing is Content-Length-driven
  * (never a delimiter scan over the body, which may contain anything).
  * gzip comes from `java.util.zip` — like the image/audio codecs, the
  * JDK carries the real thing.
  *
  * Scale shape: one file per input partition; a crawl's thousands of
  * `.warc.gz` shards parallelize per file (binaryFile gives one row
  * per shard, the flatMap parses records within it) — the standard
  * CC-read topology. Files are the unit of parallelism, so shard
  * count ≈ desired partition count.
  */
object Warc {

  private val CRLF = "\r\n"
  private val utc = java.time.ZoneOffset.UTC

  private def warcDate(ts: java.sql.Timestamp): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'")
      .format(ts.toInstant.atZone(utc))

  /** One WARC/1.0 response record (headers ASCII, body verbatim). The
    * record id is minted deterministically from the url (md5-uuid) so
    * the writer is reproducible byte-for-byte. */
  def record(url: String, ts: java.sql.Timestamp, body: Array[Byte]): Array[Byte] = {
    val id = java.util.UUID.nameUUIDFromBytes(url.getBytes("UTF-8"))
    val header =
      s"WARC/1.0$CRLF" +
        s"WARC-Type: response$CRLF" +
        s"WARC-Record-ID: <urn:uuid:$id>$CRLF" +
        s"WARC-Date: ${warcDate(ts)}$CRLF" +
        s"WARC-Target-URI: $url$CRLF" +
        s"Content-Type: text/html$CRLF" +
        s"Content-Length: ${body.length}$CRLF" +
        CRLF
    header.getBytes("UTF-8") ++ body ++ s"$CRLF$CRLF".getBytes("UTF-8")
  }

  /** Write pages as per-partition `.warc.gz` shards under `dir`. Shard
    * names are partition-indexed (deterministic layout). */
  def writeWarcGz(pages: Dataset[Page], dir: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    pages.foreachPartition { (it: Iterator[Page]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val path = java.nio.file.Paths.get(dir, f"part-$pid%05d.warc.gz")
      val out = new java.util.zip.GZIPOutputStream(
        java.nio.file.Files.newOutputStream(path))
      try it.foreach(p => out.write(record(p.url, p.warc_ts, p.html)))
      finally out.close()
    }
  }

  /** Parse one gunzipped WARC stream into (url, warc_date, html)
    * records — Content-Length-driven, tolerating any body bytes. */
  def parseRecords(bytes: Array[Byte]): Iterator[(String, String, Array[Byte])] =
    new Iterator[(String, String, Array[Byte])] {
      private var pos = 0
      private def readLine(): String = {
        val start = pos
        while (pos < bytes.length &&
          !(bytes(pos) == '\r' && pos + 1 < bytes.length && bytes(pos + 1) == '\n'))
          pos += 1
        val s = new String(bytes, start, pos - start, "UTF-8")
        pos = math.min(pos + 2, bytes.length)
        s
      }
      private def skipBlank(): Unit =
        while (pos + 1 < bytes.length && bytes(pos) == '\r' && bytes(pos + 1) == '\n')
          pos += 2
      def hasNext: Boolean = { skipBlank(); pos < bytes.length }
      def next(): (String, String, Array[Byte]) = {
        skipBlank()
        val version = readLine()
        require(version.startsWith("WARC/"), s"bad WARC version line: $version")
        var url = ""
        var date = ""
        var len = -1
        var line = readLine()
        while (line.nonEmpty) {
          val i = line.indexOf(':')
          val (k, v) = (line.substring(0, i), line.substring(i + 1).trim)
          k match {
            case "WARC-Target-URI" => url = v
            case "WARC-Date" => date = v
            case "Content-Length" => len = v.toInt
            case _ => ()
          }
          line = readLine()
        }
        require(len >= 0, "missing Content-Length")
        // fail loud on truncation — copyOfRange would silently
        // zero-pad a body that runs past the record (ADVICE r04)
        require(pos + len <= bytes.length,
          s"truncated WARC record: body wants ${len}B at $pos of ${bytes.length}")
        val body = java.util.Arrays.copyOfRange(bytes, pos, pos + len)
        pos += len
        (url, date, body)
      }
    }

  private def gunzip(gz: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(gz))
    try in.readAllBytes() finally in.close()
  }

  /** Read `.warc.gz` shards back into (url, warc_ts, html) — the input
    * table's first three columns, parsed executor-side, one task per
    * shard. Shard paths are resolved explicitly before the read: a raw
    * glob makes Spark's FileStreamSink probe stat the literal starred
    * path and log a FileNotFoundException stack at WARN on every read
    * (the WebNlg lesson, VERDICT r02). */
  def readPages(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val shards = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      try {
        import scala.jdk.CollectionConverters._
        val r = s.iterator().asScala.map(_.toString)
          .filter(_.endsWith(".warc.gz")).toVector.sorted
        require(r.nonEmpty, s"no .warc.gz shards under $dir")
        r
      } finally s.close()
    }
    spark.read.format("binaryFile").load(shards: _*)
      .select(col("content"))
      .as[Array[Byte]]
      .mapPartitions(_.flatMap(gz => parseRecords(gunzip(gz))))
      .toDF("url", "warc_date", "html")
      .withColumn("warc_ts", to_timestamp(col("warc_date"), "yyyy-MM-dd'T'HH:mm:ss'Z'"))
      .select(col("url"), col("warc_ts"), col("html"))
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline._

/** Dev profiler: per-stage wall times for the flagship pipeline.
  * Usage: sbt "runMain graft.tools.Profile <nPages> [cores]". */
object Profile {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 40000L
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val pages = Corpus.pages(spark, n)
    time("gen pages (count)")(pages.count())
    time("gen pages+render (count via text len)")(
      pages.map(p => p.html.length.toLong).reduce(_ + _))
    val docs = Kg.extractText(pages)
    time("extractText")(docs.map(_.text.length.toLong).reduce(_ + _))
    val chunks = Kg.chunk(docs)
    time("chunk")(chunks.count())
    val resolved = Kg.resolve(chunks)
    time("coref")(resolved.count())
    val trips = Kg.triples(resolved)
    time("relations+normalize")(trips.count())
    val dd = Kg.dedup(trips)
    time("dedup")(dd.count())
    time("full graph") {
      val (t, nodes, edges) = Pipeline.graph(pages, Corpus.kb(spark))
      val r = (t.count(), nodes.count(), edges.count())
      t.unpersist()
      println(s"[profile]   triples=${r._1} nodes=${r._2} edges=${r._3}")
    }
    val t0 = System.nanoTime()
    val (t2, nodes2, edges2) = Pipeline.graph(pages, Corpus.kb(spark))
    val nt = t2.count(); val nn = nodes2.count(); val ne = edges2.count()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[profile] WARM graph: $dt%.2f s → ${n / dt}%.0f docs/s, ${nt / dt}%.0f triples/s (nodes=$nn edges=$ne)")
    spark.stop()
  }
}

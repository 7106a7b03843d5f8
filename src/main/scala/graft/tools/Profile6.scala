package graft.tools
import org.apache.spark.sql.SparkSession
import graft.pipeline._
object Profile6 {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0) else "32"
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time[A](l: String)(f: => A): A = { val t0=System.nanoTime(); val r=f; println(f"[p6] $l: ${(System.nanoTime()-t0)/1e9}%.2f s"); r }
    val kb = Corpus.kb(spark)
    (1 to 2).foreach { round =>
      println(s"[p6] round $round")
      val pages = Corpus.pages(spark, 500000L, 128)
      time("gen only (sum text len)")(pages.map(_.text.length.toLong).reduce(_+_))
      time("NLP+dedup+write triples")(
        Kg.pagesToTriples(pages).write.mode("overwrite").parquet("/tmp/p6/triples"))
      val trip = spark.read.parquet("/tmp/p6/triples").as[TripleRow]
      val (nodes, edges) = time("build plans + link (forces vocab)")(Pipeline.graphFromTriples(trip, kb))
      time("nodes.write")(nodes.write.mode("overwrite").parquet("/tmp/p6/n"))
      time("edges.write")(edges.write.mode("overwrite").parquet("/tmp/p6/e"))
    }
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.sql.SparkSession
import graft.pipeline._
object Profile2 {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0) else "32"
    val n = if (args.length > 1) args(1).toLong else 40000L
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("P2_SHUFFLE","128"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](l: String)(f: => A): A = { val t0=System.nanoTime(); val r=f; println(f"[p2] $l: ${(System.nanoTime()-t0)/1e9}%.2f s"); r }
    val kb = Corpus.kb(spark)
    (1 to 2).foreach { round =>
      println(s"[p2] === round $round ===")
      val pages = Corpus.pages(spark, n, 128)
      val (trip, nodes, edges) = Pipeline.graph(pages, kb)
      time("trip.count (NLP+dedup+persist)")(trip.count())
      time("nodes.write")(nodes.write.mode("overwrite").parquet("/tmp/p2/nodes"))
      time("edges.write")(edges.write.mode("overwrite").parquet("/tmp/p2/edges"))
      time("nodes.count")(nodes.count())
      time("edges.count")(edges.count())
      trip.unpersist()
    }
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.sql.SparkSession
import graft.pipeline._
object Profile7 { // NLP-phase-only timing
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0) else "32"
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    (1 to 3).foreach { round =>
      val t0 = System.nanoTime()
      val n = Kg.pagesToTriples(Corpus.pages(spark, 500000L, 128)).count()
      println(f"[p7] round $round cores=$cores NLP+dedup count: ${(System.nanoTime()-t0)/1e9}%.2f s (triples=$n)")
    }
    spark.stop()
  }
}

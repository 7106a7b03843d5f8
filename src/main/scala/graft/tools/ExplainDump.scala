package graft.tools
import org.apache.spark.sql.SparkSession
import graft.pipeline._
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pages = Corpus.pages(spark, 1000, 4)
    println("===== pages -> triples (fused extraction) =====")
    Kg.pagesToTriples(pages).explain("formatted")
    val trip = Kg.pagesToTriples(pages)
    val (nodes, edges) = Pipeline.graphFromTriples(trip, Corpus.kb(spark, 500))
    println("===== edges (linking join-back) =====")
    edges.explain("formatted")
    spark.stop()
  }
}

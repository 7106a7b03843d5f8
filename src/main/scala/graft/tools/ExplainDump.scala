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
    println("===== entityProps (A3 two-phase aggregation) =====")
    Kg.entityProps(trip.toDF).explain("formatted")
    println("===== jsonLdDocuments (one groupByKey) =====")
    Pipeline.jsonLdDocuments(trip).explain("formatted")
    println("===== linkSurfaces (kg_links shape) =====")
    import org.apache.spark.sql.functions.col
    val surfaces = trip.toDF.select(col("subj_surface").as("surface"))
      .unionByName(trip.toDF.filter(col("obj_is_entity")).select(col("obj").as("surface")))
      .distinct()
    Pipeline.linkSurfaces(surfaces, Corpus.kb(spark, 500)).explain("formatted")
    spark.stop()
  }
}

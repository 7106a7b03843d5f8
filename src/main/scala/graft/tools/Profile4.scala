package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline._
object Profile4 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time[A](l: String)(f: => A): A = { val t0=System.nanoTime(); val r=f; println(f"[p4] $l: ${(System.nanoTime()-t0)/1e9}%.2f s"); r }
    val trip = spark.read.parquet("/tmp/p3/wk/triples")
    (1 to 2).foreach { round =>
    println(s"[p4] round $round")
    time("count")(trip.count())
    time("scan all cols")(trip.filter(col("subj").isNotNull).count())
    time("surfaces union distinct")(
      trip.select(col("subj_surface").as("surface"))
        .unionByName(trip.filter(col("obj_is_entity")).select(col("obj").as("surface")))
        .distinct().count())
    val kb = Corpus.kb(spark)
    val links = time("linkSurfaces full")( {
      val s = trip.select(col("subj_surface").as("surface"))
        .unionByName(trip.filter(col("obj_is_entity")).select(col("obj").as("surface"))).distinct()
      val l = Pipeline.linkSurfaces(s, kb); println("[p4] links rows=" + l.count()); l
    })
    val lp = links.persist(); lp.count()
    val enriched = trip
      .join(broadcast(lp.select(col("surface").as("subj_surface"), col("uri").as("subj_kb_uri"))), Seq("subj_surface"), "left")
      .join(broadcast(lp.select(col("surface").as("obj"), col("uri").as("obj_kb_uri"))), Seq("obj"), "left")
    time("enrich count")(enriched.count())
    val (nodes, edges) = Graph.materialize(enriched)
    time("nodes agg")(nodes.count())
    time("edges dedup")(edges.count())
    lp.unpersist()
    }
    spark.stop()
  }
}

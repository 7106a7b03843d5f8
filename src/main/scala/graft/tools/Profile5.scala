package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Profile5 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](l: String)(f: => A): A = { val t0=System.nanoTime(); val r=f; println(f"[p5] $l: ${(System.nanoTime()-t0)/1e9}%.2f s"); r }
    val trip = spark.read.parquet("/tmp/p3/wk/triples")
    println("[p5] scan partitions=" + trip.rdd.getNumPartitions)
    (1 to 2).foreach { r =>
      println(s"[p5] round $r")
      time("count")(trip.count())
      time("distinct subj_surface")(trip.select("subj_surface").distinct().count())
      time("groupBy subj count")(trip.groupBy("subj").count().count())
      time("min_by agg")(trip.groupBy("subj").agg(min_by(struct(col("pred"),col("obj")), struct(col("chunk_id"),col("sent_idx")))).count())
      time("sha1+concat project")(trip.select(concat(lit("x"), col("subj"), substring(sha1(col("subj_surface")),1,8)).as("i")).filter(col("i").isNotNull).count())
      time("dropDuplicates 5col")(trip.dropDuplicates("subj","pred","obj","url","chunk_id").count())
    }
    spark.stop()
  }
}

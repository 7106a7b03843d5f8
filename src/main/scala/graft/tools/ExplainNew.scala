package graft.tools
import org.apache.spark.sql.SparkSession
object ExplainNew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, s"tok${i%7} tok${i%5} tok${i%3} end")).toDF("doc_id", "text")
    println("===== lmScore =====")
    graft.ops.TextAnalysis.lmScore(docs, "doc_id", "text").explain("formatted")
    val named = (1L to 200L).map(i => (i, s"acme systems ${i % 9}")).toDF("id", "name")
    println("===== jwContainsJoin =====")
    graft.ops.Dedup.jwContainsJoin(named, "id", "name", 0.9).explain("formatted")
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.sql.SparkSession
object ExtDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("[ext] " + spark.sql("SELECT slug('Björk Guðmundsdóttir') AS s").head().getString(0))
    println("[ext] over table: " + spark.sql(
      "SELECT slug(c_name) FROM parquet.`/root/testdata/sf0.001/customer.parquet` LIMIT 1").head().getString(0))
    try spark.sql("SELECT slug(123)").collect()
    catch { case e: Exception => println("[ext] wrong-type error: " + e.getMessage.split("\n")(0).take(120)) }
    try spark.sql("SELECT slug('a','b')").collect()
    catch { case e: Exception => println("[ext] arity error: " + e.getMessage.split("\n")(0).take(120)) }
    spark.stop()
  }
}

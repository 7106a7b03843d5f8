package graft.functions

import graft.SparkTestBase
import graft.kernel.Slug
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkTestBase {

  test("SlugExpression matches the kernel on goldens and unicode") {
    import spark.implicits._
    val names = Seq("Alan Bean", "José García", "Björk Guðmundsdóttir",
      "AT&T Corporation", "O'Reilly Media", "MIT", "", "  spaces  ")
    val out = names.toDF("name")
      .select(SlugExpression.slug(col("name")).as("s"))
      .collect().map(_.getString(0))
    assert(out.toSeq == names.map(Slug.slug))
  }

  test("SlugExpression handles null without evaluating") {
    import spark.implicits._
    val out = Seq(Some("Alan Bean"), None).toDF("name")
      .select(SlugExpression.slug(col("name"))).collect()
    assert(out(0).getString(0) == "alan_bean")
    assert(out(1).isNullAt(0))
  }

  test("slug is registered for SQL via extensions and stays in codegen") {
    // register on the shared session the same way the extension does
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "slug", GraftExtensions.slugFunction._3, "built-in")
    val df = spark.sql("SELECT slug('José García') AS s")
    assert(df.head().getString(0) == "jose_garcia")
    // the expression must appear as a native call, not a ScalaUDF
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
  }
}

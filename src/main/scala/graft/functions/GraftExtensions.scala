package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's native
  * functions for SQL use. Enable with
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * or .withExtensions(new GraftExtensions) — after which
  * `SELECT slug(name)` works in spark.sql. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.slugFunction)
    ext.injectFunction(GraftExtensions.jaroWinklerFunction)
  }
}

object GraftExtensions {
  val slugFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("slug"),
    new ExpressionInfo(classOf[SlugExpression].getName, "slug"),
    (children: Seq[Expression]) => {
      require(children.length == 1, s"slug expects exactly 1 argument, got ${children.length}")
      SlugExpression(children.head)
    })

  val jaroWinklerFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("jaro_winkler"),
    new ExpressionInfo(classOf[JaroWinklerExpression].getName, "jaro_winkler"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"jaro_winkler expects exactly 2 arguments, got ${children.length}")
      JaroWinklerExpression(children.head, children(1))
    })
}

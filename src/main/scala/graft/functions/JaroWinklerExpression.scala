package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Jaro-Winkler similarity — the
  * codegen'd upgrade of the jwUdf used by fuzzy linking (J2). A Scala
  * UDF boxes both UTF8Strings per row and breaks whole-stage codegen
  * at the candidate-scoring step of the blocked fuzzy join; this stays
  * inside the generated code via a static call.
  *
  * Semantics identical to kernel.Jaro.jaroWinkler (golden-tested,
  * strsim-compatible: prefix 4, scale 0.1, boost above 0.7). */
case class JaroWinklerExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler requires (STRING, STRING), got (${left.dataType}, ${right.dataType})")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerExpression.evalUtf8(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerExpression.evalUtf8($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaro_winkler"
}

object JaroWinklerExpression {
  /** Static entry used by both interpreted and generated code. */
  def evalUtf8(a: UTF8String, b: UTF8String): Double =
    graft.kernel.Jaro.jaroWinkler(a.toString, b.toString)

  /** Column-API surface (Spark 4 classic bridge). */
  def jaroWinkler(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      JaroWinklerExpression(
        org.apache.spark.sql.graftbridge.Bridge.expression(a),
        org.apache.spark.sql.graftbridge.Bridge.expression(b)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for entity-name slugification — the
  * codegen'd upgrade of the Scala UDF (SURVEY.md §2.10: "candidates for
  * custom Catalyst Expression only if profiling shows UDF overhead
  * matters"; a UDF boxes UTF8String→String→result per row and blocks
  * whole-stage codegen's null-check elision — this stays inside the
  * generated code via a static call).
  *
  * Semantics identical to kernel.Slug.slug (golden-tested). */
case class SlugExpression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"slug requires STRING, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    SlugExpression.evalUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SlugExpression.evalUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): SlugExpression =
    copy(child = newChild)

  override def prettyName: String = "slug"
}

object SlugExpression {
  /** Static entry used by both interpreted and generated code. */
  def evalUtf8(s: UTF8String): UTF8String =
    UTF8String.fromString(graft.kernel.Slug.slug(s.toString))

  /** Column-API surface (Spark 4 classic bridge). */
  def slug(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      SlugExpression(org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}

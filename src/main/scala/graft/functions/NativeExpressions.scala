package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Damerau-Levenshtein distance — the
  * optional perf upgrade over a Scala UDF (SURVEY.md §4): no
  * UDF serialization boundary, participates in whole-stage codegen (the
  * generated code calls the static `Similarity.damerau` directly on the
  * operand strings), and stays inside the codegen span that surrounds
  * it, exactly like Spark's builtin `levenshtein`.
  */
case class DamerauLevenshteinExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Similarity.damerau(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.Similarity.damerau($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NativeExpressions {
  /** Column API over the native expression. */
  def damerauNative(a: Column, b: Column): Column =
    GraftBridge.column(DamerauLevenshteinExpr(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** SQL registration: `damerau_levenshtein(a, b)` resolves to the
    * native expression (vs the `graft_damerau` UDF in Registry). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "damerau_levenshtein",
      exprs => DamerauLevenshteinExpr(exprs(0), exprs(1)),
      "built-in")
}

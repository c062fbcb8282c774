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

/** Intersection size of two SORTED long arrays — a native expression so
  * the merge scan runs on unboxed ArrayData (a UDF materializes both
  * arrays as boxed Seq[Long] per row — measurable at millions of pairs).
  */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    NativeExpressions.intersectSortedCount(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.NativeExpressions.intersectSortedCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NativeExpressions {

  /** Merge-scan intersection count over ArrayData (no boxing). Called
    * from generated code — must stay a static-forwardable method. */
  def intersectSortedCount(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
    var i = 0; var j = 0; var c = 0
    val la = a.numElements(); val lb = b.numElements()
    while (i < la && j < lb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** Column API: intersection size of two sorted array<long> columns. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftBridge.column(SortedIntersectCountExpr(
      GraftBridge.expression(a), GraftBridge.expression(b)))

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

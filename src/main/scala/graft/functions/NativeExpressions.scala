package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
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
  // analysis-time type check: without it, an int argument resolves fine
  // and then dies at execution with a ClassCastException deep in a task
  // (Spark's builtin levenshtein gives a clean plan-time error)
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
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
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
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

/** Per-row error capture for recipe `eval` expressions — the Spark
  * re-expression of the reference's safeeval "Ooops:" policy
  * (code/recipes.py:1644-1695 + tools.py safeeval): a failing expression
  * writes the error message INTO THE CELL instead of failing the task,
  * and the job continues. The child must already be cast to string.
  * CodegenFallback on purpose: a per-row try/catch cannot be spliced
  * safely into whole-stage codegen (subexpression hoisting may move the
  * child out of the guarded region) — this is a debug/robustness mode,
  * not a hot path; the default eval stays fully codegen'd.
  */
case class TryErrorStringExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "try_error_string"

  override def eval(input: InternalRow): Any =
    try child.eval(input) catch {
      case e: Exception => UTF8String.fromString(
        "Ooops: " + String.valueOf(e.getMessage).takeWhile(_ != '\n'))
    }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** One trained BPE merge list, compiled for per-word segmentation —
  * the inference-side engine behind `Curation.bpeEncode`. Applies the
  * merges STRICTLY SEQUENTIALLY in training order with a left-to-right
  * rescan per merge — the exact contract of `Curation.bpeMergeApply`'s
  * Column fold and of the DuckDB oracle's `list_reduce` replay.
  * Rank-priority encoding (the tokenizer-serving shortcut) is NOT
  * equivalent in general: a later merge can re-form a string equal to
  * an earlier merge's operand (the duplicate-symbol case documented on
  * `bpeVocab`), and priority order would then fire the earlier merge
  * where the sequential pass already moved past it.
  *
  * Scale shape: cost is per DISTINCT word, not per token — a bounded
  * per-executor memo (ConcurrentHashMap, 1M entries ≈ the Heaps'-law
  * vocabulary of a web corpus) makes repeated words O(1), which is the
  * same economics as pre-segmenting the distinct-word table and
  * broadcasting the dictionary, without the broadcast. Each merge round
  * costs one alloc-free existence scan; the rebuild runs only when the
  * pair is present. */
final class BpeCodec(merges: Seq[(String, String)], sep: String)
    extends Serializable {
  private val ma = merges.map(_._1).toArray
  private val mb = merges.map(_._2).toArray
  private val memoCap = 1 << 20
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Sep-joined subword symbols of one word. Called from generated
    * code — must stay a public instance method. */
  def segment(word: String): String = {
    val hit = memo.get(word)
    if (hit != null) return hit
    val out = compute(word)
    if (memo.size < memoCap) memo.putIfAbsent(word, out)
    out
  }

  private def compute(word: String): String = {
    // split by code point — the char-join regex "(.)" both engines
    // already collate on matches per code point, not per UTF-16 unit
    var syms = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      syms.add(word.substring(i, i + n))
      i += n
    }
    var m = 0
    while (m < ma.length) {
      val a = ma(m); val b = mb(m)
      var j = 0; var found = false
      while (j < syms.size - 1 && !found) {
        if (syms.get(j) == a && syms.get(j + 1) == b) found = true
        j += 1
      }
      if (found) {
        // left-to-right rescan against the freshly merged symbol —
        // "aaa"+(a,a) → [aa, a] — identical to the bpeMergeApply fold
        val next = new java.util.ArrayList[String](syms.size)
        var k = 0
        while (k < syms.size) {
          val x = syms.get(k)
          if (!next.isEmpty && next.get(next.size - 1) == a && x == b)
            next.set(next.size - 1, a + b)
          else next.add(x)
          k += 1
        }
        syms = next
      }
      m += 1
    }
    String.join(sep, syms)
  }
}

/** Native expression wrapping [[BpeCodec.segment]]: WORD string in,
  * sep-joined subword string out. A native expression (not a UDF) so
  * it runs inside whole-stage codegen and inside `transform` lambdas
  * without a serialization boundary; the codec rides the codegen
  * references array, so the memo is shared across a task's rows. */
case class BpeSegmentExpr(child: Expression,
    merges: Seq[(String, String)], sep: String) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.simpleString}")
  override def prettyName: String = "bpe_segment_word"

  @transient private lazy val codec = new BpeCodec(merges, sep)

  override protected def nullSafeEval(w: Any): Any =
    UTF8String.fromString(codec.segment(w.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeCodec", codec,
      classOf[BpeCodec].getName)
    defineCodeGen(ctx, ev, w =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"$ref.segment($w.toString()))")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NativeExpressions {

  /** Column API: segment one word with a trained merge list (see
    * [[BpeCodec]] for the sequential-order contract). */
  def bpeSegmentWord(w: Column, merges: Seq[(String, String)],
      sep: String): Column =
    GraftBridge.column(BpeSegmentExpr(
      GraftBridge.expression(w), merges, sep))

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

  /** Column API: evaluate `c` per row; on error the cell becomes
    * "Ooops: <message>" (string result either way). */
  def evalOrErrorString(c: Column): Column =
    GraftBridge.column(TryErrorStringExpr(
      GraftBridge.expression(c.cast("string"))))

  /** Column API over the native expression. */
  def damerauNative(a: Column, b: Column): Column =
    GraftBridge.column(DamerauLevenshteinExpr(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** SQL registration: `damerau_levenshtein(a, b)` resolves to the
    * native expression (vs the `graft_damerau` UDF in Registry). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "damerau_levenshtein",
      { exprs =>
        // a 3-arg call would otherwise silently drop its extra argument
        require(exprs.length == 2,
          s"damerau_levenshtein expects 2 arguments, got ${exprs.length}")
        DamerauLevenshteinExpr(exprs(0), exprs(1))
      },
      "built-in")
}

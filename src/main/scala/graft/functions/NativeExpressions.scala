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

/** Shared analysis-time checks for the fused vector-distance
  * expressions below. */
private[functions] object VectorExprChecks {
  import org.apache.spark.sql.types._
  def numericArray(t: DataType): Boolean = t match {
    case ArrayType(DoubleType | FloatType | LongType | IntegerType, _) => true
    case _ => false
  }
  def integralArray(t: DataType): Boolean = t match {
    case ArrayType(LongType | IntegerType | ShortType | ByteType, _) => true
    case _ => false
  }
  /** Element accessor tag for the static helpers: 0 double, 1 float,
    * 2 long, 3 int, 4 short, 5 byte. */
  def tag(t: DataType): Int = t match {
    case ArrayType(DoubleType, _) => 0
    case ArrayType(FloatType, _) => 1
    case ArrayType(LongType, _) => 2
    case ArrayType(IntegerType, _) => 3
    case ArrayType(ShortType, _) => 4
    case ArrayType(ByteType, _) => 5
    case other => sys.error(s"unsupported vector element type $other")
  }
}

/** Fused dot-and-norms of two numeric arrays — ONE unboxed pass
  * computing struct(dot, na = |a|², nb = |b|²) together, replacing the
  * five interpreted higher-order traversals (2 casts via transform,
  * zip_with product alloc, 3 aggregates) the cosine Column spelling
  * cost per PAIR in every ANN scoring path. Deliberately NOT the full
  * cosine: the final dot/(sqrt(na)·sqrt(nb)) stays composed from stock
  * Sqrt/Divide expressions so the division keeps Spark's exact
  * semantics — under ANSI a zero denominator (empty arrays, zero-norm
  * vectors) THROWS DIVIDE_BY_ZERO, exactly as the old spelling did.
  * Bit-identical accumulation: each accumulator's additions run in
  * element order (independent sequential IEEE chains) and elements
  * widen to double exactly as cast("double"). NULL array, length
  * mismatch (zip_with's null padding) or NULL element ⇒ NULL struct ⇒
  * NULL cosine, as before. */
case class DotNormsExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

  override def dataType: DataType = StructType(Seq(
    StructField("dot", DoubleType, nullable = false),
    StructField("na", DoubleType, nullable = false),
    StructField("nb", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorExprChecks.numericArray(left.dataType) &&
        VectorExprChecks.numericArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two numeric arrays, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def prettyName: String = "dot_norms"

  private lazy val tagA = VectorExprChecks.tag(left.dataType)
  private lazy val tagB = VectorExprChecks.tag(right.dataType)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    NativeExpressions.dotNormsRow(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      tagA, tagB)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dnTmp")
      s"""
         |InternalRow $tmp = graft.functions.NativeExpressions
         |  .dotNormsRow($a, $b, $tagA, $tagB);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused squared L2 distance Σ(aᵢ−bᵢ)² over numeric arrays — the IVF
  * probes' centroid-ranking kernel, same contract notes as
  * [[CosineSimExpr]] (sequential addition order = the
  * aggregate(zip_with) spelling; NULL/length-mismatch ⇒ NULL). */
case class L2Dist2Expr(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.types.DoubleType

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorExprChecks.numericArray(left.dataType) &&
        VectorExprChecks.numericArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two numeric arrays, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def prettyName: String = "l2_dist2"

  private lazy val tagA = VectorExprChecks.tag(left.dataType)
  private lazy val tagB = VectorExprChecks.tag(right.dataType)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    NativeExpressions.l2Dist2Boxed(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      tagA, tagB)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("l2Tmp")
      s"""
         |java.lang.Double $tmp = graft.functions.NativeExpressions
         |  .l2Dist2Boxed($a, $b, $tagA, $tagB);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused integer squared grid distance Σ(aᵢ−bᵢ)² over INTEGRAL arrays —
  * the quantized probes' exact long arithmetic. Overflow throws
  * (Math.addExact/multiplyExact), matching the ANSI behavior of the
  * long Multiply/Add the Column spelling used; NULL/length-mismatch ⇒
  * NULL as in [[CosineSimExpr]]. */
case class GridDist2Expr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorExprChecks.integralArray(left.dataType) &&
        VectorExprChecks.integralArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two integral arrays, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def prettyName: String = "grid_dist2"

  private lazy val tagA = VectorExprChecks.tag(left.dataType)
  private lazy val tagB = VectorExprChecks.tag(right.dataType)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    NativeExpressions.gridDist2Boxed(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      tagA, tagB)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("gdTmp")
      s"""
         |java.lang.Long $tmp = graft.functions.NativeExpressions
         |  .gridDist2Boxed($a, $b, $tagA, $tagB);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.longValue(); }
       """.stripMargin
    })

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

  // ------------------------------------------- fused vector distances
  private def elemAsDouble(
      a: org.apache.spark.sql.catalyst.util.ArrayData,
      i: Int, tag: Int): Double = tag match {
    case 0 => a.getDouble(i)
    case 1 => a.getFloat(i).toDouble
    case 2 => a.getLong(i).toDouble
    case 3 => a.getInt(i).toDouble
    case 4 => a.getShort(i).toDouble
    case _ => a.getByte(i).toDouble
  }

  private def elemAsLong(
      a: org.apache.spark.sql.catalyst.util.ArrayData,
      i: Int, tag: Int): Long = tag match {
    case 2 => a.getLong(i)
    case 3 => a.getInt(i).toLong
    case 4 => a.getShort(i).toLong
    case _ => a.getByte(i).toLong
  }

  /** Fused (dot, |a|², |b|²) over ArrayData (see [[DotNormsExpr]] for
    * the exact-equivalence contract). Called from generated code. */
  def dotNormsRow(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData,
      tagA: Int, tagB: Int): InternalRow = {
    val la = a.numElements(); val lb = b.numElements()
    if (la != lb) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < la) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = elemAsDouble(a, i, tagA); val y = elemAsDouble(b, i, tagB)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](dot, na, nb))
  }

  /** Fused Σ(aᵢ−bᵢ)² over ArrayData doubles. Called from generated
    * code. */
  def l2Dist2Boxed(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData,
      tagA: Int, tagB: Int): java.lang.Double = {
    val la = a.numElements(); val lb = b.numElements()
    if (la != lb) return null
    var acc = 0.0
    var i = 0
    while (i < la) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = elemAsDouble(a, i, tagA) - elemAsDouble(b, i, tagB)
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Fused exact-long Σ(aᵢ−bᵢ)² over integral ArrayData; overflow
    * throws (ANSI parity). Called from generated code. */
  def gridDist2Boxed(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData,
      tagA: Int, tagB: Int): java.lang.Long = {
    val la = a.numElements(); val lb = b.numElements()
    if (la != lb) return null
    var acc = 0L
    var i = 0
    while (i < la) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = Math.subtractExact(elemAsLong(a, i, tagA), elemAsLong(b, i, tagB))
      acc = Math.addExact(acc, Math.multiplyExact(d, d))
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  /** Column API: fused cosine similarity (numeric arrays → double).
    * The division composes from stock Sqrt/Divide so ANSI zero-divisor
    * semantics match the old higher-order spelling exactly (see
    * [[DotNormsExpr]]). */
  def cosineSim(a: Column, b: Column): Column = {
    val f = GraftBridge.column(DotNormsExpr(
      GraftBridge.expression(a), GraftBridge.expression(b)))
    f.getField("dot") /
      (org.apache.spark.sql.functions.sqrt(f.getField("na")) *
        org.apache.spark.sql.functions.sqrt(f.getField("nb")))
  }

  /** Column API: fused squared L2 distance (numeric arrays → double). */
  def l2Dist2(a: Column, b: Column): Column =
    GraftBridge.column(L2Dist2Expr(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Column API: fused exact-long squared grid distance (integral
    * arrays → long). */
  def gridDist2(a: Column, b: Column): Column =
    GraftBridge.column(GridDist2Expr(
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

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Strict and fuzzy joins — internal_join flavors 1 and 2
  * (/root/reference/code/recipes.py:2120-2264). The reference caches the
  * right side in process memory (`config.inmemory`); the Spark-scale
  * analogue is a broadcast hash join for small referentials and a plain
  * shuffle join otherwise.
  */
object Joins {

  /** Strict join: left-outer by default, keys = map left-col → right-col;
    * `select` = map right-col → output name for the retrieved columns;
    * right-side key columns are dropped from the output
    * (code/recipes.py:2244-2264).
    *
    * @param broadcastRight hint the right side as broadcastable — true for
    *   referential enrichment (the reference's only use case); set false
    *   when the right side is large and let AQE pick the strategy.
    */
  def strictJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Map[String, String],
      select: Map[String, String],
      how: String = "left",
      broadcastRight: Boolean = true): DataFrame = {

    val neededRight = (keys.values ++ select.keys).toSeq.distinct
    // prefix right columns to avoid collisions, prune to needed ones
    val pref = right.select(neededRight.map(c => col(c).as(s"__r_$c")): _*)
    val r = if (broadcastRight) broadcast(pref) else pref
    val cond = keys.map { case (l, rc) => left(l) === r(s"__r_$rc") }
      .reduce(_ && _)
    val joined = left.join(r, cond, how)
    val renamed = select.foldLeft(joined) { case (d, (rc, out)) =>
      d.withColumn(out, col(s"__r_$rc"))
    }
    renamed.drop(neededRight.map(c => s"__r_$c"): _*)
  }

  /** Fuzzy join (code/recipes.py:2158-2230): for each fuzzy column, find
    * the closest right-side vocabulary word within edit distance
    * `maxDist`, put it in `{col}_match`, then strict-join on the matched
    * value (+ any strict keys).
    *
    * Distributed design (replaces the reference's in-process Levenshtein
    * automaton, code/automata.py): candidate generation by
    * deletion-neighborhood join (FastSS/SymSpell family) — both sides
    * explode into their delete-≤maxDist variants, candidates meet on a
    * variant hash-join, then true edit distance filters and the
    * lexicographically-first word at minimal distance wins (same
    * tie-break as the automaton walking a sorted vocabulary,
    * automata.py:152-191). No driver-side loop; the variant join scales
    * out and the vocab side is broadcast when small.
    */
  def fuzzyJoin(
      left: DataFrame,
      right: DataFrame,
      fuzzy: Map[String, String],
      strict: Map[String, String] = Map.empty,
      select: Map[String, String] = Map.empty,
      maxDist: Int = 1,
      how: String = "left",
      broadcastRight: Boolean = true): DataFrame = {

    var cur = left
    val matchKeys = fuzzy.map { case (lc, rc) =>
      val vocab = right.select(col(rc).as("__w")).na.drop().distinct()
      val matched = FuzzyMatch.bestMatch(
        cur.select(col(lc).as("__q")).na.drop().distinct(),
        vocab, maxDist, broadcastVocab = broadcastRight)
      // matched: __q, __match, __dist
      val m = if (broadcastRight) broadcast(matched) else matched
      cur = cur
        .join(m.select(col("__q"), col("__match").as(s"${lc}_match")),
          cur(lc) === col("__q"), "left")
        .drop("__q")
      (s"${lc}_match", rc)
    }
    strictJoin(cur, right, matchKeys.toMap ++ strict, select, how, broadcastRight)
  }

  /** As-of join: attach to each left row the LATEST right row with
    * `right.ts <= left.ts` for the same key (event-time lookup — "the
    * most recent quote/purchase/state before this event"). Spark has no
    * built-in as-of join; the classic range-join formulation
    * (`l.key = r.key AND r.ts <= l.ts` + a window to keep the max) is
    * quadratic per key. This is the linear formulation: tag both sides,
    * union, ONE shuffle on the key, ONE sort on (ts, side), and a
    * running `last(_, ignoreNulls)` carries each right value forward to
    * the left rows that follow it — O(n log n) per partition, no
    * per-key blowup, skew bounded by the hottest key exactly like any
    * keyed window.
    *
    * Right rows at the same key+ts as a left row DO match (inclusive).
    * If the right side has several rows at the same (key, ts) the last
    * by `tieBreak` wins — pre-aggregate the right side when that
    * ambiguity matters. `how` = "left" (unmatched left rows keep nulls)
    * or "inner" (drop them).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      rightCols: Seq[String],
      how: String = "left",
      prefix: String = "asof_",
      tieBreak: Option[String] = None): DataFrame = {
    require(how == "left" || how == "inner", s"asofJoin: unsupported how=$how")
    val leftType = org.apache.spark.sql.types.StructType(left.schema.fields)
    // the tie-break column keeps its OWN type (casting to long would
    // null out string/timestamp tie-breaks and silently fall back to
    // partition order); left rows carry a same-typed null
    val tbType = tieBreak.map(c => right.schema(c).dataType)
      .getOrElse(org.apache.spark.sql.types.LongType)
    val l = left.select(
      Seq(col(key).as("__k"), col(ts).as("__ts"), lit(1).as("__side"),
        struct(left.columns.toIndexedSeq.map(col): _*).as("__l"),
        lit(null).cast(tbType).as("__tb")) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    // SQL comparison semantics: a right row with NULL ts (or NULL key)
    // can never satisfy right.ts <= left.ts — without this filter it
    // would sort FIRST (nulls-first) and its value would be carried to
    // every left row of the key
    val r = right
      .filter(col(ts).isNotNull && col(key).isNotNull)
      .select(
        Seq(col(key).as("__k"), col(ts).as("__ts"), lit(0).as("__side"),
          lit(null).cast(leftType).as("__l"),
          tieBreak.map(col(_)).getOrElse(lit(0L)).as("__tb")) ++
          rightCols.map(c => col(c).as(s"__r_$c")): _*)
    // right rows sort BEFORE left rows at equal ts → inclusive match.
    // The carry is ONE struct of (ts, right values): the struct itself is
    // non-null exactly when a right row has been seen, so a right row
    // whose VALUE is legitimately NULL is still the one carried (it does
    // not fall through to an older non-null row) — and one struct carry
    // means one window expression instead of |rightCols|+1.
    val w = Window.partitionBy("__k")
      .orderBy(col("__ts"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rStruct = struct(col("__ts").as("__mts") +:
      rightCols.map(c => col(s"__r_$c").as(s"__r_$c")): _*)
    val carried = l.unionByName(r)
      .withColumn("__carry",
        last(when(col("__side") === 0, rStruct), ignoreNulls = true).over(w))
    val leftRows = carried.filter(col("__side") === 1)
    val kept = if (how == "inner") leftRows.filter(col("__carry").isNotNull) else leftRows
    kept.select(col("__l.*") +:
      rightCols.map(c => col(s"__carry.__r_$c").as(s"$prefix$c")): _*)
  }

  /** Point-in-interval range join: pair each point row with every
    * interval row of the same key whose `[start, end]` contains the
    * point's `ts` (inclusive both ends). Spark plans a raw
    * `BETWEEN`-join as a nested loop — quadratic per key. Here both
    * sides discretize time into `binWidth`-sized bins: a point lands in
    * exactly ONE bin, an interval explodes into the bins it covers, and
    * the candidates meet on an equi-join over (key, bin) — one shuffle,
    * and no dedup is needed afterwards because the point's single bin
    * makes every (point, interval) pair meet at most once. The true
    * containment predicate filters bin-edge false positives.
    *
    * Pick `binWidth` near the TYPICAL interval length: replication of an
    * interval = its length / binWidth + 1, work per bin = points×intervals
    * sharing it. Timestamps must be non-negative (epoch values are).
    */
  def pointInIntervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      key: String,
      ts: String,
      start: String,
      end: String,
      binWidth: Long,
      prefix: String = "ivl_"): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin", expr(s"$ts DIV $binWidth"))
    val ivl = intervals
      .withColumn("__bin", explode(expr(s"sequence($start DIV $binWidth, $end DIV $binWidth)")))
      .select(Seq(col(key).as("__ik"), col("__bin")) ++
        intervals.columns.map(c => col(c).as(s"$prefix$c")): _*)
    p.join(ivl, p(key) === ivl("__ik") && p("__bin") === ivl("__bin"))
      .filter(col(ts) >= col(s"$prefix$start") && col(ts) <= col(s"$prefix$end"))
      .drop("__bin", "__ik")
  }
}

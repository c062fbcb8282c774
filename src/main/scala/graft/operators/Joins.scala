package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}

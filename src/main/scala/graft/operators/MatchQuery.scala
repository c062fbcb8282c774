package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Bool-query semantics for the match join — the interpreter for the
  * reference's ES query templates (must / should / minimum_should_match /
  * per-clause fuzziness / span_first;
  * /root/reference/conf/recipes/matching.yml:11-49, SURVEY.md §7.3).
  *
  * Each clause matches one left token-array field against one right
  * token-array field. A candidate (left row, right row) pair:
  *   - must satisfy EVERY `required` (must) clause,
  *   - must satisfy at least `minimumShouldMatch` optional clauses,
  *   - scores the quantized-IDF sum over all satisfied clauses
  *     (deterministic integer units, same contract as MatchJoin).
  * `firstPosition` restricts the right side to its FIRST token — the
  * span_first analogue (name-starts-with semantics).
  *
  * Plan shape: one token equi-join per clause (each a candidate
  * generator, unioned), one groupBy over (left, right, clause) set, a
  * filter on clause satisfaction, and a top-k window — all shuffles on
  * small keys; IDF tables broadcast.
  */
object MatchQuery {

  /** One bool clause over token-array fields. */
  case class Clause(
      leftTokens: String, rightTokens: String,
      required: Boolean = false,
      fuzziness: Int = 0,
      firstPosition: Boolean = false,
      boost: Double = 1.0)

  case class Spec(
      clauses: Seq[Clause],
      minimumShouldMatch: Int = 1,
      k: Int = 10)

  private def delVariants(c: String): org.apache.spark.sql.Column =
    array_distinct(concat(array(col(c)),
      expr(s"transform(sequence(1, length(`$c`)), i -> concat(substring(`$c`, 1, i-1), substring(`$c`, i+1)))")))

  def run(left: DataFrame, right: DataFrame, spec: Spec,
      leftId: String, rightId: String): DataFrame = {
    require(spec.clauses.nonEmpty, "at least one clause")
    // Corpus size rides the plan as a broadcast one-row aggregate (same
    // pattern as MatchJoin): no eager count() job — and no extra full
    // corpus scan — before the query's own action runs.
    val nDocs = broadcast(right.agg(
      countDistinct(col(rightId)).cast("double").as("__n")))

    // per-clause candidate scores (lid, rid, clauseIdx, score)
    val perClause = spec.clauses.zipWithIndex.map { case (cl, idx) =>
      val rTokens =
        if (cl.firstPosition) slice(array_distinct(col(cl.rightTokens)), 1, 1)
        else array_distinct(col(cl.rightTokens))
      val postings = right.select(col(rightId).as("__rid"),
        explode(rTokens).as("__tok"))
      val idf = postings.groupBy("__tok").agg(count(lit(1)).as("__df"))
        .crossJoin(nDocs)
        .withColumn("__w",
          floor((log((col("__n") + 1) / (col("__df") + 1)) + 1) * 10000 * cl.boost)
            .cast("long"))
        .select("__tok", "__w")
      val qtok = left.select(col(leftId).as("__lid"),
        explode(array_distinct(col(cl.leftTokens))).as("__qtok"))
      val cand =
        if (cl.fuzziness <= 0)
          qtok.withColumn("__tok", col("__qtok")).join(postings, Seq("__tok"))
            .select("__lid", "__rid", "__tok")
        else {
          val qv = qtok.select(col("__lid"), col("__qtok"),
            explode(delVariants("__qtok")).as("__v"))
          val pv = postings.select(col("__rid"), col("__tok"),
            explode(delVariants("__tok")).as("__v"))
          qv.join(pv, Seq("__v"))
            .filter(levenshtein(col("__qtok"), col("__tok")) <= cl.fuzziness)
            .select("__lid", "__rid", "__tok").distinct()
        }
      cand.join(broadcast(idf), Seq("__tok"))
        .groupBy("__lid", "__rid")
        .agg(sum("__w").as("__cscore"))
        .withColumn("__clause", lit(idx))
    }

    val all = perClause.reduce(_ unionByName _)
    val nMust = spec.clauses.count(_.required)
    val mustIdx = spec.clauses.zipWithIndex.filter(_._1.required).map(_._2)
    val agg = all.groupBy("__lid", "__rid")
      .agg(sum("__cscore").as("hit_score"),
        collect_set("__clause").as("__satisfied"))
      .withColumn("__must_ok",
        if (mustIdx.isEmpty) lit(true)
        else mustIdx.map(i => array_contains(col("__satisfied"), i))
          .reduce(_ && _))
      .withColumn("__should_n",
        size(col("__satisfied")) -
          mustIdx.map(i => when(array_contains(col("__satisfied"), i), 1).otherwise(0))
            .foldLeft(lit(0))(_ + _))
      .filter(col("__must_ok") &&
        col("__should_n") >= math.min(spec.minimumShouldMatch,
          spec.clauses.length - nMust))

    val stats = Window.partitionBy(col("__lid"))
    val w = stats.orderBy(col("hit_score").desc, col("__rid"))
    val topk = agg
      .withColumn("matchid_hit_matches_unfiltered", count(lit(1)).over(stats))
      .withColumn("hit_max_score", max(col("hit_score")).over(stats))
      .withColumn("hit_rank", row_number().over(w))
      .filter(col("hit_rank") <= spec.k)

    val hitCols = right.columns.map(c => col(c).as(s"hit_$c"))
    val withHits = topk.join(right.select(hitCols.toSeq: _*),
      topk("__rid") === col(s"hit_$rightId"))
    left.join(withHits, left(leftId) === withHits("__lid"), "inner")
      .drop("__lid", "__rid", "__satisfied", "__must_ok", "__should_n")
  }
}

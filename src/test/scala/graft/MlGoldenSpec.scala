package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Regression pin for the ML re-score path (q34). The RF score values
  * are not SQL-expressible, so the driver's DuckDB oracle checks the
  * deterministic shell (feature assembly, label, score range). This
  * spec closes the remaining gap on the score values themselves:
  *  - the whole build+apply is bit-deterministic at a fixed seed, and
  *  - the scored sf0.001 output matches a pinned golden hash, so a
  *    silent change to the model pipeline (feature order, tree count,
  *    split seeds, rounding) fails CI even without a SQL oracle.
  */
class MlGoldenSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def scored(): (graft.ml.Scoring.BuiltModel, DataFrame) = {
    // the SAME code path as q34 (not a copy — a drift between the spec
    // and the query would silently un-cover q34)
    val (m, s) = SparkEntry.mlScored(spark, dir)
    (m, s.select("o_orderkey", "matchid_hit_score_ml"))
  }

  /** Order-independent content hash of (key, score) pairs. */
  private def hashOf(df: DataFrame): Long =
    df.select(xxhash64(col("o_orderkey"), col("matchid_hit_score_ml")).as("h"))
      .agg(expr("bit_xor(h)")).head.getLong(0)

  test("ML build+apply is bit-deterministic at fixed seed") {
    val (m1, s1) = scored()
    val (m2, s2) = scored()
    assert(m1.auc == m2.auc, s"AUC drifted across identical builds: ${m1.auc} vs ${m2.auc}")
    assert(hashOf(s1) == hashOf(s2), "scored output drifted across identical builds")
  }

  test("ML scored sf0.001 output matches the pinned golden hash") {
    val (m, s) = scored()
    info(s"AUC=${m.auc}")
    assert(!m.auc.isNaN && m.auc > 0.0 && m.auc <= 1.0, s"degenerate AUC ${m.auc}")
    val h = hashOf(s)
    assert(h == MlGoldenSpec.GoldenHash,
      s"scored output hash $h != pinned golden ${MlGoldenSpec.GoldenHash} — " +
        "if the model pipeline changed intentionally, re-pin after verifying scores by eye")
  }
}

object MlGoldenSpec {
  /** xxhash64-bit_xor of (o_orderkey, matchid_hit_score_ml) on sf0.001
    * at seed 42, tries=2, numTrees=10 — pinned 2026-08-12. */
  val GoldenHash = 6525555457934446455L
}

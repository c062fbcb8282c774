package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot keys at cluster scale.
  *
  * AQE's skew-join split handles most runtime skew; these are the
  * explicit, plan-level tools for the cases AQE can't fix:
  *  - a groupBy where one key holds a large share of all rows
  *    (two-phase salted aggregation), and
  *  - a join where specific hot keys overwhelm one task
  *    (salt-and-replicate join).
  */
object Skew {

  /** Two-phase salted aggregation: rows spread over `salts` sub-keys,
    * partial-aggregate per (key, salt), then merge per key. Use for
    * algebraic aggregates (sum/count/min/max) whose partials compose —
    * the second phase re-aggregates the partials with the SAME function
    * for sum/min/max and with sum for counts. */
  def saltedAgg(df: DataFrame, key: String, aggCol: String, fn: String,
      salts: Int = 16): DataFrame = {
    require(Set("sum", "count", "min", "max").contains(fn),
      s"saltedAgg supports algebraic aggregates, got $fn")
    val salted = df.withColumn("__salt", pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
    val partial = salted.groupBy(col(key), col("__salt"))
      .agg(expr(s"$fn(`$aggCol`)").as("__p"))
    val mergeFn = if (fn == "count") "sum" else fn
    partial.groupBy(col(key))
      .agg(expr(s"$mergeFn(__p)").as(s"${aggCol}_$fn"))
  }

  /** Salted join for known-hot keys: the probe side gets a random salt
    * in [0, salts); the build side replicates each hot-key row across
    * all salts (explode) so every salted probe partition finds its
    * match. Non-hot keys keep salt 0 on both sides — no replication
    * cost where none is needed.
    *
    * @param hotKeys values of `key` known (or measured) to be skewed
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      hotKeys: Seq[Any], salts: Int = 16, how: String = "inner"): DataFrame = {
    // right/full outer would emit every hot build row's NON-matching
    // salt replicas as spurious (null-probe, build) output rows — the
    // replication trick is only sound when unmatched build rows drop
    require(how == "inner" || how == "left" || how == "left_semi" || how == "left_anti",
      s"saltedJoin: build-side replication corrupts '$how' joins " +
        "(unmatched replicas would surface); use inner/left flavors")
    val hot = array(hotKeys.map(lit): _*)
    val p = probe.withColumn("__salt",
      when(array_contains(hot, col(key)),
        pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
        .otherwise(lit(0L)))
    val b = build.withColumn("__salts",
      when(array_contains(hot, col(key)),
        sequence(lit(0L), lit(salts.toLong - 1)))
        .otherwise(array(lit(0L))))
      .withColumn("__salt", explode(col("__salts")))
      .drop("__salts")
    p.join(b, Seq(key, "__salt"), how).drop("__salt")
  }
}

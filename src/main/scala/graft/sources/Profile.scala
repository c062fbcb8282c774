package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Per-column dataset profiling — the numbers behind a dataset
  * inspection view (the reference exposes dataset samples/metadata to
  * its UI, `code/recipes.py` dataset endpoints; a profile is the same
  * surface made aggregate): one output row per column with row count,
  * null count, distinct count, and numeric min/max.
  *
  * ONE aggregation pass however many columns: every statistic here is
  * partial-mergeable, so the plan is a map-side-combined global agg —
  * no per-column jobs, no driver loops. Distinct counts default to
  * `approx_count_distinct` (HLL++, mergeable sketches — the 100-TB
  * mode; ±2.3% default rsd). `exact = true` switches to true distinct
  * counts, which Spark plans via Expand — the input is replicated once
  * per distinct-aggregate into the exchange, i.e. rows × #columns
  * shuffle volume: the right tool at validation scale (it is what the
  * q92 driver row runs, DuckDB-exact), the wrong one at corpus scale. */
object Profile {

  def profile(df: DataFrame, exact: Boolean = false): DataFrame = {
    val fields = df.schema.fields
    require(fields.nonEmpty, "profile: dataframe has no columns")
    require(fields.forall(f => !f.name.contains("`") && !f.name.contains("'")),
      "profile: column names with quotes/backticks are not supported")
    val aggs = Seq(count(lit(1)).cast("long").as("__n")) ++ fields.flatMap { f =>
      val c = col(s"`${f.name}`")
      val nd = if (exact) count_distinct(c) else approx_count_distinct(c)
      val isNum = f.dataType.isInstanceOf[NumericType]
      Seq(
        count(c).cast("long").as(s"__nn_${f.name}"),
        nd.cast("long").as(s"__nd_${f.name}"),
        (if (isNum) min(c).cast("double") else lit(null).cast("double"))
          .as(s"__min_${f.name}"),
        (if (isNum) max(c).cast("double") else lit(null).cast("double"))
          .as(s"__max_${f.name}"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    // long format via stack — a row-local pivot of the single agg row
    val entries = fields.map { f =>
      s"'${f.name}', '${f.dataType.simpleString}', __n, " +
        s"__n - `__nn_${f.name}`, `__nd_${f.name}`, " +
        s"`__min_${f.name}`, `__max_${f.name}`"
    }.mkString(", ")
    row.selectExpr(s"stack(${fields.length}, $entries) as " +
      "(col_name, dtype, n_rows, n_nulls, n_distinct, min_num, max_num)")
  }
}

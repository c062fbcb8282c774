package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** `groupby` — agg / transform / rank, the reference's
  * internal_groupby (/root/reference/code/recipes.py:2087-2118).
  *
  * The reference aggregates PER CHUNK (a correctness wart, SURVEY.md §4);
  * we implement the intended GLOBAL semantics. groupBy gets map-side
  * partial aggregation from Spark for free; `transform`/`rank` are window
  * functions (one shuffle on the keys, reused across all window columns
  * over the same keys).
  */
object GroupByOp {

  /** `agg:` — group by keys, aggregate (col, fn) pairs. Output column name
    * is `col` for single-use (pandas keeps the column name), and `fn` may
    * be any Spark aggregate name; "list" maps to collect_list (the
    * reference's `union` helper, tools.py:71-72). */
  def agg(df: DataFrame, keys: Seq[String], aggs: Seq[(String, String)]): DataFrame = {
    require(aggs.nonEmpty, "groupby.agg needs at least one aggregation")
    val exprs = aggs.map {
      case (c, "list") => collect_list(col(c)).as(c)
      case (c, fn)     => expr(s"$fn(`$c`)").as(c)
    }
    df.groupBy(keys.map(col): _*).agg(exprs.head, exprs.tail: _*)
  }

  /** `transform:` — windowed aggregate broadcast back to every row as
    * `{col}_{fn}` (code/recipes.py:2096-2104). */
  def transformAgg(df: DataFrame, keys: Seq[String], aggs: Seq[(String, String)]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
    aggs.foldLeft(df) { case (d, (c, fn)) =>
      val e = fn match {
        case "list" => collect_list(col(c))
        case _      => expr(s"$fn(`$c`)")
      }
      d.withColumn(s"${c}_$fn", e.over(w))
    }
  }

  /** `rank:` — dense rank DESCENDING within group → `{col}_rank`
    * (code/recipes.py:2105-2108). */
  def rank(df: DataFrame, keys: Seq[String], cols: Seq[String]): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      val w = Window.partitionBy(keys.map(col): _*).orderBy(col(c).desc)
      d.withColumn(s"${c}_rank", dense_rank().over(w))
    }
}

package graft.engine

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.execution.QueryExecution

/** Run metrics — the reference re-parses row/error counts out of its log
  * file with regexes after every job (/root/reference/code/recipes.py:
  * 1566-1586). The Spark-native replacement is the `observe` API:
  * metric expressions ride the plan, aggregate on the executors during
  * the SAME pass as the real work (zero extra jobs), and arrive at a
  * listener when the action finishes.
  */
object Metrics {

  private val collected = TrieMap.empty[String, Map[String, Any]]
  // registration is PER SESSION (weakly held): a process-global flag
  // would leave every SparkSession after the first without the listener,
  // silently dropping its metrics
  private val registeredSessions =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  private lazy val listener = new QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (name, row) =>
        collected(name) = row.schema.fieldNames.zip(row.toSeq).toMap
      }
    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
  }

  def install(spark: SparkSession): Unit = synchronized {
    if (registeredSessions.add(spark))
      spark.listenerManager.register(listener)
  }

  /** Attach standard recipe metrics to a DataFrame: row count plus a
    * null count per named column (the "error count" analogue — coerced
    * cast failures surface as nulls in this engine). */
  def observed(df: DataFrame, name: String, errorCols: Seq[String] = Nil): DataFrame = {
    val nullCounts: Seq[Column] = errorCols.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"))
    df.observe(name, count(lit(1)).as("rows"), nullCounts: _*)
  }

  /** Metrics of a finished observed run (empty until its action ran). */
  def get(name: String): Option[Map[String, Any]] = collected.get(name)
  def clear(): Unit = collected.clear()
}

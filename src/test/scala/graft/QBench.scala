package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer for plan iteration (test scope — not part
  * of the shipped library). Usage:
  *   sbt "Test/runMain graft.QBench q29_match_topk 5 [sfDir]"
  * Prints one line per run plus the min; mirrors Bench's noop-sink
  * methodology so numbers are comparable. */
object QBench {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) sys.error(
      "usage: QBench <queryName> [runs] [sfDir] — e.g. QBench q29_match_topk 5")
    val name = args(0)
    require(SparkEntry.queries.contains(name),
      s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    val runs = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    // warm: code paths at the smallest SF
    try fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"[qbench] warm failed: ${e.getMessage}") }
    val samples = (1 to runs).map { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[qbench] $name run $i: $s%.3f s")
      s
    }
    println(f"[qbench] $name min: ${samples.min}%.3f s over $runs runs")
    spark.stop()
  }
}

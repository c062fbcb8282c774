package graft

import org.apache.spark.sql.SparkSession

/** Empirical scaling sweep (test scope): times each query at every
  * driver SF in ONE JVM so the numbers share a warmed session, then
  * prints per-SF minima — the input for SCALE.md's measured scaling
  * exponents. Methodology mirrors Bench: noop sink, min-of-N, cache
  * cleared between queries so nothing rides a previous run's persist.
  *
  *   sbt "Test/runMain graft.ScaleBench [runs] [query ...]"
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val runs = args.headOption.flatMap(_.toIntOption).getOrElse(3)
    val queries =
      if (args.drop(1).nonEmpty) args.drop(1).toSeq
      else Seq("q24_jaccard_pairs", "q26_minhash_pairs", "q29_match_topk",
        "q39_matching_e2e", "q53_decontaminate", "q72_substring_dedup")
    val sfs = Seq("sf0.001", "sf0.01", "sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val load = scala.util.Try(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg"))).trim).getOrElse("?")
    println(s"[scale] loadavg at start: $load")
    for (q <- queries) {
      val fn = SparkEntry.queries(q)
      // one warm pass compiles the plan + codegen off the clock
      fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      for (sf <- sfs) {
        val samples = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, s"/root/testdata/$sf").write.format("noop").mode("overwrite").save()
          spark.catalog.clearCache()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[scale] $q $sf min=${samples.min}%.3f " +
          s"samples=${samples.map(s => f"$s%.3f").mkString(",")}")
      }
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fitted scale slopes for the two newest heavy growers — q96 (e2e
  * curation chain) and q98 (bigram LM) had two informative driver
  * points each (sf0.001 is plan-floor-dominated), so their SCALE.md
  * slopes were directional, not fitted. This bench synthesizes
  * sf0.1-multiples of the documents table (the SubstrBench pattern:
  * self-generated input, invariant pinned off the clock) at 1×, 3×,
  * and 10× (= sf1-equivalent) and sweeps both queries in ONE warmed
  * JVM — three points, log-log fittable.
  *
  * Layout control: the driver's sf parquet is ONE small file → ONE
  * scan partition, and q98's narrow broadcast-join chain then runs a
  * single core end to end — a 10×-volume dir written as 32 files
  * measured FASTER than native sf0.1 (first run of this bench), which
  * is a parallelism artifact, not a volume slope. So every synthetic
  * point here is written with the SAME 32-file layout and the slope is
  * fitted across the equal-layout points only; native sf0.1 is printed
  * as a reference line (its delta vs sfeq1 IS the measured single-file
  * scan-parallelism penalty — zero at real scale, where inputs are
  * thousands of files).
  *
  * Synthesis: each sf0.1 doc explodes into `copy` copies
  * (doc_id·copies+copy) with ONE copy-marker token appended. Faithful
  * to the driver's own generator: the testdata vocabulary is FLAT
  * across SFs (31 distinct tokens at sf0.01 AND sf0.1 — measured), so
  * corpus growth means token VOLUME, not vocabulary, and replication
  * reproduces exactly that. The marker keeps copies distinct under
  * q96's fingerprint dedup (identical copies would collapse at stage
  * one and starve the rest of the chain); the id spread preserves the
  * even/odd LM split (q98) and the %3/%4/%5 PII + %20 test carves
  * (q96).
  *
  *   sbt "Test/runMain graft.E2eScaleBench [runs]"
  */
object E2eScaleBench {
  def main(args: Array[String]): Unit = {
    val runs = args.headOption.flatMap(_.toIntOption).getOrElse(3)
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
    println(s"[e2escale] loadavg at start: $load")

    val tmp = java.nio.file.Files.createTempDirectory("graft-sfeq")
    try {
      val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      val baseN = base.count()
      val copyCounts = Seq(1L, 3L, 10L)
      for (c <- copyCounts) {
        base.select(explode(sequence(lit(0L), lit(c - 1))).as("copy"),
            col("doc_id"), col("text"), col("lang"), col("source"),
            col("n_chars"))
          .select((col("doc_id") * c + col("copy")).as("doc_id"),
            concat(col("text"), lit(" c"), col("copy")).as("text"),
            col("lang"), col("source"), col("n_chars"))
          .repartition(32)
          .write.mode("overwrite").parquet(s"$tmp/x$c/documents.parquet")
        val n = spark.read.parquet(s"$tmp/x$c/documents.parquet").count()
        require(n == baseN * c, s"sfeq x$c synthesis: got $n rows")
      }

      val dirs = ("sf0.1" -> "/root/testdata/sf0.1") +:
        copyCounts.map(c => s"sfeq$c" -> s"$tmp/x$c")
      for (q <- Seq("q96_curation_e2e", "q98_bigram_lm")) {
        val fn = SparkEntry.queries(q)
        // warm pass: plan + codegen off the clock
        fn(spark, "/root/testdata/sf0.01")
          .write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        for ((tag, dir) <- dirs) {
          val samples = (1 to runs).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, dir).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
            (System.nanoTime() - t0) / 1e9
          }
          println(f"[e2escale] $q $tag%-7s min=${samples.min}%7.3f " +
            s"samples=${samples.map(s => f"$s%.3f").mkString(",")}")
        }
      }
    } finally {
      spark.stop()
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(tmp.toFile)
    }
  }
}

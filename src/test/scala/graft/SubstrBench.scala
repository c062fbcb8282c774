package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** ExactSubstr (q72) scaling + adversarial coverage bench — the r8
  * VERDICT asks (#4: a scaling row for the newest heavy operator; #5:
  * the coverage-explosion bound measured adversarially).
  *
  * Phase 1 — scaling: N docs × 30 tokens, tokens closed-form
  * xxhash64(doc, slot) over a 100k vocab (unique 10-grams), except
  * docs d with d%10 ∈ {0,1}, which are consecutive PAIRS (d div 2
  * equal) sharing a 15-token prefix: duplicated volume grows ∝ N while
  * every duplicated gram occurs exactly twice — the production shape
  * (boilerplate shared by a few docs each). sum(n_removed) must equal
  * 15 · 0.2N exactly (the planted spans, end to end), which pins
  * correctness inside the bench.
  *
  * Phase 2 — adversarial hot gram: N fixed, ONE 10-token boilerplate
  * span planted verbatim in k docs, k up to 1e5. The design claim
  * under test (TextAnalysis.scala coverage note): a gram repeated k
  * times costs k·n coverage rows — LINEAR in k, never k² pairs — and
  * the per-(doc,pos) distinct collapses overlap double-counting.
  * sum(n_removed) must equal 10·k; wall time growing ∝ k (not k²)
  * is the pass criterion. Results recorded in SCALE.md.
  *
  *   sbt "Test/runMain graft.SubstrBench [runs]"
  */
object SubstrBench {
  private val T = 30     // tokens per doc
  private val V = 100000 // vocabulary

  def main(args: Array[String]): Unit = {
    val runs = args.headOption.flatMap(_.toIntOption).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val load = scala.util.Try(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg"))).trim).getOrElse("?")
    println(s"[substr] loadavg at start: $load")

    val tmp = java.nio.file.Files.createTempDirectory("graft-substr")
    try {
      def bench(tag: String, path: String, expectRemoved: Long): Unit = {
        val docs = spark.read.parquet(path)
        def result(): DataFrame =
          TextAnalysis.exactSubstrDedup(docs, "doc_id", "text", n = 10)
        // correctness pinned off the clock: exactly the planted spans cut
        val removed = result().agg(sum("n_removed")).head.getLong(0)
        require(removed == expectRemoved,
          s"$tag: expected $expectRemoved removed tokens, got $removed")
        val samples = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          result().write.format("noop").mode("overwrite").save()
          spark.catalog.clearCache()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[substr] $tag%-22s min=${samples.min}%7.3f " +
          f"removed=$removed%10d " +
          s"samples=${samples.map(s => f"$s%.3f").mkString(",")}")
      }

      // The token RIGHT AFTER a planted span is 'u'||doc_id — unique by
      // construction, not hash-drawn. With a vocab draw there, two span
      // carriers collide on it with P≈1/V and the boundary gram
      // (span suffix + that token) becomes genuinely duplicated,
      // covering one extra position — the operator is CORRECT to cut it
      // (measured: 5 such pairs at k=1000), but the exact-count require
      // would be probabilistic. Uniqueness makes every boundary gram
      // unique and the expected counts exact.

      // ---- phase 1: corpus scaling, pairwise-duplicated spans
      for (n <- Seq(30000L, 100000L, 300000L)) {
        val path = s"$tmp/scale$n"
        spark.range(n).toDF("doc_id")
          .withColumn("text", expr(
            s"""array_join(transform(sequence(0, ${T - 1}), j ->
               |  CASE WHEN doc_id % 10 < 2 AND j < 15
               |       THEN concat('p', pmod(xxhash64(doc_id div 2, j), $V))
               |       WHEN j = 15 THEN concat('u', doc_id)
               |       ELSE concat('w', pmod(xxhash64(doc_id, j), $V)) END),
               |  ' ')""".stripMargin))
          .write.mode("overwrite").parquet(path)
        // every planted pair loses its 15-token span on BOTH sides
        bench(s"scale n=$n", path, expectRemoved = 15L * (n / 10 * 2))
      }

      // ---- phase 2: one boilerplate gram in k docs (hot-key stress)
      val nFixed = 100000L
      for (k <- Seq(1000L, 10000L, 100000L)) {
        val path = s"$tmp/hot$k"
        spark.range(nFixed).toDF("doc_id")
          .withColumn("text", expr(
            s"""array_join(transform(sequence(0, ${T - 1}), j ->
               |  CASE WHEN doc_id < $k AND j < 10 THEN concat('b', j)
               |       WHEN j = 10 THEN concat('u', doc_id)
               |       ELSE concat('w', pmod(xxhash64(doc_id, j), $V)) END),
               |  ' ')""".stripMargin))
          .write.mode("overwrite").parquet(path)
        bench(s"hot k=$k", path, expectRemoved = 10L * k)
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

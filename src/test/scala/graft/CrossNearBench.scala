package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Measures the cross-source NEAR-dup overlap matrix (q123) against
  * its scale claims: the corpus-signing pass (shingle + minhash — the
  * IncNearBench-established scaling term of the whole family) is the
  * linear cost, the candidate exchange is duplication-bounded, and the
  * matrix itself is sources²-bounded. OverlapBench methodology:
  * shuffle bytes are the 1000-executor number, wall on local[32]
  * secondary.
  *
  * Corpus: n docs over s hash-spread sources; every 50th doc is a
  * planted near-dup — PAIRS of identical 12-word texts (ids 100k and
  * 100k+50 share key k = id/100), each pair's words derived from the
  * key so DIFFERENT pairs share nothing. That keeps the planted dup
  * mass linear (n/100 cross-source pairs) with CONSTANT group size.
  *
  * Two fixture traps this bench itself hit, kept as documentation:
  * (1) a key spelled `id % 1000` over ids divisible by 50 only
  * reaches 20 residues — 20 mega-groups of n/1000 docs, quadratic
  * pair volume; (2) templates sharing a common English phrase
  * ("shared press release template …" + a number) are near-dups OF
  * EACH OTHER across keys (7 of 8 shingles shared → Jaccard ≈ 0.78 ≥
  * the 0.6 threshold), which fuses ALL n/50 template docs into ONE
  * true mega-group — measured 19.5 GB shuffle / 413 s at 1M docs,
  * stage-profiled to 31.7M candidate rows at 300k. Both are the
  * operator's DOCUMENTED quadratic-in-group-size regime doing its
  * job on a degenerate plant (the scaladoc's exact-dedup-first
  * advice exists for real corpora shaped like that); the bench's
  * purpose is the LINEAR term, so the fixture keeps groups at 2.
  *
  *   sbt "Test/runMain graft.CrossNearBench [runs] [docN ...]"
  */
object CrossNearBench {
  private def corpus(spark: SparkSession, n: Long, s: Int): DataFrame =
    spark.range(n).toDF("id")
      .withColumn("source",
        concat(lit("src"), pmod(xxhash64(col("id")), lit(s)).cast("string")))
      .withColumn("text", when(col("id") % 50 === 0,
          expr("array_join(transform(sequence(0, 11), " +
            "j -> concat('t', xxhash64(CAST(id DIV 100 AS LONG), j))), ' ')"))
        .otherwise(expr(
          "array_join(transform(sequence(0, 11), j -> concat('w', xxhash64(id, j))), ' ')")))

  def main(args: Array[String]): Unit = {
    val runs = args.headOption.flatMap(_.toIntOption).getOrElse(2)
    val scales =
      if (args.drop(1).nonEmpty) args.drop(1).toSeq.map(_.toLong)
      else Seq(100000L, 300000L, 1000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"[crossnear] loadavg at start: " + scala.util.Try(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).trim).getOrElse("?"))

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        shuffleBytes.addAndGet(
          sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
    })

    val tmp = java.nio.file.Files.createTempDirectory("graft-crossnear")
    try {
      for (n <- scales) {
        val path = s"$tmp/docs$n"
        corpus(spark, n, 32).write.parquet(path)
        val d = spark.read.parquet(path)
        val samples = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          val rows = Dedup.crossSourceNearDupOverlap(
            d, "id", "text", "source").count()
          spark.catalog.clearCache()
          ((System.nanoTime() - t0) / 1e9, rows)
        }
        Thread.sleep(500)
        shuffleBytes.set(0)
        val marker = Dedup.crossSourceNearDupOverlap(
          d, "id", "text", "source").count()
        spark.catalog.clearCache()
        Thread.sleep(500)
        val mb = shuffleBytes.get() / 1024.0 / 1024.0
        println(f"[crossnear] n=$n%-9d s=32 min=${samples.map(_._1).min}%7.3f " +
          f"shuffleMB=$mb%8.1f matrixRows=$marker " +
          s"samples=${samples.map(x => f"${x._1}%.3f").mkString(",")}")
      }
      // the EXACT mega-group regime the per-(source, shingle-set)
      // collapse exists for: ONE boilerplate page replicated in every
      // 50th doc of a 1M corpus (20k exact copies over 32 sources).
      // Uncollapsed this is 20k²/2 candidate pairs; collapsed it is 32
      // reps → ≤ 496, so the line should cost the SIGNING of 1M docs
      // and nothing pair-shaped.
      val n = 1000000L
      val megaPath = s"$tmp/mega$n"
      spark.range(n).toDF("id")
        .withColumn("source",
          concat(lit("src"), pmod(xxhash64(col("id")), lit(32)).cast("string")))
        .withColumn("text", when(col("id") % 50 === 0,
            lit("one replicated boilerplate page body appearing verbatim " +
              "in every crawl snapshot"))
          .otherwise(expr(
            "array_join(transform(sequence(0, 11), j -> concat('w', xxhash64(id, j))), ' ')")))
        .write.parquet(megaPath)
      val mega = spark.read.parquet(megaPath)
      Thread.sleep(500)
      shuffleBytes.set(0)
      val t0 = System.nanoTime()
      val mRows = Dedup.crossSourceNearDupOverlap(
        mega, "id", "text", "source").count()
      val mWall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"[crossnear] MEGA n=$n (20k exact copies, 32 sources) " +
        f"wall=$mWall%7.3f shuffleMB=${shuffleBytes.get() / 1048576.0}%8.1f " +
        f"matrixRows=$mRows")

      // ---- cross-source CONTAINMENT (q128) slopes: same methodology.
      // Planted quotations with CONSTANT pair size (the fixture-trap
      // lesson above): ids k ≡ 0 (mod 100) are a 8-word quote derived
      // from key k/100; ids k ≡ 50 are a 20-word page whose first 8
      // words ARE that quote — containment 10⁴ bp, Jaccard ≈ 6/18 ≈
      // 0.33 (a near-dup sweep would not see them). Clean docs' grams
      // are id-unique, so candidate volume is plant-bounded and the
      // linear term is the shingle+prefix+postings signing.
      def quoteCorpus(n2: Long): DataFrame =
        spark.range(n2).toDF("id")
          .withColumn("source",
            concat(lit("src"), pmod(xxhash64(col("id")), lit(32)).cast("string")))
          .withColumn("text",
            when(col("id") % 100 === 0,
              expr("array_join(transform(sequence(0, 7), " +
                "j -> concat('q', xxhash64(CAST(id DIV 100 AS LONG), j))), ' ')"))
            .when(col("id") % 100 === 50,
              expr("array_join(transform(sequence(0, 19), j -> CASE " +
                "WHEN j < 8 THEN concat('q', xxhash64(CAST(id DIV 100 AS LONG), j)) " +
                "ELSE concat('p', xxhash64(id, j)) END), ' ')"))
            .otherwise(expr(
              "array_join(transform(sequence(0, 11), j -> concat('w', xxhash64(id, j))), ' ')")))
      for (n2 <- scales) {
        val path = s"$tmp/quote$n2"
        quoteCorpus(n2).write.parquet(path)
        val d = spark.read.parquet(path)
        val samples = (1 to runs).map { _ =>
          val t0c = System.nanoTime()
          val rows = Dedup.crossSourceContainmentOverlap(
            d, "id", "text", "source", thresholdBp = 8000L).count()
          spark.catalog.clearCache()
          ((System.nanoTime() - t0c) / 1e9, rows)
        }
        Thread.sleep(500)
        shuffleBytes.set(0)
        val marker = Dedup.crossSourceContainmentOverlap(
          d, "id", "text", "source", thresholdBp = 8000L).count()
        spark.catalog.clearCache()
        Thread.sleep(500)
        val mb = shuffleBytes.get() / 1024.0 / 1024.0
        println(f"[crosscontain] n=$n2%-9d s=32 min=${samples.map(_._1).min}%7.3f " +
          f"shuffleMB=$mb%8.1f matrixRows=$marker " +
          s"samples=${samples.map(x => f"${x._1}%.3f").mkString(",")}")
      }
      // the containment MEGA regime: one quote replicated in every
      // 100th doc AND one page quoting it in every (100th + 50) doc —
      // 10k + 10k exact copies collapse to ≤ 32 + 32 reps, so the
      // pair volume is sources²-bounded however many copies exist
      val megaQ = s"$tmp/megaq"
      spark.range(n).toDF("id")
        .withColumn("source",
          concat(lit("src"), pmod(xxhash64(col("id")), lit(32)).cast("string")))
        .withColumn("text",
          when(col("id") % 100 === 0,
            lit("one widely quoted short passage appearing verbatim everywhere"))
          .when(col("id") % 100 === 50,
            lit("long framing page that reproduces one widely quoted short " +
              "passage appearing verbatim everywhere and then continues " +
              "with much further commentary prose"))
          .otherwise(expr(
            "array_join(transform(sequence(0, 11), j -> concat('w', xxhash64(id, j))), ' ')")))
        .write.parquet(megaQ)
      val megaQd = spark.read.parquet(megaQ)
      Thread.sleep(500)
      shuffleBytes.set(0)
      val t0q = System.nanoTime()
      val qRows = Dedup.crossSourceContainmentOverlap(
        megaQd, "id", "text", "source", thresholdBp = 8000L).count()
      val qWall = (System.nanoTime() - t0q) / 1e9
      Thread.sleep(500)
      println(f"[crosscontain] MEGA n=$n (10k quote + 10k page copies, " +
        f"32 sources) wall=$qWall%7.3f " +
        f"shuffleMB=${shuffleBytes.get() / 1048576.0}%8.1f matrixRows=$qRows")
    } finally {
      spark.stop()
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(tmp.toFile)
    }
  }
}

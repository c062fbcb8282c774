package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Measures incremental NEAR-dup dedup's two physical strategies doing
  * their production job — IncDedupBench's sibling for the
  * shingle-Jaccard operator (q105), same methodology: shuffle bytes
  * are the 1000-executor number, wall on local[32] is secondary.
  *
  * The shape: a FIXED daily batch against a growing corpus. The plain
  * path ships one narrow (band, bucket, id) row per corpus doc per band
  * into the candidate exchange (the shingle arrays stay out of it) plus
  * a count-gated second corpus pass for colliding docs' shingles — so
  * its exchange grows linearly with the corpus. The `bloomFpp` path
  * broadcasts the BATCH's band buckets as bits and drops clean corpus
  * band rows MAP-SIDE with their shingles, scanning the corpus once —
  * its exchange is ~collisions + fpp·(corpus band rows).
  *
  * Corpus: unique 8-token docs (closed-form xxhash64 text, no UDF).
  * Batch: 10k docs, every 100th a planted copy of a corpus doc — the
  * only Jaccard-≥-threshold pairs by construction (distinct closed-form
  * texts share no 3-shingle). Both paths must flag exactly the planted
  * rows.
  *
  *   sbt "Test/runMain graft.IncNearBench [runs] [corpusN ...]"
  */
object IncNearBench {
  private val T = 8
  private val B = 10000L // batch size, fixed across corpus scales

  private def withText(df: DataFrame): DataFrame =
    df.withColumn("text", expr(
      s"""array_join(transform(sequence(0, ${T - 1}),
         |  j -> concat('w', xxhash64(id, j))), ' ')""".stripMargin))

  def main(args: Array[String]): Unit = {
    val runs = args.headOption.flatMap(_.toIntOption).getOrElse(2)
    val scales =
      if (args.drop(1).nonEmpty) args.drop(1).toSeq.map(_.toLong)
      else Seq(300000L, 1000000L, 3000000L)
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
    println(s"[incnear] loadavg at start: $load")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        shuffleBytes.addAndGet(
          sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
    })

    val tmp = java.nio.file.Files.createTempDirectory("graft-incnear")
    tmp.toFile.deleteOnExit()
    try {
      for (n <- scales) {
        val corpusPath = s"$tmp/corpus$n"
        withText(spark.range(n).toDF("id")).toDF("doc_id", "text")
          .write.parquet(corpusPath)
        val corpus = spark.read.parquet(corpusPath)
        val batchPath = s"$tmp/batch$n"
        withText(spark.range(B).toDF("raw")
            .withColumn("id", when(col("raw") % 100 === 0,
                pmod(col("raw") * 37, lit(n)))
              .otherwise(-col("raw") - 1)))
          .select(col("raw").as("doc_id"), col("text"))
          .write.parquet(batchPath)
        val batch = spark.read.parquet(batchPath)
        val planted = (B + 99) / 100

        def measure(mode: String, result: () => DataFrame): Unit = {
          val flagged = result().filter(!col("kept")).count() // off the clock
          val samples = (1 to runs).map { _ =>
            val t0 = System.nanoTime()
            result().write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
            (System.nanoTime() - t0) / 1e9
          }
          Thread.sleep(2000)
          shuffleBytes.set(0)
          result().write.format("noop").mode("overwrite").save()
          spark.catalog.clearCache()
          Thread.sleep(2000)
          val mb = shuffleBytes.get() / 1024.0 / 1024.0
          println(f"[incnear] n=$n%-9d mode=$mode%-5s " +
            f"min=${samples.min}%7.3f shuffleMB=$mb%8.1f " +
            f"flagged=$flagged (planted=$planted) " +
            s"samples=${samples.map(s => f"$s%.3f").mkString(",")}")
        }
        for (fpp <- Seq(None, Some(0.01)))
          measure(if (fpp.isEmpty) "plain" else "bloom",
            () => Dedup.incrementalNearDups(
              batch, corpus, "doc_id", "text", bloomFpp = fpp))
        // the production regime: corpus signed ONCE into the band index
        // (off the clock — it amortizes over every future batch), probes
        // read pre-computed tables. This line substantiates the
        // per-batch-cost-independent-of-corpus claim in SCALE.md.
        val idxPath = s"$tmp/idx$n"
        val tb0 = System.nanoTime()
        Dedup.writeNearDupIndex(corpus, "doc_id", "text", idxPath)
        println(f"[incnear] n=$n%-9d index build (one-time) " +
          f"${(System.nanoTime() - tb0) / 1e9}%.3f s")
        measure("index", () => Dedup.incrementalNearDupsIndexed(
          batch, idxPath, "doc_id", "text"))
      }
    } finally {
      spark.stop()
      // best-effort scratch cleanup (deleteOnExit misses non-empty dirs)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(tmp.toFile)
    }
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Measures incremental dedup's Bloom prefilter doing its production
  * job: making the corpus-side contribution to the anti-join exchange
  * INDEPENDENT of corpus size.
  *
  * The shape: a fixed-size daily batch against a growing corpus —
  * exactly the regime `incrementalDedup` exists for. Without the
  * prefilter every corpus CONTENT KEY (md5, 32 chars + row overhead)
  * must cross the anti-join exchange, because Spark cannot broadcast
  * the LEFT side of a left-anti join and the right (corpus) side is
  * past any broadcast threshold — so the exchange grows linearly with
  * the corpus. With `bloomFpp` the batch's keys (the SMALL side by
  * definition) become broadcast bits and clean corpus keys drop
  * map-side; what remains is ~|batch ∩ corpus| + fpp·|corpus| rows.
  * Wall time on local[32] can't see the difference (a shuffle is a
  * memcpy here); shuffle bytes are the 1000-executor number, same
  * methodology as DecontamBench.
  *
  * Corpus: unique 8-token docs (closed-form xxhash64 text, no UDF).
  * Batch: 10k docs, every 100th a planted copy of a corpus doc; both
  * paths must keep exactly batch − planted − withinBatchDups rows.
  *
  *   sbt "Test/runMain graft.IncDedupBench [runs] [corpusN ...]"
  */
object IncDedupBench {
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
      else Seq(1000000L, 3000000L, 10000000L)
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
    println(s"[incdedup] loadavg at start: $load")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        shuffleBytes.addAndGet(
          sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
    })

    val tmp = java.nio.file.Files.createTempDirectory("graft-incdedup")
    tmp.toFile.deleteOnExit()
    try {
      // batch ids are negative so their generated texts are disjoint
      // from the corpus stream except where planted; every 100th batch
      // row copies corpus doc (raw*37 mod n) — `div`/integer arithmetic
      // throughout (xxhash64(double) would silently diverge)
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

        for (fpp <- Seq(None, Some(0.01))) {
          def result(): DataFrame = Dedup.incrementalDedup(
            batch, corpus, "doc_id", "text", bloomFpp = fpp)
          val kept = result().count() // off the clock; both paths equal
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
          println(f"[incdedup] n=$n%-9d fpp=${fpp.getOrElse(0.0)}%5.2f " +
            f"min=${samples.min}%7.3f shuffleMB=$mb%8.1f " +
            f"kept=$kept (dropped=${B - kept}, planted=$planted) " +
            s"samples=${samples.map(s => f"$s%.3f").mkString(",")}")
        }
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

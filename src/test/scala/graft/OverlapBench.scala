package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Measures the cross-source overlap matrix (q106) against its two
  * declared scale claims: the key-table exchange tracks CORPUS size,
  * and the pair fan-out tracks shared-keys × sources² — the
  * declared-few-sources contract. IncDedupBench methodology: shuffle
  * bytes are the 1000-executor number.
  *
  * Corpus: n docs over s sources (source = id mod s); every 100th doc
  * carries one of 1000 shared template keys (so ~n/100 rows spread
  * 1000 hot keys across many sources), the rest unique closed-form
  * texts. Two sweeps: n at fixed s, s at fixed n.
  *
  *   sbt "Test/runMain graft.OverlapBench [runs]"
  */
object OverlapBench {
  private def corpus(spark: SparkSession, n: Long, s: Int): DataFrame =
    spark.range(n).toDF("id")
      // hash-spread sources so each shared key genuinely lands in many
      // sources (a modular assignment correlates with the key residue
      // and collapses the pair fan-out this bench exists to measure)
      .withColumn("source",
        concat(lit("src"), pmod(xxhash64(col("id")), lit(s)).cast("string")))
      .withColumn("text", when(col("id") % 100 === 0,
          concat(lit("shared key "), (col("id") % 1000).cast("string")))
        .otherwise(expr(
          "array_join(transform(sequence(0, 7), j -> concat('w', xxhash64(id, j))), ' ')")))

  def main(args: Array[String]): Unit = {
    val runs = args.headOption.flatMap(_.toIntOption).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"[overlap] loadavg at start: " + scala.util.Try(
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

    val tmp = java.nio.file.Files.createTempDirectory("graft-overlap")
    tmp.toFile.deleteOnExit()
    try {
      val grid = Seq((300000L, 32), (1000000L, 32), (3000000L, 32),
        (1000000L, 8), (1000000L, 128))
      for ((n, s) <- grid) {
        val path = s"$tmp/c$n-$s"
        corpus(spark, n, s).write.mode("overwrite").parquet(path)
        val df = spark.read.parquet(path)
        def result(): DataFrame = Dedup.sourceOverlap(df, "source", "text")
        val pairs = result().count() // off the clock
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
        println(f"[overlap] n=$n%-9d s=$s%-4d min=${samples.min}%7.3f " +
          f"shuffleMB=$mb%8.1f pairRows=$pairs " +
          s"samples=${samples.map(x => f"$x%.3f").mkString(",")}")
      }
    } finally {
      spark.stop()
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(tmp.toFile)
    }
  }
}

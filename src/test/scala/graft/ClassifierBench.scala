package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.LinearClassifier

/** Measures the linear classifier doing its production job at growing
  * corpus sizes — the IncNearBench methodology: shuffle bytes are the
  * 1000-executor number, wall on local[32] secondary.
  *
  * Fit (DISTRIBUTED regime forced, localThreshold = 0): per epoch the
  * cached triples frame is scanned twice (margin agg keyed by doc id,
  * update agg keyed by feature) and a ≤-buckets-row batch collects —
  * so fit shuffle should grow linearly with docs and the collect stay
  * constant. Score: one broadcast weight join + one doc-id exchange —
  * linear, no iteration.
  *
  * Corpus: closed-form docs of 12 hashed tokens (large vocabulary —
  * every bucket live) + 2 planted class-marker tokens by id parity,
  * labels flipped for id % 17 (the q110 fixture at scale) so every
  * epoch's misclassified batch is non-empty.
  *
  *   sbt "Test/runMain graft.ClassifierBench [runs] [docN ...]"
  */
object ClassifierBench {
  private def docs(spark: SparkSession, n: Long): DataFrame = {
    spark.range(n).toDF("id")
      .withColumn("text", expr(
        """concat(
          |  array_join(transform(sequence(0, 11),
          |    j -> concat('w', pmod(xxhash64(id, j), 50000))), ' '),
          |  CASE WHEN id % 2 = 0 THEN ' crisp curated prose'
          |       ELSE ' noisy boiler plate' END)""".stripMargin))
      .withColumn("y", expr(
        "CASE WHEN (id % 17 = 0) = (id % 2 = 0) THEN -1L ELSE 1L END"))
  }

  def main(args: Array[String]): Unit = {
    val runs = args.headOption.flatMap(_.toIntOption).getOrElse(2)
    val scales =
      if (args.drop(1).nonEmpty) args.drop(1).toSeq.map(_.toLong)
      else Seq(100000L, 300000L, 1000000L)
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
    println(s"[classifier] loadavg at start: $load")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        shuffleBytes.addAndGet(
          sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
    })

    val tmp = java.nio.file.Files.createTempDirectory("graft-clsbench")
    try {
      for (n <- scales) {
        val path = s"$tmp/docs$n"
        docs(spark, n).write.parquet(path)
        val d = spark.read.parquet(path)

        def measure(mode: String, run: () => Long): Unit = {
          val samples = (1 to runs).map { _ =>
            val t0 = System.nanoTime()
            run()
            spark.catalog.clearCache()
            (System.nanoTime() - t0) / 1e9
          }
          Thread.sleep(1000)
          shuffleBytes.set(0)
          val marker = run()
          spark.catalog.clearCache()
          Thread.sleep(1000)
          val mb = shuffleBytes.get() / 1024.0 / 1024.0
          println(f"[classifier] n=$n%-9d mode=$mode%-6s " +
            f"min=${samples.min}%7.3f shuffleMB=$mb%8.1f rows=$marker " +
            s"samples=${samples.map(s => f"$s%.3f").mkString(",")}")
        }

        measure("fit", () =>
          LinearClassifier.trainTextClassifier(d, "id", "text", "y",
            buckets = 4096, epochs = 3, binary = true,
            localThreshold = 0L).count())
        // score under a fixed pre-built weight table (built off the
        // clock and PERSISTED — clearCache() between samples must not
        // silently re-trigger the fit)
        val wPath = s"$tmp/w$n"
        LinearClassifier.trainTextClassifier(d, "id", "text", "y",
          buckets = 4096, epochs = 3, binary = true, localThreshold = 0L)
          .write.parquet(wPath)
        val w = spark.read.parquet(wPath)
        measure("score", () =>
          LinearClassifier.scoreTextClassifier(d, "id", "text", w,
            buckets = 4096, binary = true)
            .filter(col("pred") === 1).count())
        // 4-class one-vs-one over the same corpus (6 pairwise fits,
        // triples featurized+cached ONCE): the multiclass overhead
        // claim — ~pairs x the binary per-pair cost, never pairs x
        // featurization
        val d4 = spark.read.parquet(path)
          .withColumn("text", expr(
            """concat(text, CASE pmod(id, 4)
              |  WHEN 0 THEN ' crisp curated prose'
              |  WHEN 1 THEN ' noisy boiler plate'
              |  WHEN 2 THEN ' mediocre average filler'
              |  ELSE ' dense legal contract' END)""".stripMargin))
          .withColumn("lb", expr(
            "CASE pmod(id + CASE WHEN id % 17 = 0 THEN 1 ELSE 0 END, 4) " +
              "WHEN 0 THEN 'prose' WHEN 1 THEN 'spam' " +
              "WHEN 2 THEN 'filler' ELSE 'legal' END"))
        measure("multi4", () =>
          LinearClassifier.trainTextClassifierMulti(d4, "id", "text", "lb",
            buckets = 4096, epochs = 3, binary = true,
            localThreshold = 0L).count())
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

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Measures containment-pair detection at growing corpus sizes — the
  * claim under test: with the min-side prefix bound, candidate volume
  * (and so wall/shuffle) tracks GRAM VOLUME plus true-pair volume, not
  * block² (the naive all-pairs within a block).
  *
  * Corpus: unique closed-form 10-token docs across 8 blocks (block =
  * the id-group's hash, so a planted pair always co-blocks) + ONE
  * planted template/prefix pair per 1000 docs whose tokens derive from
  * the GROUP id — every planted pair is textually unique, so true
  * pairs grow linearly with n (identical templates would pair
  * quadratically across groups and drown the slope). The planted rows
  * are the only ≥-threshold pairs by construction. Both the pair count
  * and the wall/shuffle slopes are reported per scale.
  *
  *   sbt "Test/runMain graft.ContainBench [runs] [docN ...]"
  */
object ContainBench {
  private def docs(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).toDF("id")
      .withColumn("block", expr("cast(pmod(xxhash64(id div 1000, 7), 8) as string)"))
      .withColumn("text", expr(
        """CASE
          |  WHEN id % 1000 = 0 THEN array_join(transform(sequence(0, 11),
          |    j -> concat('t', xxhash64(id div 1000, j))), ' ')
          |  WHEN id % 1000 = 1 THEN array_join(transform(sequence(0, 5),
          |    j -> concat('t', xxhash64(id div 1000, j))), ' ')
          |  ELSE array_join(transform(sequence(0, 9),
          |    j -> concat('w', xxhash64(id, j))), ' ')
          |END""".stripMargin))

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
    println(s"[contain] loadavg at start: $load")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        shuffleBytes.addAndGet(
          sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
    })

    val tmp = java.nio.file.Files.createTempDirectory("graft-contain")
    try {
      for (n <- scales) {
        val path = s"$tmp/docs$n"
        docs(spark, n).write.parquet(path)
        val d = spark.read.parquet(path)
        val samples = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          val pairs = Dedup.containmentPairs(d, "id", "text", "block",
            n = 3, thresholdBp = 9000L).count()
          ((System.nanoTime() - t0) / 1e9, pairs)
        }
        Thread.sleep(1000)
        shuffleBytes.set(0)
        Dedup.containmentPairs(d, "id", "text", "block",
          n = 3, thresholdBp = 9000L).count()
        Thread.sleep(1000)
        val mb = shuffleBytes.get() / 1024.0 / 1024.0
        println(f"[contain] n=$n%-9d min=${samples.map(_._1).min}%7.3f " +
          f"shuffleMB=$mb%8.1f pairs=${samples.head._2} " +
          s"samples=${samples.map(s => f"${s._1}%.3f").mkString(",")}")
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

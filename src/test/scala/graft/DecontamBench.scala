package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Measures the decontamination Bloom prefilter doing its production
  * job: keeping the CORPUS side of the 13-gram semi-join map-side when
  * the benchmark suite's gram set is too big to broadcast.
  *
  * The regime matters. With a SMALL test set (the driver's q53 shape)
  * the plain plan already broadcasts the test grams, the semi-join is
  * map-side, and a Bloom filter adds nothing but its build cost — so
  * this harness generates the 100-TB-relevant shape instead: a test
  * suite whose distinct gram hashes (8 B each, plus hash-relation
  * overhead) exceed spark.sql.autoBroadcastJoinThreshold (10 MB
  * default), which flips the plain plan to a SHUFFLE of every corpus
  * gram. The Bloom bits for the same gram set are ~1.2 MB per million
  * grams at 1% fpp — they stay broadcastable ~an order of magnitude
  * longer, and corpus grams that miss them are dropped before any
  * exchange. No config is touched to force this: the test set is
  * simply big enough, as real multi-benchmark suites are.
  *
  * Corpus: N docs × 30 tokens drawn per-(doc, slot) from a 100k vocab
  * (closed-form xxhash64, no UDF) — 13-grams are effectively unique per
  * doc, so cross-doc gram collisions are ~only the planted ones. Every
  * 1000th corpus doc carries a test doc's exact text (guaranteed
  * contamination); both paths must flag exactly those.
  *
  * Prints per-config: min wall time, corpus grams surviving the Bloom
  * (the would-be shuffle volume), and the dropped-row counts, which
  * must match between paths. Results recorded in SCALE.md.
  *
  *   sbt "Test/runMain graft.DecontamBench [runs]"
  */
object DecontamBench {
  private val T = 30      // tokens per doc
  private val V = 100000  // vocabulary
  private val NTest = 300000L // test docs → ~5.4M distinct 13-grams

  private def withText(df: DataFrame): DataFrame =
    df.withColumn("text", expr(
      s"""array_join(transform(sequence(0, ${T - 1}),
         |  j -> concat('w', pmod(xxhash64(id, j), $V))), ' ')""".stripMargin))

  /**   sbt "Test/runMain graft.DecontamBench [runs] [corpusN ...]" */
  def main(args: Array[String]): Unit = {
    val runs = args.headOption.flatMap(_.toIntOption).getOrElse(2)
    // three points (round 9; was two) so the shuffle-bytes growth is a
    // fitted slope, not a single ratio
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
    println(s"[decontam] loadavg at start: $load")

    // shuffle bytes written per config — on local[32] a shuffle is a
    // memcpy and wall time can't see it, but at 1000 executors shuffle
    // bytes ARE the scarce resource; this is the number the prefilter
    // exists to shrink
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        shuffleBytes.addAndGet(
          sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
    })

    val tmp = java.nio.file.Files.createTempDirectory("graft-decontam")
    tmp.toFile.deleteOnExit()
    try {
      // test suite: ids −1 … −NTest (disjoint token stream from the
      // corpus since tokens hash (id, slot))
      val testPath = s"$tmp/test"
      withText(spark.range(1, NTest + 1).select((-col("id")).as("id")))
        .write.parquet(testPath)
      val test = spark.read.parquet(testPath)

      for (n <- scales) {
        val path = s"$tmp/docs$n"
        // every 1000th doc is a planted copy of test doc −(k mod NTest + 1);
        // `div` (integer division) matters: `/` promotes to DOUBLE and
        // xxhash64(double) ≠ xxhash64(long) — the planted texts would
        // silently diverge from the test set's
        withText(spark.range(n).toDF("raw_id")
            .withColumn("id", when(col("raw_id") % 1000 === 0,
                -pmod(expr("raw_id div 1000"), lit(NTest)) - 1)
              .otherwise(col("raw_id"))))
          .select(col("raw_id").as("doc_id"), col("text"))
          .write.parquet(path)
        val corpus = spark.read.parquet(path)
        val planted = (n + 999) / 1000

        for (fpp <- Seq(None, Some(0.01))) {
          def result(): DataFrame = TextAnalysis.decontaminate(
            corpus, test, "doc_id", "text", n = 13,
            testTextCol = Some("text"), bloomFpp = fpp)
          val dropped = n - result().count() // off the clock; must = planted
          val samples = (1 to runs).map { _ =>
            val t0 = System.nanoTime()
            result().write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
            (System.nanoTime() - t0) / 1e9
          }
          // isolate ONE run's shuffle volume; listener events are
          // async, give the bus a moment to drain before reading
          Thread.sleep(2000)
          shuffleBytes.set(0)
          result().write.format("noop").mode("overwrite").save()
          spark.catalog.clearCache()
          Thread.sleep(2000)
          val mb = shuffleBytes.get() / 1024.0 / 1024.0
          println(f"[decontam] n=$n%-8d fpp=${fpp.getOrElse(0.0)}%5.2f " +
            f"min=${samples.min}%7.3f shuffleMB=$mb%8.1f " +
            f"dropped=$dropped/$planted " +
            s"samples=${samples.map(s => f"$s%.3f").mkString(",")}")
        }

        // would-be shuffle volume: corpus grams in total vs surviving
        // the Bloom (what the semi-join must move when the test side
        // cannot broadcast) — measured off the clock, through the SAME
        // public gram pipeline the operator uses
        val grams = TextAnalysis.wordNgrams(corpus, "doc_id", "text", 13)
          .select(col("doc_id"), xxhash64(col("gram")).as("__gram_h"))
        val total = grams.count()
        val testGrams = test.select(explode(TextAnalysis.distinctWordNgrams(
            graft.functions.Tools.normalize(col("text")), lit(13))).as("gram"))
          .select(xxhash64(col("gram")).as("__gram_h")).distinct()
        val nTestGrams = testGrams.count()
        val bf = testGrams.stat.bloomFilter("__gram_h", nTestGrams, 0.01)
        val bc = spark.sparkContext.broadcast(bf)
        val survive = udf { (h: Long) => bc.value.mightContainLong(h) }
        val kept = grams.filter(survive(col("__gram_h"))).count()
        println(f"[decontam] n=$n%-8d corpus grams=$total%10d " +
          f"bloom-survivors=$kept%9d (${100.0 * kept / total}%5.2f%%) " +
          f"test grams=$nTestGrams (bloom bits ≈ ${bf.bitSize() / 8 / 1024 / 1024} MiB)")
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

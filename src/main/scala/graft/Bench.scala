package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: runs SparkEntry.benchQueries against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line for the driver
  * (BENCH_r{N}.json). Results are forced through the noop sink so every
  * column is actually computed (a bare count() would let Catalyst prune
  * the interesting work away). */
object Bench {
  private def loadavg1m(): Double =
    scala.util.Try(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).trim.split("\\s+").head.toDouble)
      .getOrElse(-1.0)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Quiet-host gate, sampled BEFORE this process does any work (at
    // bench END the 1-minute loadavg mostly reflects our own 32-thread
    // JVM, so gating there would always fail): per-round history shows
    // a concurrent sbt inflating samples up to ~3×, so when the host is
    // busy, wait for it to drain — up to a bounded budget, then proceed
    // anyway and let loadavg_start disclose the contamination.
    val loadGate = sys.env.get("SPARK_GRAFT_LOAD_GATE")
      .map(_.toDouble).getOrElse(1.5)
    val loadBudgetSecs = sys.env.get("SPARK_GRAFT_LOAD_WAIT_SECS")
      .map(_.toLong).getOrElse(600L)
    val gateT0 = System.nanoTime()
    var load = loadavg1m()
    while (load >= 0 && load > loadGate &&
        (System.nanoTime() - gateT0) / 1e9 < loadBudgetSecs) {
      System.err.println(f"[bench] host busy (loadavg1m $load%.2f > " +
        f"$loadGate%.2f), waiting 30 s for it to drain")
      Thread.sleep(30000)
      load = loadavg1m()
    }
    val loadStart = load
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM (classloading, codegen compiler, parquet footer cache)
    // before timing — otherwise the first query's number is mostly
    // one-time session cost, not query work.
    Tables.names.foreach { n =>
      try Tables.t(spark, sfDir, n).limit(1).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }
    // JMH-style warmup: run every headline query once at the SMALLEST
    // scale factor first (when one exists beside the target), so each
    // query's generated code is JIT-compiled before its timed run —
    // matching a long-running cluster, where code is warm. Data caches
    // don't overlap (different files), only code paths do.
    val warmDir = new java.io.File(sfDir).getParentFile match {
      case null => None
      case p =>
        val w = new java.io.File(p, "sf0.001")
        if (w.isDirectory && w.getAbsolutePath != new java.io.File(sfDir).getAbsolutePath)
          Some(w.getAbsolutePath)
        else None
    }
    // ad-hoc query-list override: comma-separated names (default: the
    // headline benchQueries) — lets a SCALE.md sweep bench any
    // registered query without touching the headline list. Unknown
    // names fail loudly before any timing runs.
    val queryList = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toIndexedSeq)
      .getOrElse(SparkEntry.benchQueries)
    queryList.foreach { n =>
      require(SparkEntry.queries.contains(n), s"unknown query '$n' " +
        s"(registered: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")})")
    }
    warmDir.foreach { wd =>
      queryList.foreach { name =>
        try SparkEntry.queries(name)(spark, wd)
          .write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => }
      }
    }
    // Steady-state timing: each query runs `runs` times at the target SF
    // and the MIN of the SUCCESSFUL runs is reported. A single sample
    // conflates query cost with whatever else the host is doing (GC from
    // the previous query, a concurrent build, page-cache misses); the min
    // of a few back-to-back runs is the standard steady-state estimator
    // and matches the deployment story (a resident cluster running the
    // query repeatedly). Three runs instead of two because per-round
    // history showed min-of-2 still swinging ±3× on this host. ALL
    // samples go into the JSON (null = that run failed) so the reader
    // can judge the spread instead of trusting one number.
    val runs = sys.env.get("SPARK_GRAFT_BENCH_RUNS").map { v =>
      // 0/negative would silently report every query as failed, and a
      // non-numeric value would crash before the JSON line — fail loudly
      val n = v.toIntOption.getOrElse(
        sys.error(s"SPARK_GRAFT_BENCH_RUNS must be a positive integer, got '$v'"))
      require(n >= 1, s"SPARK_GRAFT_BENCH_RUNS must be >= 1, got $n")
      n
    }.getOrElse(3)
    val results = queryList.map { name =>
      val fn = SparkEntry.queries(name)
      def once(): Option[Double] = {
        // queries with an internal persist() (minhash shingles, the LM
        // table) would otherwise serve runs 2..N from run 1's cache and
        // the min would skip the expensive build stage entirely — every
        // run must pay the full pipeline
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          None // a failed run must never become the reported min
        }
      }
      var samples: Seq[Option[Double]] = (1 to runs).map(_ => once())
      // spread guard: when the successful samples disagree by > 30%
      // (GC pause, page-cache miss, a background burst), take up to two
      // extra runs so the min converges on steady state — all samples
      // stay in the JSON for the reader to judge. (q60_ann_ivf needs no
      // exemption: q60_ann_ivf_build precedes it in benchQueries, so
      // every probe run — including run 1 — finds the index built.)
      var extra = 0
      def spread(ss: Seq[Double]): Double =
        if (ss.size < 2 || ss.min <= 0) 0.0 else (ss.max - ss.min) / ss.min
      while (extra < 2 && spread(samples.flatten) > 0.3) {
        samples = samples :+ once()
        extra += 1
      }
      (name, samples)
    }
    def f(d: Double) = "%.4f".formatLocal(java.util.Locale.ROOT, d)
    // min over successes; -1 marks a query whose every run failed
    val mins = results.map { case (name, ss) =>
      name -> ss.flatten.reduceOption(_ min _).getOrElse(-1.0)
    }
    val qs = mins.map { case (k, v) => "\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val sampleJson = results.map { case (k, ss) =>
      "\"" + k + "\":" + ss.map(_.map(f).getOrElse("null")).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = mins.map(_._2).filter(_ >= 0).sum
    val failed = mins.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    // host load markers: loadavg_start is the PRE-BENCH load (what the
    // quiet-host gate saw — external contamination), loadavg1m the
    // end-of-run value (dominated by our own JVM; kept for continuity
    // with rounds ≤ 7). A reader discounts a noisy round by its start
    // value, not the self-inflicted end value.
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"samples":$sampleJson,"failed":$failed,"runs":$runs,"loadavg_start":${f(loadStart)},"loadavg1m":${f(loadavg1m())},"sf":"$sfDir"}""")
    spark.stop()
  }
}

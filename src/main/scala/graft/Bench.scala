package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: runs SparkEntry.benchQueries against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line for the driver
  * (BENCH_r{N}.json). Results are forced through the noop sink so every
  * column is actually computed (a bare count() would let Catalyst prune
  * the interesting work away). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    warmDir.foreach { wd =>
      SparkEntry.benchQueries.foreach { name =>
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
    val results = SparkEntry.benchQueries.map { name =>
      val fn = SparkEntry.queries(name)
      val samples: Seq[Option[Double]] = (1 to runs).map { _ =>
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
    // host load marker: the driver benches while other work (sbt, tests)
    // may be live, and per-round history shows that contaminating samples
    // by up to ~2-3×. The 1-minute loadavg at bench end lets a reader
    // discount a noisy round instead of mis-grading the engine.
    val load = scala.util.Try(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).trim.split("\\s+").head)
      .getOrElse("-1")
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"samples":$sampleJson,"failed":$failed,"runs":$runs,"loadavg1m":$load,"sf":"$sfDir"}""")
    spark.stop()
  }
}

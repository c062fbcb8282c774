package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sim.Ann

/** Measures what int8 scalar quantization actually buys at growing
  * corpus sizes: on-disk parquet bytes (the scan-volume proxy — at
  * 100 TB the embedding scan IS the cost) and brute-force top-k wall
  * for the float-cosine path (q25's plan) vs the integer-grid path
  * (q113's plan), same 25-query probe set. The quantized corpus is
  * written once (build-side, off the clock — the codebook + quantize
  * pass amortizes like any index build).
  *
  * Vectors: dim-64 closed-form FULL-PRECISION floats in [-1, 1]
  * (xxhash64 scaled by 2⁻⁶³, no UDF). Full precision matters for the
  * bytes claim: a low-cardinality fixture (first attempt: 10⁴ distinct
  * values/dim) lets parquet dictionary-encode the FLOAT side too and
  * understates the ratio at 1.8× — real embeddings are near-unique
  * floats and effectively incompressible.
  *
  *   sbt "Test/runMain graft.QuantBench [runs] [vecN ...]"
  */
object QuantBench {
  private val DIM = 64

  private def vecs(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).toDF("vec_id")
      .withColumn("embedding", expr(
        s"""transform(sequence(0, ${DIM - 1}),
           |  j -> cast(cast(xxhash64(vec_id, j) as double)
           |            / 9.223372036854776e18 as float))"""
          .stripMargin))

  private def dirBytes(p: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isFile) f.length
      else Option(f.listFiles).map(_.map(walk).sum).getOrElse(0L)
    walk(new java.io.File(p))
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
    println(s"[quant] loadavg at start: $load")

    val tmp = java.nio.file.Files.createTempDirectory("graft-quant")
    try {
      for (n <- scales) {
        val fPath = s"$tmp/float$n"
        vecs(spark, n).write.parquet(fPath)
        val fl = spark.read.parquet(fPath)
        // build side, off the clock: codebook + quantize + write
        val qPath = s"$tmp/q$n"
        val tb0 = System.nanoTime()
        Ann.quantizeInt8(fl, "embedding", Ann.int8Params(fl, "embedding"))
          .select("vec_id", "qvec").write.parquet(qPath)
        val buildS = (System.nanoTime() - tb0) / 1e9
        val qv = spark.read.parquet(qPath)
        val fB = dirBytes(fPath); val qB = dirBytes(qPath)
        println(f"[quant] n=$n%-9d floatMB=${fB / 1048576.0}%8.1f " +
          f"int8MB=${qB / 1048576.0}%8.1f ratio=${fB.toDouble / qB}%5.2f " +
          f"(quantize+write $buildS%6.3f s, one-time)")

        def measure(mode: String, run: () => Long): Unit = {
          val samples = (1 to runs).map { _ =>
            val t0 = System.nanoTime()
            val rows = run()
            spark.catalog.clearCache()
            ((System.nanoTime() - t0) / 1e9, rows)
          }
          println(f"[quant] n=$n%-9d mode=$mode%-6s " +
            f"min=${samples.map(_._1).min}%7.3f rows=${samples.head._2} " +
            s"samples=${samples.map(s => f"${s._1}%.3f").mkString(",")}")
        }
        // PQ build side, off the clock like the SQ8 build: codebooks fit
        // on a BOUNDED sample (the documented codebook practice — fit
        // quality saturates far below corpus size; the fit must not
        // scale with n), then the whole corpus encodes to m-byte codes
        val pqPath = s"$tmp/pq$n"
        val tp0 = System.nanoTime()
        val cb = Ann.pqCodebooks(
          fl.filter(col("vec_id") % ((n / 50000L) max 1L) === 0),
          "vec_id", "embedding", m = 8, ksub = 256)
        Ann.encodePq(fl, "embedding", cb, "codes")
          .select("vec_id", "codes").write.parquet(pqPath)
        val pqBuildS = (System.nanoTime() - tp0) / 1e9
        val pq = spark.read.parquet(pqPath)
        val pqB = dirBytes(pqPath)
        println(f"[quant] n=$n%-9d pqMB=${pqB / 1048576.0}%8.1f " +
          f"ratio_vs_float=${fB.toDouble / pqB}%5.2f " +
          f"ratio_vs_int8=${qB.toDouble / pqB}%5.2f " +
          f"(fit+encode+write $pqBuildS%6.3f s, one-time)")

        measure("float", () => Ann.bruteForceTopK(
          fl.filter(col("vec_id") % (n / 25) === 0), fl,
          "vec_id", "embedding", "vec_id", "embedding", k = 10).count())
        measure("int8", () => Ann.quantizedTopK(
          qv.filter(col("vec_id") % (n / 25) === 0), qv,
          "vec_id", "qvec", "vec_id", "qvec", k = 10).count())
        measure("pq", () => Ann.pqTopKEncoded(
          fl.filter(col("vec_id") % (n / 25) === 0), pq, cb,
          "vec_id", "embedding", "vec_id", "codes", k = 10).count())

        // recall@10 against the float-cosine ground truth — the quality
        // half of each compression's trade (the byte/wall halves are
        // above). Both quantized rankings are EXACT under their own
        // metric; recall measures how much of the float answer that
        // metric preserves. READ THE NUMBER IN CONTEXT: this corpus is
        // uniform-random vectors, the recall WORST case — the float
        // top-10 is a noise-ranking of near-ties (all cosines ≈ 0.3)
        // and there is no cluster structure for PQ codebooks to learn,
        // so the measured 0.59 (int8) / 0.22 (pq at m=8, ksub=256) are
        // floors, not expectations for real embeddings (FAISS reports
        // the same cliff on random data). The recall that matters for
        // DEDUP — identical/near-identical vectors — is deterministic
        // (same codes → ADC floor) and spec-pinned in GraphDedupSpec's
        // planted-duplicate cases; raise m for finer grids when
        // retrieval (not dedup) is the workload.
        val qs = fl.filter(col("vec_id") % (n / 25) === 0)
        val truth = Ann.bruteForceTopK(qs, fl, "vec_id", "embedding",
          "vec_id", "embedding", k = 10).select("query_id", "neighbor_id")
        val nTruth = truth.count().toDouble
        def recall(hits: DataFrame): Double = hits
          .select("query_id", "neighbor_id")
          .join(truth, Seq("query_id", "neighbor_id"), "left_semi")
          .count() / nTruth
        val rSq8 = recall(Ann.quantizedTopK(
          qv.filter(col("vec_id") % (n / 25) === 0), qv,
          "vec_id", "qvec", "vec_id", "qvec", k = 10))
        val rPq = recall(Ann.pqTopKEncoded(qs, pq, cb,
          "vec_id", "embedding", "vec_id", "codes", k = 10))
        println(f"[quant] n=$n%-9d recall@10 vs float: int8=$rSq8%.3f " +
          f"pq=$rPq%.3f (m=8, ksub=256)")
        spark.catalog.clearCache()
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

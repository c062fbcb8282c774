package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.MatchJoin

/** Measures the `maxDocFreq` skew knob doing its production job: bounding
  * the match join's candidate volume on a corpus whose token distribution
  * has a genuine hot head (SCALE.md "Skew" section — the knob a real
  * deployment would set).
  *
  * The driver tables can't show this: their generators use tiny uniform
  * vocabularies (documents: 31 tokens, each in ~78% of docs; part: ~90),
  * so every token is equally hot and a doc-frequency cap either keeps all
  * tokens or drops all tokens. Real corpora are Zipf-shaped — a
  * non-discriminative head and a discriminative tail — and that shape is
  * exactly what the cap exploits. So this harness generates one
  * deterministically: token rank for (doc, slot) is log-uniform over a
  * 50k vocabulary, rank = floor(V^u) with u a 20-bit hash fraction, i.e.
  * P(rank = r) ≈ 1 / (r ln V) — Zipf s=1, closed-form and engine-
  * replayable (pure builtin exprs, no UDF).
  *
  * Predicted scaling for corpus N with queries = N/100 (both sides grow,
  * the honest scale-up):
  *   - uncapped:    candidates = Σ_tok qdf·df ∝ N² (head-dominated)
  *   - cap C:       kept tokens have df ≤ C, i.e. rank ≥ ~N·T/(C·lnV);
  *                  tail sum Σ_{r>cutoff} 1/r² ∝ 1/cutoff ∝ 1/N, so
  *                  candidates ∝ N²·(1/N) = N — LINEAR, while ~every
  *                  query keeps discriminative tail tokens and still
  *                  matches (the cap is not "fast by returning nothing").
  *
  * Prints per-config: min wall time, exact candidate-triple volume
  * (computed from vocab-sized df aggregates, not by materializing the
  * candidates), and matched-query fraction. Results are recorded in
  * SCALE.md ("maxDocFreq at scale").
  *
  *   sbt "Test/runMain graft.MatchCapBench [runs]"
  */
object MatchCapBench {
  private val V = 50000 // vocabulary size
  private val T = 10    // token slots per doc
  private val HashRes = 1 << 20

  /** doc_id → T log-uniform-rank tokens (deterministic in doc_id). */
  private def withToks(df: DataFrame): DataFrame =
    df.withColumn("toks", expr(
      s"""transform(sequence(0, ${T - 1}), j -> concat('t',
         |  cast(pow($V, pmod(xxhash64(doc_id, j), $HashRes) / $HashRes.0)
         |       as long)))""".stripMargin))

  def main(args: Array[String]): Unit = {
    val runs = args.headOption.flatMap(_.toIntOption).getOrElse(2)
    // 300k is capped-only (round 9's fourth point): the uncapped line is
    // Σqdf·df ∝ N² ≈ 5·10⁸ candidate triples — the config whose point
    // is that production would never run it; the capped line is the one
    // whose linearity the fourth point pins
    val scales = Seq(10000L, 30000L, 100000L, 300000L)
    def capsFor(n: Long) = if (n > 100000L) Seq(1000L) else Seq(0L, 1000L)
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
    println(s"[capbench] loadavg at start: $load")

    val tmp = java.nio.file.Files.createTempDirectory("graft-capbench")
    tmp.toFile.deleteOnExit()
    try {
      for (n <- scales) {
        val path = s"$tmp/docs$n"
        withToks(spark.range(n).toDF("doc_id")).write.parquet(path)
        val corpus = spark.read.parquet(path)
        val queries = corpus.filter(col("doc_id") % 100 === 0)
        val nq = (n + 99) / 100

        for (cap <- capsFor(n)) {
          def result(): DataFrame =
            MatchJoin.topK(queries.select("doc_id", "toks"),
              corpus.select("doc_id", "toks"),
              "toks", "toks", "doc_id", "doc_id", k = 5, maxDocFreq = cap)

          // exact candidate-triple volume from vocab-sized aggregates:
          // Σ_tok qdf(tok) · df(tok) over tokens surviving the cap —
          // what the uncapped/capped join would shuffle, without
          // materializing it (off the clock)
          val df = corpus
            .select(explode(array_distinct(col("toks"))).as("tok"))
            .groupBy("tok").agg(count(lit(1)).as("df"))
            .filter(if (cap > 0) col("df") <= cap else lit(true))
          val qdf = queries
            .select(explode(array_distinct(col("toks"))).as("tok"))
            .groupBy("tok").agg(count(lit(1)).as("qdf"))
          val cands = qdf.join(df, Seq("tok"))
            .agg(coalesce(sum(col("qdf") * col("df")), lit(0L)))
            .head().getLong(0)
          val matched = result().select("doc_id").distinct().count()

          val samples = (1 to runs).map { _ =>
            val t0 = System.nanoTime()
            result().write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
            (System.nanoTime() - t0) / 1e9
          }
          println(f"[capbench] n=$n%-7d cap=$cap%-5d min=${samples.min}%7.3f " +
            f"candidates=$cands%11d matched=$matched/$nq " +
            s"samples=${samples.map(s => f"$s%.3f").mkString(",")}")
        }
      }
    } finally {
      spark.stop()
      // best-effort temp cleanup (parquet dirs are not empty)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(tmp.toFile)
    }
  }
}

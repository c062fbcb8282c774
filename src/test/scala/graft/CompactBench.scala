package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Compaction-cost sweep (test scope): the r14 measurement behind
  * SCALE.md's cell-scoped-fold table. Builds a float IVF index at two
  * sizes (N and 10N rows, same nlist), streams one epoch whose rows
  * are confined to k of the nlist cells (drawn FROM those cells'
  * partitions with shifted ids, so the re-assignment lands them back
  * in the same k cells), and times `Ann.compactIvfIndex`.
  *
  * What the numbers must show (the r13 verdict's O(streamed) claim):
  * fold seconds scale with the TOUCHED cell bytes (∝ k at fixed N),
  * not with the index size — k=nlist reproduces the old full-table
  * rewrite for comparison, and a small-k fold at 10N costs a small
  * multiple of the N fold (the touched cells are 10× larger), never
  * the 10× full-table cost.
  *
  *   sbt "Test/runMain graft.CompactBench [N] [nlist]"
  */
object CompactBench {
  def main(args: Array[String]): Unit = {
    val baseN = args.headOption.flatMap(_.toIntOption).getOrElse(50000)
    val nlist = args.drop(1).headOption.flatMap(_.toIntOption).getOrElse(64)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val load = scala.util.Try(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg"))).trim).getOrElse("?")
    println(s"[compact] loadavg at start: $load")
    val dim = 16
    def corpus(n: Int) = spark.range(n.toLong).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), d =>
        pmod(hash(col("id") * lit(dim) + d), lit(10000)).cast("float")
          / 10000.0f).as("embedding"))
    for (n <- Seq(baseN, baseN * 10)) {
      val idx = TestScratch.dir(s"compactbench-$n")
      graft.sim.Ann.writeIvfIndex(corpus(n), "vec_id", "embedding",
        idx, nlist = nlist)
      val fs = new org.apache.hadoop.fs.Path(idx).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val pre = graft.sim.Ann.loadIndexGeometry(spark, idx, "bench")
      var epoch = 0L
      for (k <- Seq(1, 4, 16, nlist)) {
        // streamed rows drawn FROM the first k cell partitions (capped
        // per cell) with shifted ids: re-assignment under the stored
        // centroids lands them back in exactly those k cells
        val batch = spark.read.parquet(s"$idx/assigned")
          .filter(col("__cell") < k)
          .withColumn("__rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("__cell")).orderBy(col("neighbor_id"))))
          .filter(col("__rn") <= 500)
          .select((col("neighbor_id") + 10000000L * (epoch + 1))
            .as("vec_id"), col("__cv").as("embedding"))
        val streamed = batch.count()
        graft.streaming.EventStream.appendIvfBatch(batch, idx,
          "vec_id", "embedding", "cb", epoch, pre)
        val touched = graft.sim.Ann.readManifest(spark, idx).get
        val t0 = System.nanoTime()
        graft.sim.Ann.compactIvfIndex(spark, idx)
        val secs = (System.nanoTime() - t0) / 1e9
        // the fold retains the epoch dirs one cycle (probe grace);
        // collect them untimed and require them gone so the timing
        // covered a real fold
        graft.sim.Ann.compactIvfIndex(spark, idx)
        require(!fs.exists(new org.apache.hadoop.fs.Path(s"$idx/stream")),
          "fold left stream/ behind — timing meaningless")
        println(f"[compact] N=$n nlist=$nlist k=$k streamed=$streamed " +
          f"fold=$secs%.3f s (index rows pre-fold=${touched.rows})")
        epoch += 1
      }
      fs.delete(new org.apache.hadoop.fs.Path(idx), true)
    }
    spark.stop()
  }
}

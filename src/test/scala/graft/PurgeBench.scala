package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** File-scoped purge slope (r14 verdict #4): the band index and the
  * document store claim their tombstone purge costs O(touched files),
  * not O(store) — this sweep measures it the way CompactBench pins
  * the ANN fold's slope. Each store builds at N and 10N docs with the
  * shuffle width scaled ∝ N so DATA FILE SIZE stays constant (the
  * 100-TB regime: files are bounded-size, file COUNT grows with the
  * corpus); a fixed-size takedown (ids drawn from ONE file of the
  * primary table) then purges, and the claim passes if purge seconds
  * stay ~flat from N to 10N while the untouched files keep their
  * exact name+mtime identity (counted and required).
  *
  *   sbt "Test/runMain graft.PurgeBench [N] [tombstones]"
  */
object PurgeBench {
  def main(args: Array[String]): Unit = {
    val baseN = args.headOption.flatMap(_.toIntOption).getOrElse(50000)
    val nDel = args.drop(1).headOption.flatMap(_.toIntOption).getOrElse(50)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false") // fixed file fan-out
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val load = scala.util.Try(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg"))).trim).getOrElse("?")
    println(s"[purge] loadavg at start: $load")
    val words = 25
    def docs(n: Int, parts: Int) = spark.range(n.toLong)
      .repartition(parts)
      .select(col("id").as("doc_id"),
        concat_ws(" ", (0 until words).map(w =>
          concat(lit(s"w$w"), pmod(hash(col("id") * 12 + w), lit(5000))
            .cast("string"))): _*).as("text"))

    def files(dir: String): Map[String, Long] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) Map.empty
      else fs.listStatus(p).toSeq
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        .map(st => st.getPath.getName -> st.getModificationTime).toMap
    }
    /** ids confined to ONE file of `table` — the bounded-takedown
      * shape (a real takedown names documents, and documents written
      * together land together). */
    def idsFromOneFile(dir: String, table: String, idCol: String) = {
      val withFile = spark.read.parquet(s"$dir/$table")
        .select(col(idCol), col("_metadata.file_path").as("__f"))
      val oneFile = withFile.select("__f").limit(1)
      withFile.join(oneFile, Seq("__f"), "left_semi")
        .select(idCol).distinct().limit(nDel)
    }

    for (n <- Seq(baseN, baseN * 10)) {
      val parts = 32 * (n / baseN) // file size ~constant, count ∝ N
      spark.conf.set("spark.sql.shuffle.partitions", parts)

      // ---- band index
      val bidx = TestScratch.dir(s"purgebench-band-$n")
      graft.dedup.Dedup.writeNearDupIndex(docs(n, parts), "doc_id",
        "text", bidx)
      val ids = idsFromOneFile(bidx, "shingles", "__cid")
        .select(col("__cid").as("doc_id")).cache()
      val nIds = ids.count()
      graft.dedup.Dedup.deleteFromNearDupIndex(ids, "doc_id", bidx)
      val shBefore = files(s"$bidx/shingles")
      val bdBefore = files(s"$bidx/bands")
      val t0 = System.nanoTime()
      val purged = graft.dedup.Dedup.compactNearDupIndex(spark, bidx)
      val bandSecs = (System.nanoTime() - t0) / 1e9
      val shAfter = files(s"$bidx/shingles")
      val bdAfter = files(s"$bidx/bands")
      def changed(b: Map[String, Long], a: Map[String, Long]): Int =
        (b.keySet ++ a.keySet).count(k => b.get(k) != a.get(k))
      val shChanged = changed(shBefore, shAfter)
      val bdChanged = changed(bdBefore, bdAfter)
      require(purged == nIds, s"band purge count $purged != $nIds")
      require(shChanged < shBefore.size,
        "band purge rewrote every shingles file — not file-scoped")
      println(f"[purge] artifact=band N=$n files=${shBefore.size}+" +
        f"${bdBefore.size} tombstones=$nIds purge=$bandSecs%.3f s " +
        f"changed=$shChanged sh + $bdChanged bd " +
        f"(untouched ${shBefore.size - shChanged} sh kept identity)")

      // ---- document store
      val didx = TestScratch.dir(s"purgebench-doc-$n")
      graft.sources.Sinks.indexed(
        docs(n, parts).withColumn("toks", split(col("text"), " ")),
        didx, Some("doc_id"), "toks")
      val dIds = idsFromOneFile(didx, "docs", "_id")
        .select(col("_id").as("doc_id")).cache()
      val dN = dIds.count()
      graft.sources.Sinks.deleteFromIndexed(dIds, "doc_id", didx)
      val docBefore = files(s"$didx/docs")
      val postBefore = files(s"$didx/postings")
      val t1 = System.nanoTime()
      val dPurged = graft.sources.Sinks.compactIndexed(spark, didx)
      val docSecs = (System.nanoTime() - t1) / 1e9
      val docChanged = changed(docBefore, files(s"$didx/docs"))
      val postChanged = changed(postBefore, files(s"$didx/postings"))
      require(dPurged == dN, s"doc purge count $dPurged != $dN")
      require(docChanged < docBefore.size,
        "doc purge rewrote every docs file — not file-scoped")
      println(f"[purge] artifact=doc  N=$n files=${docBefore.size}+" +
        f"${postBefore.size} tombstones=$dN purge=$docSecs%.3f s " +
        f"changed=$docChanged docs + $postChanged postings " +
        f"(untouched ${docBefore.size - docChanged} docs kept identity)")

      ids.unpersist(); dIds.unpersist()
      Seq(bidx, didx).foreach { d =>
        val p = new org.apache.hadoop.fs.Path(d)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(p, true)
      }
    }
    spark.stop()
  }
}

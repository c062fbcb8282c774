package graft
import org.apache.spark.sql.functions._
class WinnowPerfSpec extends SparkSpec {
  test("winnow processes sf0.001 documents in seconds, not minutes") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val t0 = System.nanoTime()
    val n = graft.text.TextAnalysis.winnow(docs, "doc_id", "text").count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(s"winnow: $n fingerprints in $secs s")
    assert(n > 1000)
    // the interpreted higher-order-function spelling took MINUTES here
    // (O(len^2) md5 digests) — guard against that regression
    assert(secs < 30, s"winnow took $secs s on 500 small docs")
  }
}

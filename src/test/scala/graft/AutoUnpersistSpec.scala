package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.text.Curation

/** Cache discipline: operators that cache an internal frame
  * (minhashNearDups, ngramJaccardPairs, unigramLogProb) must release it
  * once the caller's action completes — a long-lived session (API
  * server, repeated recipe runs) must not accumulate MEMORY_AND_DISK
  * entries run after run. */
class AutoUnpersistSpec extends SparkSpec {
  import spark.implicits._

  // the QueryExecutionListener fires asynchronously after the action
  private def awaitEmptyCache(timeoutMs: Long = 30000): Boolean = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val deadline = System.currentTimeMillis + timeoutMs
    while (System.currentTimeMillis < deadline) {
      if (classic.sharedState.cacheManager.isEmpty) return true
      Thread.sleep(100)
    }
    false
  }

  test("operator-internal caches are released after the consuming action") {
    // other suites may have BUILT plans they never executed (explain-only
    // tests): their caches are registered but unconsumed — drain them so
    // this spec measures only its own three operators
    graft.engine.AutoUnpersist.releaseAll()
    spark.catalog.clearCache()
    val docs = (1 to 40).map(i =>
        (i.toLong, s"alpha beta gamma delta epsilon zeta eta theta $i"))
      .toDF("id", "text")
    // every AutoUnpersist call site, each followed by one action
    Dedup.minhashNearDups(docs, "id", "text").count()
    Dedup.ngramJaccardPairs(docs.withColumn("b", lit(1)), "id", "text", "b")
      .count()
    val lm = Curation.unigramLm(docs, "text")
    Curation.unigramLogProb(docs, "id", "text", lm).count()
    graft.text.TextAnalysis.winnowNearDups(docs, "id", "text").count()
    assert(awaitEmptyCache(),
      "cacheManager still holds entries 30s after the consuming actions")
    assert(graft.engine.AutoUnpersist.pendingCount == 0)
  }

  test("never-executed plans cannot grow the registry past its bound") {
    import org.apache.spark.sql.functions.lit
    graft.engine.AutoUnpersist.releaseAll()
    // plan-only registrations (no action ever runs them) — the shape a
    // recipe leaves behind when a LATER step fails at compile
    (1 to 80).foreach { i =>
      graft.engine.AutoUnpersist.cache(
        (1 to 3).toDF("v").withColumn("tag", lit(i)))
    }
    assert(graft.engine.AutoUnpersist.pendingCount <= 64,
      s"registry grew to ${graft.engine.AutoUnpersist.pendingCount}")
    graft.engine.AutoUnpersist.releaseAll()
    spark.catalog.clearCache()
  }
}

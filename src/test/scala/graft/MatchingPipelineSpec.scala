package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Matching

/** End-to-end pipeline checks on the sf0.001 driver data. */
class MatchingPipelineSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("entry flagship returns matched, scored, clustered rows") {
    val out = SparkEntry.entry(spark)
    val n = out.count()
    assert(n > 0)
    assert(out.columns.contains("confiance") && out.columns.contains("cluster_id"))
  }

  test("fuzzy matching recovers the perturbed registry twin for most persons") {
    val customer = Tables.t(spark, dir, "customer")
    val nation = Tables.t(spark, dir, "nation")
    val left = Matching.dataprep(Matching.personsFrom(customer, nation),
      "pid", "first_name", "last_name", "birth_str", "city")
    val right = Matching.dataprep(Matching.registryFrom(customer, nation),
      "pid", "first_name", "last_name", "birth_str", "city")
    val matches = Matching.matchBest(left, right, k = 5, fuzzy = true)
    val total = left.count()
    // the registry twin of person k has pid k + 1000000
    val correct = matches
      .filter(col("hit_matchid_id") === col("matchid_id") + 1000000).count()
    assert(correct.toDouble / total > 0.9,
      s"only $correct/$total matched their twin")
    // perturbed surnames (every 7th) should still match via fuzzy recall
    val perturbedCorrect = matches
      .filter(col("matchid_id") % 7 === 0)
      .filter(col("hit_matchid_id") === col("matchid_id") + 1000000).count()
    val perturbedTotal = left.filter(col("matchid_id") % 7 === 0).count()
    assert(perturbedCorrect.toDouble / perturbedTotal > 0.8,
      s"only $perturbedCorrect/$perturbedTotal perturbed matched")
  }
}

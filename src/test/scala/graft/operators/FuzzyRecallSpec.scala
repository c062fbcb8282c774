package graft.operators

import org.apache.spark.sql.functions._

/** Property guard for the FastSS recall invariant every fuzzy matcher
  * in the engine relies on (Joins.fuzzy, MatchJoin/MatchQuery fuzzy
  * leaves): any two strings within Levenshtein distance d share at
  * least one delete-≤d variant, so equi-joining on variants as the
  * blocking key can never miss a true match — precision is the
  * downstream levenshtein verify filter's job, recall is THIS theorem.
  * Random near-pairs (0-3 seeded edits over a small alphabet, so real
  * distance-1/2 pairs are dense) plus random far-pairs, checked in one
  * batched select. */
class FuzzyRecallSpec extends graft.SparkSpec {
  import spark.implicits._

  test("delete-neighborhood blocking is total-recall up to its distance (batched)") {
    val rnd = new scala.util.Random(7)
    val alpha = "abcd"
    def word(n: Int): String =
      (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    def edit(s: String): String = {
      val i = if (s.isEmpty) 0 else rnd.nextInt(s.length)
      rnd.nextInt(3) match {
        case 0 if s.nonEmpty => s.take(i) + s.drop(i + 1)
        case 1 => s.take(i) + alpha(rnd.nextInt(alpha.length)) + s.drop(i)
        case _ if s.nonEmpty =>
          s.take(i) + alpha(rnd.nextInt(alpha.length)) + s.drop(i + 1)
        case _ => s + alpha(rnd.nextInt(alpha.length))
      }
    }
    val pairs = (1 to 400).map { _ =>
      val a = word(2 + rnd.nextInt(7))
      var b = a
      (0 until rnd.nextInt(4)).foreach(_ => b = edit(b))
      (a, b)
    } ++ (1 to 100).map(_ => (word(2 + rnd.nextInt(7)), word(2 + rnd.nextInt(7))))
    val df = pairs.toDF("a", "b")
    for (d <- Seq(1, 2)) {
      val bad = df
        .withColumn("lev", levenshtein(col("a"), col("b")))
        .filter(col("lev") <= d)
        .withColumn("ok", arrays_overlap(
          FuzzyMatch.deleteVariants("a", d), FuzzyMatch.deleteVariants("b", d)))
        .filter(!col("ok"))
      assert(bad.isEmpty, s"d=$d recall violated for: " +
        bad.select("a", "b", "lev").collect().mkString(", "))
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.functions.{Similarity, Tools}
import graft.dedup.Dedup

/** Property tests (SURVEY.md §5 test plan): invariants of the string
  * metrics and normalizers. Pure-JVM properties run per-sample; Column
  * properties batch generated rows through one Spark job. */
class PropertiesSpec extends SparkSpec {

  /** Minimal forAll over ScalaCheck Gens (the scalatest-scalacheck
    * bridge isn't in the offline dependency set): 200 samples each. */
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    (1 to 200).foreach { i =>
      val seed = org.scalacheck.rng.Seed(i.toLong)
      f(ga.pureApply(Gen.Parameters.default, seed),
        gb.pureApply(Gen.Parameters.default, seed.next))
    }
  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Unit): Unit =
    (1 to 200).foreach { i =>
      val seed = org.scalacheck.rng.Seed(i.toLong)
      f(ga.pureApply(Gen.Parameters.default, seed),
        gb.pureApply(Gen.Parameters.default, seed.next),
        gc.pureApply(Gen.Parameters.default, seed.next.next))
    }
  import spark.implicits._

  private val word = Gen.listOf(Gen.alphaNumChar).map(_.mkString)
  private val accented = Gen.listOf(Gen.oneOf(
    ('a' to 'z') ++ Seq('é', 'à', 'ü', 'ñ', 'ç', ' ', '-', '!', '7'))).map(_.mkString)

  test("damerau: identity, symmetry, non-negative, ≤ max length") {
    forAll(word, word) { (a, b) =>
      val d = Similarity.damerau(a, b)
      assert(d == Similarity.damerau(b, a))
      assert(d >= 0 && d <= math.max(a.length, b.length))
      assert(Similarity.damerau(a, a) == 0)
    }
  }

  test("damerau: triangle inequality") {
    forAll(word, word, word) { (a, b, c) =>
      assert(Similarity.damerau(a, c) <=
        Similarity.damerau(a, b) + Similarity.damerau(b, c))
    }
  }

  test("jaro-winkler ∈ [0,1]; 1 iff equal non-empty; symmetric") {
    forAll(word, word) { (a, b) =>
      val j = Similarity.jaroWinkler(a, b)
      assert(j >= 0.0 && j <= 1.0)
      assert(math.abs(j - Similarity.jaroWinkler(b, a)) < 1e-12)
      if (a.nonEmpty) assert(Similarity.jaroWinkler(a, a) == 1.0)
    }
  }

  test("normalize is idempotent and produces only [0-9a-z ] (batched)") {
    val samples = Gen.listOfN(200, accented).sample.get
    val df = samples.toDF("s")
      .withColumn("n1", Tools.normalize(col("s")))
      .withColumn("n2", Tools.normalize(Tools.normalize(col("s"))))
    val rowsOut = df.collect()
    rowsOut.foreach { r =>
      val (n1, n2) = (r.getAs[String]("n1"), r.getAs[String]("n2"))
      assert(n1 == n2, s"not idempotent on ${r.getAs[String]("s")}")
      assert(n1.matches("[0-9a-z ]*"), s"bad chars in $n1")
      assert(!n1.startsWith(" ") && !n1.endsWith(" "))
    }
  }

  test("levNorm ∈ [0,1] and 1.0 for equal strings (batched)") {
    val samples = Gen.listOfN(200, Gen.zip(word, word)).sample.get
    val df = samples.toDF("a", "b")
      .withColumn("s", Similarity.levNorm(col("a"), col("b")))
      .withColumn("self", Similarity.levNorm(col("a"), col("a")))
    df.collect().foreach { r =>
      val s = r.getAs[Double]("s")
      assert(s >= 0.0 && s <= 1.0)
      assert(r.getAs[Double]("self") == 1.0)
    }
  }

  test("fingerprint is invariant under token order, case, punctuation (batched)") {
    val base = Gen.listOfN(50, Gen.nonEmptyListOf(Gen.oneOf(
      "alpha", "beta", "gamma", "delta")).map(_.distinct)).sample.get
    val df = base.map { toks =>
      (toks.mkString(" "), scala.util.Random.shuffle(toks).mkString(", ").toUpperCase)
    }.toDF("a", "b")
      .withColumn("fa", Dedup.fingerprint(col("a")))
      .withColumn("fb", Dedup.fingerprint(col("b")))
    df.collect().foreach { r =>
      assert(r.getAs[String]("fa") == r.getAs[String]("fb"))
    }
  }
}

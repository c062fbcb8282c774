package graft

import org.apache.spark.sql.functions._
import graft.operators.MatchQuery
import graft.operators.MatchQuery.{Clause, Spec}

/** Bool-query semantics of the match join (must / should /
  * minimum_should_match / fuzziness / span_first analogue). */
class MatchQuerySpec extends SparkSpec {
  import spark.implicits._

  private def right = Seq(
    (1L, Seq("jean", "dupont"), Seq("paris")),
    (2L, Seq("jean", "martin"), Seq("lyon")),
    (3L, Seq("marie", "dupont"), Seq("paris")),
    (4L, Seq("paul", "durand"), Seq("nice")))
    .toDF("rid", "name_toks", "city_toks")

  test("must clause is mandatory; should clauses add score") {
    val left = Seq((100L, Seq("jean"), Seq("paris"))).toDF("lid", "name_toks", "city_toks")
    val spec = Spec(Seq(
      Clause("name_toks", "name_toks", required = true),
      Clause("city_toks", "city_toks")), minimumShouldMatch = 0)
    val out = MatchQuery.run(left, right, spec, "lid", "rid")
    val ids = out.orderBy("hit_rank").collect().map(_.getAs[Long]("hit_rid")).toSeq
    // 1 and 2 match 'jean' (must); 3 fails must despite city match
    assert(ids.toSet == Set(1L, 2L))
    // 1 also matches city 'paris' → scores above 2
    assert(ids.head == 1L)
  }

  test("minimum_should_match filters candidates") {
    val left = Seq((100L, Seq("jean", "dupont"), Seq("lyon")))
      .toDF("lid", "name_toks", "city_toks")
    val spec = Spec(Seq(
      Clause("name_toks", "name_toks"),
      Clause("city_toks", "city_toks")), minimumShouldMatch = 2)
    val out = MatchQuery.run(left, right, spec, "lid", "rid")
    // only rid=2 satisfies both should clauses (jean + lyon)
    assert(out.collect().map(_.getAs[Long]("hit_rid")).toSeq == Seq(2L))
  }

  test("fuzziness widens a clause to edit-distance matches") {
    val left = Seq((100L, Seq("dupond"))).toDF("lid", "name_toks")
    val strict = Spec(Seq(Clause("name_toks", "name_toks")))
    assert(MatchQuery.run(left, right, strict, "lid", "rid").count() == 0)
    val fuzzy = Spec(Seq(Clause("name_toks", "name_toks", fuzziness = 1)))
    val got = MatchQuery.run(left, right, fuzzy, "lid", "rid")
      .collect().map(_.getAs[Long]("hit_rid")).toSet
    assert(got == Set(1L, 3L)) // dupond ~ dupont
  }

  test("fuzziness 2 recalls distance-2 pairs that share no delete-1 variant") {
    // "abcd" vs "axyd" — two inner substitutions, distance 2, and NO
    // shared delete-1 variant: delete-1 blocking can never surface this
    // pair, so it proves the blocking depth follows the clause fuzziness
    val r2 = Seq((1L, Seq("abcd"))).toDF("rid", "name_toks")
    val left = Seq((100L, Seq("axyd"))).toDF("lid", "name_toks")
    val d1 = Spec(Seq(Clause("name_toks", "name_toks", fuzziness = 1)))
    assert(MatchQuery.run(left, r2, d1, "lid", "rid").count() == 0)
    val d2 = Spec(Seq(Clause("name_toks", "name_toks", fuzziness = 2)))
    assert(MatchQuery.run(left, r2, d2, "lid", "rid")
      .collect().map(_.getAs[Long]("hit_rid")).toSeq == Seq(1L))
  }

  test("template fuzziness beyond the ES cap of 2 is rejected at compile time") {
    val yaml = new org.yaml.snakeyaml.Yaml()
    val t = yaml.load[Any](
      """{"query": {"match": {"name": {"query": "n", "fuzziness": 3}}}}""")
    val e = intercept[RuntimeException] { MatchQuery.compileTemplate(t) }
    assert(e.getMessage.contains("fuzziness"), e.getMessage)
  }

  test("minimum_should_match above the should count matches nothing (ES parity)") {
    import graft.operators.MatchQuery.{BoolNode, Leaf, TreeSpec}
    val left = Seq((100L, Seq("jean"), Seq("paris"))).toDF("lid", "name_toks", "city_toks")
    // one should clause, msm 2: ES returns zero hits — msm is NOT
    // clamped down to the clause count
    val spec = TreeSpec(BoolNode(
      should = Seq(Leaf(0, Clause("name_toks", "name_toks"))),
      minimumShouldMatch = 2))
    assert(MatchQuery.runTree(left, right, spec, "lid", "rid").count() == 0)
  }

  test("duplicate left rows sharing an id do not inflate hit_score") {
    import graft.operators.MatchQuery.{BoolNode, Leaf, TreeSpec}
    val one = Seq((100L, Seq("jean", "dupont"))).toDF("lid", "name_toks")
    val dup = one.unionByName(one) // content-hash ids collide by design
    val spec = TreeSpec(BoolNode(should = Seq(Leaf(0, Clause("name_toks", "name_toks")))))
    val sOne = MatchQuery.runTree(one, right, spec, "lid", "rid")
      .filter(col("hit_rid") === 1L).head().getAs[Long]("hit_score")
    val dupRows = MatchQuery.runTree(dup, right, spec, "lid", "rid")
      .filter(col("hit_rid") === 1L).collect()
    assert(dupRows.length == 2) // each duplicate row still gets its hit
    assert(dupRows.forall(_.getAs[Long]("hit_score") == sOne)) // same score, not 2x
  }

  test("template numeric knobs fail with the knob named, not a bare NumberFormatException") {
    def tpl(yaml: String): Any = new org.yaml.snakeyaml.Yaml().load[Any](yaml)
    val e1 = intercept[RuntimeException] {
      MatchQuery.compileTemplate(tpl(
        "query: {bool: {should: [{match: {name: q}}], minimum_should_match: most}}"))
    }
    assert(e1.getMessage.contains("minimum_should_match must be an integer"), e1.getMessage)
    val e2 = intercept[RuntimeException] {
      MatchQuery.compileTemplate(tpl("size: big\nquery: {match: {name: q}}"))
    }
    assert(e2.getMessage.contains("size must be an integer"), e2.getMessage)
    val e3 = intercept[RuntimeException] {
      MatchQuery.compileTemplate(tpl(
        "query: {match: {name: {query: q, fuzziness: fuzzy}}}"))
    }
    assert(e3.getMessage.contains("fuzziness on name must be an integer or auto"),
      e3.getMessage)
  }

  test("firstPosition restricts matching to the right side's first token (span_first)") {
    val left = Seq((100L, Seq("dupont"))).toDF("lid", "name_toks")
    val anywhere = Spec(Seq(Clause("name_toks", "name_toks")))
    assert(MatchQuery.run(left, right, anywhere, "lid", "rid").count() == 2)
    val firstOnly = Spec(Seq(Clause("name_toks", "name_toks", firstPosition = true)))
    // 'dupont' is first token nowhere (jean/marie/paul lead) → no hits
    assert(MatchQuery.run(left, right, firstOnly, "lid", "rid").count() == 0)
    val jeanFirst = Seq((100L, Seq("jean"))).toDF("lid", "name_toks")
    assert(MatchQuery.run(jeanFirst, right, firstOnly, "lid", "rid").count() == 2)
  }
}

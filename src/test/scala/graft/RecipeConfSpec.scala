package graft

import java.nio.file.Files
import graft.conf.RecipeConf

/** YAML-driven recipe: load conf → compile → run — the reference's main
  * interface (recipes.py:976-1139). */
class RecipeConfSpec extends SparkSpec {

  private val dir = Files.createTempDirectory("graft-conf").toString

  test("yaml recipe end-to-end: csv in → steps → parquet out") {
    Files.writeString(java.nio.file.Paths.get(s"$dir/people.csv"),
      "name;age;city\nJosé GARCIA;34;Paris\nAnn Lee;;Lyon\nBOB;x;Nice\n")
    val yaml =
      s"""datasets:
         |  people:
         |    path: $dir/people.csv
         |    format: csv
         |  out:
         |    path: $dir/out
         |    format: parquet
         |recipes:
         |  prep:
         |    input: people
         |    steps:
         |      - map: {orig_name: name}
         |      - normalize: [name]
         |      - to_integer: [age]
         |      - fillna: {age: -1}
         |      - eval: {name_len: "length(name)", is_adult: "age >= 18"}
         |      - keep:
         |          select: [name, orig_name, age, name_len, is_adult, city]
         |          where: "age != 0"
         |    output: out
         |""".stripMargin
    val conf = RecipeConf.load(yaml)
    val out = RecipeConf.run(spark, conf, "prep")
    val back = spark.read.parquet(s"$dir/out").orderBy("name").collect()
    assert(back.length == 3)
    val jose = back.find(_.getAs[String]("orig_name") == "José GARCIA").get
    assert(jose.getAs[String]("name") == "jose garcia")
    assert(jose.getAs[Long]("age") == 34L)
    val bob = back.find(_.getAs[String]("orig_name") == "BOB").get
    assert(bob.getAs[Long]("age") == -1L) // invalid cast → null → fillna
    assert(!bob.getAs[Boolean]("is_adult"))
  }

  test("sub-recipe steps compose; join step enriches from another dataset") {
    Files.writeString(java.nio.file.Paths.get(s"$dir/cities.csv"),
      "city;dep\nparis;75\nlyon;69\n")
    Files.writeString(java.nio.file.Paths.get(s"$dir/persons2.csv"),
      "name;city\nana;Paris\nben;Lyons\n")
    val yaml =
      s"""datasets:
         |  persons2: {path: $dir/persons2.csv, format: csv}
         |  cities: {path: $dir/cities.csv, format: csv}
         |recipes:
         |  clean_city:
         |    input: persons2
         |    steps:
         |      - normalize: [city]
         |  enrich:
         |    input: persons2
         |    steps:
         |      - clean_city
         |      - join:
         |          dataset: cities
         |          fuzzy: {city: city}
         |          select: {dep: dep}
         |""".stripMargin
    val conf = RecipeConf.load(yaml)
    val out = RecipeConf.run(spark, conf, "enrich")
    val m = out.collect().map(r => r.getAs[String]("name") ->
      (r.getAs[String]("city_match"), r.getAs[String]("dep"))).toMap
    assert(m("ana") == ("paris", "75"))
    assert(m("ben") == ("lyon", "69")) // "lyons" → fuzzy dist 1 → lyon
  }

  test("env interpolation and exec rejection") {
    val conf = RecipeConf.load(
      "datasets:\n  d: {path: ${GRAFT_TEST_PATH}/x, format: parquet}\nrecipes: {}",
      env = Map("GRAFT_TEST_PATH" -> "/data"))
    assert(conf.datasets("d").path == "/data/x")
    val bad = RecipeConf.load(
      s"""datasets:
         |  p: {path: $dir/people.csv, format: csv}
         |recipes:
         |  r:
         |    input: p
         |    steps:
         |      - exec: "df.drop()"
         |""".stripMargin)
    val e = intercept[RuntimeException] {
      RecipeConf.run(spark, bad, "r")
    }
    assert(e.getMessage.contains("not supported"))
  }
}

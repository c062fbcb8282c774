package graft

import org.apache.spark.sql.functions._
import graft.sources.{Sources, Sinks}
import graft.conf.RecipeConf

/** JDBC source/sink driven against a REAL database — Spark ships an
  * embedded Derby (its hive-metastore dependency), so the round trip
  * runs in-JVM with zero extra dependencies. Covers the reference's
  * `sql` connector surface (recipes.py:484-509 read, 921-946 write):
  * table read, whole-query pushdown, filter pushdown into the scan,
  * create/append modes, and the YAML `format: sql` routing. */
class JdbcSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  test("jdbc sink + source round-trip through embedded Derby") {
    import spark.implicits._
    val df = Seq((1L, "ada", 36), (2L, "grace", 45), (3L, "linus", 28))
      .toDF("id", "name", "age")
    Sinks.jdbc(df, url, "people", mode = "create", props = props)
    val back = Sources.jdbc(spark, url, "people", props = props)
    assert(back.count() == 3)
    assert(back.columns.map(_.toLowerCase).sorted.toSeq == Seq("age", "id", "name"))
    // append mode adds rows instead of replacing
    Sinks.jdbc(Seq((4L, "edsger", 71)).toDF("id", "name", "age"),
      url, "people", mode = "append", props = props)
    assert(Sources.jdbc(spark, url, "people", props = props).count() == 4)
    // create mode replaces
    Sinks.jdbc(df.limit(1), url, "people", mode = "create", props = props)
    assert(Sources.jdbc(spark, url, "people", props = props).count() == 1)
  }

  test("jdbc query pushdown runs the SELECT in-database (recipes.py:484-509)") {
    import spark.implicits._
    Sinks.jdbc(Seq((1L, "ada", 36), (2L, "grace", 45), (3L, "linus", 28))
      .toDF("id", "name", "age"), url, "engineers", mode = "create", props = props)
    // Derby folds unquoted identifiers to upper case while Spark's JDBC
    // writer creates them quoted lower-case — quote them in pushed SQL
    val q = Sources.jdbc(spark, url, "engineers",
      query = Some("""SELECT "name" FROM engineers WHERE "age" > 30"""), props = props)
    assert(q.columns.map(_.toLowerCase).toSeq == Seq("name"))
    assert(q.collect().map(_.getString(0)).sorted.toSeq == Seq("ada", "grace"))
    // a Spark-side filter on a table read is PUSHED into the JDBC scan —
    // the database does the filtering, not the executor
    val filtered = Sources.jdbc(spark, url, "engineers", props = props)
      .filter(col("age") > 30)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.toLowerCase.contains("age"),
      s"expected the age filter pushed into the JDBC scan:\n$plan")
    assert(filtered.count() == 2)
  }

  test("YAML format: sql reads from and writes to the database") {
    import spark.implicits._
    Sinks.jdbc(Seq((1L, "paris", 1), (2L, "london", 0), (3L, "lyon", 1))
      .toDF("id", "city", "fr"), url, "cities", mode = "create", props = props)
    // `french` declares a READ query too: the sink must strip it (the
    // JDBC writer rejects dbtable+query together) so the same dataset
    // works as both input and output
    val yaml =
      s"""datasets:
         |  cities:
         |    path: cities
         |    format: sql
         |    options: {url: "$url", driver: org.apache.derby.jdbc.EmbeddedDriver}
         |  french:
         |    path: french_cities
         |    format: sql
         |    options: {url: "$url", driver: org.apache.derby.jdbc.EmbeddedDriver,
         |              query: "SELECT * FROM french_cities"}
         |recipes:
         |  keep_french:
         |    input: cities
         |    steps:
         |      - eval: {is_fr: "fr = 1"}
         |    output: french
         |    mode: create
         |""".stripMargin
    val conf = RecipeConf.load(yaml)
    RecipeConf.run(spark, conf, "keep_french")
    val out = Sources.jdbc(spark, url, "french_cities", props = props)
    assert(out.count() == 3)
    assert(out.columns.map(_.toLowerCase).contains("is_fr"))
  }
}

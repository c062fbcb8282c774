package graft.functions

import org.apache.spark.sql.SparkSession

/** The `eval` surface (SURVEY.md §2.6, §7.3): the reference evaluates
  * per-row Python expressions with a library of locals
  * (/root/reference/code/tools.py via safeeval, tools.py:232-246).
  *
  * The Spark-idiomatic equivalent is NOT an embedded interpreter: scalar
  * helpers register once as SQL functions, and recipe `eval` expressions
  * become SQL expression strings compiled by Catalyst (`expr(...)`) —
  * conditionals → CASE WHEN, len → length/size, re.sub →
  * regexp_replace, list comprehensions → transform/filter. Anything the
  * builtins don't cover calls the functions registered here.
  *
  * Every registration DELEGATES to the shared scalar kernel in
  * Tools/Similarity — the same kernels the Column API's UDFs wrap — so
  * the SQL spelling and the library spelling cannot drift (an earlier
  * hand-rolled copy of levenshtein_norm had already diverged on null
  * handling). udf.register enforces arity at analysis time.
  * (Registering the Column implementations directly is not possible:
  * Spark 4's Column DSL builds ColumnNode trees that the function
  * registry cannot resolve.) PropertiesSpec pins SQL-vs-Column parity.
  */
object Registry {

  /** Register the tools library for use inside expr()/spark.sql. */
  def register(spark: SparkSession): Unit = {
    val u = spark.udf
    u.register("graft_normalize", (s: String) => Tools.normalizeStr(s))
    u.register("graft_damerau", (a: String, b: String) => Similarity.damerau(a, b))
    u.register("graft_jw", (a: String, b: String) => Similarity.jwRounded(a, b))
    u.register("levenshtein_norm",
      (a: String, b: String) => Similarity.levNormDamerau(a, b))
    u.register("graft_ngrams", (s: String, n: Int) => Tools.charNgramsStr(s, n))
    u.register("graft_distance_km",
      (lat1: Double, lon1: Double, lat2: Double, lon2: Double) =>
        Tools.haversineKmScalar(lat1, lon1, lat2, lon2))
  }
}

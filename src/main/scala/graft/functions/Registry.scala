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
  */
object Registry {

  /** Register the tools library for use inside expr()/spark.sql. */
  def register(spark: SparkSession): Unit = {
    val u = spark.udf

    u.register("graft_normalize", (s: String) =>
      if (s == null) null
      else java.text.Normalizer.normalize(s.toLowerCase, java.text.Normalizer.Form.NFD)
        .replaceAll("\\p{M}+", "")
        .replaceAll("[^0-9a-z]+", " ").trim.replaceAll("\\s+", " "))

    u.register("graft_damerau", (a: String, b: String) => Similarity.damerau(a, b))

    u.register("graft_jw", (a: String, b: String) =>
      math.round(Similarity.jaroWinkler(a, b) * 100.0) / 100.0)

    u.register("levenshtein_norm", (a: String, b: String) => {
      if (a == null || b == null) 0.0
      else {
        val d = Similarity.damerau(a, b).toDouble
        val norm = (100.0 - 100.0 * d / (1.0 + math.min(a.length, b.length))) / 100.0
        math.max(math.round(norm * 100.0) / 100.0, 0.0)
      }
    })

    u.register("graft_ngrams", (s: String, n: Int) =>
      if (s == null) null
      else (0 to s.length - n).map(i => s.substring(i, i + n)))

    u.register("graft_distance_km", (lat1: Double, lon1: Double, lat2: Double, lon2: Double) => {
      val r = 6371.0088
      val dLat = math.toRadians(lat2 - lat1)
      val dLon = math.toRadians(lon2 - lon1)
      val a = math.pow(math.sin(dLat / 2), 2) +
        math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
          math.pow(math.sin(dLon / 2), 2)
      math.round(r * 2 * math.asin(math.sqrt(a)) * 10.0) / 10.0
    })
  }
}

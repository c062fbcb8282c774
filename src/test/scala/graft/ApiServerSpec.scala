package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import graft.api.ApiServer
import graft.conf.RecipeConf

/** Drive the REST surface over a real recipe project (api.py parity:
  * dataset listing/sampling, recipe test + async run, jobs). */
class ApiServerSpec extends SparkSpec {

  private val dir = Files.createTempDirectory("graft-api").toString
  private lazy val client = HttpClient.newHttpClient()

  private def get(url: String) = client.send(
    HttpRequest.newBuilder(URI.create(url)).GET().build(),
    HttpResponse.BodyHandlers.ofString())
  private def send(method: String, url: String) = client.send(
    HttpRequest.newBuilder(URI.create(url))
      .method(method, HttpRequest.BodyPublishers.noBody()).build(),
    HttpResponse.BodyHandlers.ofString())

  test("datasets, sample, test, run, jobs round trip over HTTP") {
    Files.writeString(java.nio.file.Paths.get(s"$dir/in.csv"),
      "name;age\nana;30\nben;41\ncleo;x\n")
    val conf = RecipeConf.load(
      s"""datasets:
         |  in: {path: $dir/in.csv, format: csv}
         |  out: {path: $dir/out, format: parquet}
         |recipes:
         |  clean:
         |    input: in
         |    steps:
         |      - to_integer: [age]
         |      - fillna: {age: -1}
         |    output: out
         |""".stripMargin)
    val api = new ApiServer(spark, conf).start()
    val base = s"http://localhost:${api.actualPort}/api"
    try {
      val ds = get(s"$base/datasets")
      assert(ds.statusCode() == 200 && ds.body() == """["in","out"]""")

      val sample = send("POST", s"$base/datasets/in?size=2")
      assert(sample.statusCode() == 200)
      assert(sample.body().contains(""""name":"ana""""))
      assert(!sample.body().contains("cleo")) // size honored

      val test = send("PUT", s"$base/recipes/clean/test")
      assert(test.statusCode() == 200)
      assert(test.body().contains(""""age":-1""")) // 'x' → null → -1

      val run = send("PUT", s"$base/recipes/clean/run")
      assert(run.statusCode() == 202 && run.body().contains("\"job\""))
      api.awaitJobs()
      val jobs = get(s"$base/jobs")
      assert(jobs.body().contains(""""status": "done""""))
      assert(spark.read.parquet(s"$dir/out").count() == 3)

      assert(get(s"$base/nope").statusCode() == 404)
    } finally api.stop()
  }

  test("_search proxy scores token queries against the native index") {
    import spark.implicits._
    import graft.sources.Sinks
    val idxDir = s"$dir/idx"
    Sinks.indexed(Seq(
        (1L, "red apple pie", Seq("red", "apple", "pie")),
        (2L, "red apple tart", Seq("red", "apple", "tart")),
        (3L, "green pear pie", Seq("green", "pear", "pie")))
        .toDF("id", "text", "toks"),
      idxDir, idCol = Some("id"), analyzedCol = "toks")
    val conf = RecipeConf.load(
      s"datasets:\n  corpus: {path: $idxDir, format: index}\nrecipes: {}")
    val api = new ApiServer(spark, conf).start()
    val base = s"http://localhost:${api.actualPort}/api"
    try {
      val r = send("POST", s"$base/datasets/corpus/_search?q=red+apple&size=2")
      assert(r.statusCode() == 200)
      // docs 1 and 2 match both tokens; doc 3 matches none
      assert(r.body().contains(""""id":1""") && r.body().contains(""""id":2"""))
      assert(!r.body().contains(""""id":3"""))
      val pie = send("POST", s"$base/datasets/corpus/_search?q=pie&size=10")
      assert(pie.body().contains(""""id":3"""))
      assert(send("POST", s"$base/datasets/corpus/_search").statusCode() == 400)
    } finally api.stop()
  }
}

package graft.graph

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-node graph metrics — the clique operator's optional `compute` list
  * (/root/reference/code/recipes.py:2003-2034: degree, pagerank,
  * triangles, clustering). GraphX backs the iterative parts; results come
  * back as DataFrames for plan composition.
  */
object GraphMetrics {

  private def toGraph(edges: DataFrame): Graph[Int, Int] = {
    val Array(srcC, dstC) = edges.columns.take(2)
    val rdd = edges.select(col(srcC).cast("long"), col(dstC).cast("long"))
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), 1))
    Graph.fromEdges(rdd, 0)
  }

  /** degree / pagerank / triangle count / clustering coefficient per
    * node. `compute` picks which (cheaper ones skip GraphX jobs). */
  def metrics(edges: DataFrame, compute: Seq[String]): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val g = toGraph(edges).cache()
    var out = g.degrees.toDF("node", "degree")
    if (compute.contains("pagerank")) {
      val pr = g.pageRank(0.0001).vertices.toDF("node", "pagerank_raw")
        .withColumn("pagerank", round(col("pagerank_raw"), 4)).drop("pagerank_raw")
      out = out.join(pr, Seq("node"), "left")
    }
    if (compute.contains("triangles") || compute.contains("clustering")) {
      val tc = g.triangleCount().vertices.toDF("node", "triangles")
      out = out.join(tc, Seq("node"), "left")
      if (compute.contains("clustering")) {
        // local clustering coefficient = 2·T / (d·(d-1))
        out = out.withColumn("clustering",
          when(col("degree") >= 2,
            round(col("triangles") * 2.0 / (col("degree") * (col("degree") - 1)), 4))
            .otherwise(lit(0.0)))
      }
    }
    out
  }
}

package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over an edge list — the engine behind the
  * reference's `clique` operator (/root/reference/code/recipes.py:1989-2062,
  * which builds a NetworkX graph per chunk and labels components).
  *
  * We implement the intended GLOBAL semantics (SURVEY.md §4) with an
  * iterative DataFrame min-label propagation:
  *   label(v) ← min(label(v), min over neighbors u of label(u))
  * until fixpoint. Component id = the minimum vertex id in the component —
  * deterministic, unlike the reference's per-run random uuid
  * (code/recipes.py:2040-2048), and therefore oracle-checkable.
  *
  * Scale: each round is one shuffle on the edge key; rounds = graph
  * diameter (entity-resolution "clique" graphs are shallow — near-dup
  * clusters have tiny diameter, so 3-6 rounds in practice). Labels are
  * persisted and localCheckpoint'ed each round to truncate lineage.
  * For adversarial high-diameter graphs, swap in the large-star/small-star
  * variant (Kiveris et al., "Connected Components in MapReduce and
  * Beyond") — same DataFrame skeleton.
  */
object ConnectedComponents {

  /** @param edges two-column DataFrame (src, dst) — any numeric/string ids
    * @return DataFrame (node, component) where component = min node id of
    *         the component (same type as the ids)
    */
  def run(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val Array(srcC, dstC) = edges.columns.take(2)
    // symmetrize + distinct once
    val sym = edges.select(col(srcC).as("src"), col(dstC).as("dst"))
      .union(edges.select(col(dstC).as("src"), col(srcC).as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("comp", col("node"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    labels.count() // materialize

    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // propagate: each node takes min(own, neighbors') label
      val next = sym.join(labels, sym("dst") === labels("node"))
        .select(sym("src").as("node"), col("comp"))
        .union(labels)
        .groupBy("node").agg(min("comp").as("comp"))
        .localCheckpoint(eager = true)
      val changed = next.alias("n")
        .join(labels.alias("o"), col("n.node") === col("o.node"))
        .filter(col("n.comp") =!= col("o.comp"))
        .limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    sym.unpersist()
    // fail LOUD on non-convergence: partial labels would silently split
    // one component into several (min-label moves one hop per round, so
    // diameter > maxIter graphs need runStarContraction instead)
    require(converged,
      s"connected components did not converge in $maxIter rounds — " +
        "graph diameter exceeds maxIter; raise it or use runStarContraction")
    labels
  }

  /** Alternating large-star/small-star contraction (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond") — O(log n) rounds
    * regardless of graph diameter, vs O(diameter) for min-label
    * propagation. Use for deep graphs (long chains); `run` stays the
    * default for the shallow clusters entity resolution produces.
    *
    *  - large-star: every node links its strictly-larger neighbors to
    *    its minimum neighborhood member;
    *  - small-star: every node links its smaller-or-equal neighbors to
    *    that minimum.
    * At fixpoint each component is a star around its minimum id.
    */
  def runStarContraction(edges: DataFrame, maxIter: Int = 30): DataFrame = {
    val Array(srcC, dstC) = edges.columns.take(2)
    // the contraction only needs a TOTAL ORDER on ids, so string ids work
    // as-is (min/least compare lexicographically, same tie semantics as
    // run()). Numeric ids unify to long so mixed int/long src/dst still
    // union; casting STRINGS to long — the old behavior — dies under
    // ANSI or silently nulls every id without it.
    val (srcT, dstT) = (edges.schema(srcC).dataType, edges.schema(dstC).dataType)
    val idCast: org.apache.spark.sql.Column => org.apache.spark.sql.Column = (srcT, dstT) match {
      case (_: org.apache.spark.sql.types.NumericType,
            _: org.apache.spark.sql.types.NumericType) => _.cast("long")
      case (a, b) if a == b => identity
      case _ => _.cast("string")
    }
    var e = edges.select(idCast(col(srcC)).as("u"), idCast(col(dstC)).as("v"))
      .union(edges.select(idCast(col(dstC)).as("u"), idCast(col(srcC)).as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    def minNbr(df: DataFrame): DataFrame =
      df.groupBy("u").agg(least(min(col("v")), first(col("u"))).as("m"))

    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // large-star: (v, m(u)) for v in N(u), v > u
      val mu = minNbr(e)
      val large = e.join(mu, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
      // small-star on the large-star output
      val sym1 = large.union(large.select(col("v").as("u"), col("u").as("v")))
        .filter(col("u") =!= col("v")).distinct()
      val mu2 = minNbr(sym1)
      // small-star links the smaller-or-equal neighbors AND u itself to
      // the minimum (dropping the self link loses 2-node components)
      val small = sym1.join(mu2, "u")
        .filter(col("v") <= col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(mu2.select(col("u"), col("m").as("v")))
      val next = small.union(small.select(col("v").as("u"), col("u").as("v")))
        .filter(col("u") =!= col("v")).distinct()
        .localCheckpoint(eager = true)
      val changed = next.except(e).limit(1).count() + e.except(next).limit(1).count()
      e.unpersist()
      e = next
      converged = changed == 0
      iter += 1
    }
    // stars: every node's label = min(neighbors ∪ self); isolated nodes
    // of the ORIGINAL edge set keep themselves (same id typing as above)
    val nodes = edges.select(idCast(col(srcC)).as("node"))
      .union(edges.select(idCast(col(dstC)).as("node"))).distinct()
    val labels = minNbr(e).select(col("u").as("node"), col("m").as("comp"))
    nodes.join(labels, Seq("node"), "left")
      .select(col("node"), coalesce(col("comp"), col("node")).as("comp"))
  }

  /** The `clique` operator contract: label each edge row with
    * graph_clique_id (component id) and graph_clique_size
    * (code/recipes.py:2040-2055), joined back on the first node column.
    * `compute` adds per-node metric columns (degree, pagerank,
    * triangles, clustering, closeness, square_clustering, eigenvector —
    * recipes.py:2003-2034), also joined on the first node column. */
  def clique(df: DataFrame, src: String, dst: String,
      compute: Seq[String] = Nil): DataFrame = {
    val comps = run(df.select(col(src), col(dst)))
    val sizes = comps.groupBy("comp").agg(count("*").as("graph_clique_size"))
    val base = df
      .join(comps.withColumnRenamed("node", src).withColumnRenamed("comp", "graph_clique_id"), Seq(src), "left")
      .join(sizes.withColumnRenamed("comp", "graph_clique_id"), Seq("graph_clique_id"), "left")
    if (compute.isEmpty) base
    else base.join(
      graft.graph.GraphMetrics.metrics(df.select(col(src), col(dst)), compute)
        .withColumnRenamed("node", src),
      Seq(src), "left")
  }
}

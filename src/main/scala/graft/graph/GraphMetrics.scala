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

  /** Canonical UNDIRECTED edge RDD: self-loops dropped, (min,max)
    * deduped — degree, triangles and clustering then agree with each
    * other and with networkx (raw directed duplicates would inflate
    * degrees while TriangleCount dedups internally, making
    * 2T/(d(d-1)) inconsistent). */
  private def canonicalEdges(edges: DataFrame) = {
    val Array(srcC, dstC) = edges.columns.take(2)
    // GraphX vertex ids ARE longs — fail loudly on string ids (an ANSI
    // cast would die mid-job with a cryptic CAST_INVALID_INPUT; without
    // ANSI every id would null out and the metrics would be garbage)
    Seq(srcC, dstC).foreach { c =>
      require(edges.schema(c).dataType
          .isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"graph metrics run on GraphX, which requires NUMERIC node ids; " +
          s"column '$c' is ${edges.schema(c).dataType.simpleString} — " +
          "map ids to longs first (clique without `compute` accepts any id type)")
    }
    edges.select(col(srcC).cast("long").as("a"), col(dstC).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .distinct()
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), 1))
  }

  private def toGraph(edges: DataFrame): Graph[Int, Int] =
    Graph.fromEdges(canonicalEdges(edges), 0)

  /** degree / pagerank / triangle count / clustering coefficient /
    * closeness / square clustering / eigenvector centrality per node.
    * `compute` picks which (cheaper ones skip GraphX jobs). Reference
    * metric names (closeness_centrality, eigenvector_centrality_numpy)
    * are accepted as aliases. */
  def metrics(edges: DataFrame, compute: Seq[String]): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    def wants(names: String*) = names.exists(n => compute.exists(_.startsWith(n)))
    val g = toGraph(edges).cache()
    var out = g.degrees.toDF("node", "degree")
    if (wants("pagerank")) {
      // undirected pagerank (the networkx convention): run on the
      // bidirectional graph and normalize ranks to sum 1 — GraphX alone
      // is directed and sums to ~N
      val bidi = Graph.fromEdges(
        canonicalEdges(edges).flatMap(e => Seq(e, Edge(e.dstId, e.srcId, 1))), 0)
      val raw = bidi.pageRank(0.0001).vertices.cache()
      val total = raw.values.sum()
      // materialize pr (vertex-count-sized) BEFORE dropping raw's cache:
      // pr is lazy, and unpersisting first would re-run the whole Pregel
      // iteration when the caller finally evaluates the joined result
      val pr = raw.toDF("node", "pagerank_raw")
        .withColumn("pagerank", round(col("pagerank_raw") / total, 4))
        .drop("pagerank_raw")
        .localCheckpoint(eager = true)
      out = out.join(pr, Seq("node"), "left")
      raw.unpersist(blocking = false)
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
    if (wants("closeness"))
      out = out.join(closeness(edges), Seq("node"), "left")
    if (wants("square_clustering"))
      // nodes with <2 neighbors form no pairs and are absent from the
      // metric frame — networkx reports 0.0 for them, not null
      out = out.join(squareClustering(edges), Seq("node"), "left")
        .withColumn("square_clustering", coalesce(col("square_clustering"), lit(0.0)))
    if (wants("eigenvector"))
      out = out.join(eigenvector(edges), Seq("node"), "left")
    // pagerank's iterative jobs (the cache's main beneficiary) have run;
    // still-lazy parts of `out` recompute from the small edge frame —
    // correctness unaffected, and the cached RDD no longer leaks
    g.unpersist(blocking = false)
    out
  }

  /** Symmetric deduped adjacency (a, b) with a ≠ b — the undirected view
    * every centrality below works on. */
  private def symAdj(edges: DataFrame): DataFrame = {
    val Array(srcC, dstC) = edges.columns.take(2)
    val e = edges.select(col(srcC).cast("long").as("a"), col(dstC).cast("long").as("b"))
    e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
      .filter(col("a") =!= col("b")).distinct()
  }

  /** Closeness centrality (networkx wf_improved form):
    * C(v) = ((r-1)/(n-1)) · ((r-1)/S) with r = nodes reachable from v
    * (incl. v), S = sum of their shortest-path distances.
    *
    * Distributed multi-source BFS: the frontier table (source, node,
    * dist) grows toward ALL-PAIRS reachability — O(V²) state by nature,
    * like the metric itself. The reference only ever runs it on the
    * small per-chunk graphs of the clique step (recipes.py:2003-2034);
    * run it on bounded cluster subgraphs, not a 100 TB edge set. */
  def closeness(edges: DataFrame, maxIter: Int = 1000): DataFrame = {
    val adj = symAdj(edges).persist()
    val spark = edges.sparkSession
    val nodes = adj.select(col("a").as("node")).distinct().persist()
    val n = nodes.count()
    // seed: every node reaches itself at distance 0
    var reach = nodes.select(col("node").as("src"), col("node"), lit(0L).as("dist"))
      .localCheckpoint()
    var frontier = reach
    var iter = 0
    var growing = true
    while (growing && iter < maxIter) {
      // expand the frontier one hop; keep only first-time (src, node) pairs
      val next = frontier.join(adj, frontier("node") === adj("a"))
        .select(col("src"), col("b").as("node"), (col("dist") + 1).as("dist"))
        .distinct()
        .join(reach.select("src", "node").withColumn("__seen", lit(1)),
          Seq("src", "node"), "left")
        .filter(col("__seen").isNull).drop("__seen")
        .localCheckpoint()
      growing = next.limit(1).count() > 0
      if (growing) { reach = reach.unionByName(next).localCheckpoint(); frontier = next }
      iter += 1
    }
    // fail LOUD rather than return silently-truncated distances: a BFS
    // still growing at maxIter would under-count r and S for far nodes
    require(!growing,
      s"closeness: BFS still expanding after $maxIter hops — component " +
        "eccentricity exceeds maxIter; raise it or run on bounded subgraphs")
    val out = reach.groupBy("src")
      .agg(count(lit(1)).as("r"), sum("dist").as("s"))
      .withColumn("closeness",
        when(col("s") > 0 && lit(n) > 1,
          round(((col("r") - 1) / (lit(n) - 1.0)) * ((col("r") - 1) / col("s")), 4))
          .otherwise(lit(0.0)))
      .select(col("src").as("node"), col("closeness"))
    adj.unpersist(); nodes.unpersist()
    out
  }

  /** Square (4-cycle) clustering coefficient — networkx square_clustering:
    * per neighbor pair (u,w) of v, squares = common neighbors of u,w
    * minus v; potential = (k_u − degm) + (k_w − degm) + squares with
    * degm = squares + 1 + [u~w]; C4(v) = Σ squares / Σ potential.
    * All joins key on node ids — shuffle-friendly; the pair explosion is
    * Σ deg², so cap the hub degree upstream on skewed graphs. */
  def squareClustering(edges: DataFrame): DataFrame = {
    val adj = symAdj(edges).persist()
    val deg = adj.groupBy(col("a").as("id")).agg(count(lit(1)).as("k"))
    // common-neighbor counts per unordered pair (u < w)
    val cn = adj.select(col("a").as("x"), col("b").as("u"))
      .join(adj.select(col("a").as("x"), col("b").as("w")), Seq("x"))
      .filter(col("u") < col("w"))
      .groupBy("u", "w").agg(count(lit(1)).as("cn"))
    // neighbor pairs of each v (u < w), both in N(v)
    val pairs = adj.select(col("a").as("v"), col("b").as("u"))
      .join(adj.select(col("a").as("v"), col("b").as("w")), Seq("v"))
      .filter(col("u") < col("w"))
    val adjFlag = adj.select(col("a").as("u"), col("b").as("w"), lit(1).as("uw_adj"))
    val contrib = pairs
      .join(cn, Seq("u", "w"), "left")
      // v is always a common neighbor of u and w — exclude it
      .withColumn("squares", coalesce(col("cn"), lit(0L)) - 1)
      .join(adjFlag, Seq("u", "w"), "left")
      .join(deg.select(col("id").as("u"), col("k").as("ku")), Seq("u"))
      .join(deg.select(col("id").as("w"), col("k").as("kw")), Seq("w"))
      .withColumn("degm", col("squares") + 1 + coalesce(col("uw_adj"), lit(0)))
      .withColumn("potential",
        (col("ku") - col("degm")) + (col("kw") - col("degm")) + col("squares"))
    val out = contrib.groupBy(col("v").as("node"))
      .agg(sum("squares").as("sq"), sum("potential").as("pot"))
      .withColumn("square_clustering",
        when(col("pot") > 0, round(col("sq") / col("pot").cast("double"), 4))
          .otherwise(lit(0.0)))
      .select("node", "square_clustering")
    adj.unpersist()
    out
  }

  /** Eigenvector centrality: power iteration on the SHIFTED adjacency
    * (A+I), L2-normalized each step — the same recurrence as networkx's
    * iterative eigenvector_centrality (x += x_last before adding
    * neighbor mass). The shift keeps the operator's spectrum strictly
    * positive so the iteration converges on bipartite components (stars,
    * paths, even cycles — common dedup-cluster shapes) where plain A
    * oscillates with period 2; the principal eigenVECTOR is unchanged.
    * Each iteration is one join + one aggregate keyed on node id;
    * lineage is truncated per step so the plan stays flat. */
  def eigenvector(edges: DataFrame, iters: Int = 60): DataFrame = {
    val adj = symAdj(edges).persist()
    var x = adj.select(col("a").as("node")).distinct()
      .withColumn("score", lit(1.0)).localCheckpoint()
    var i = 0
    var degenerate = x.isEmpty // empty edge set → empty metrics, no jobs
    var converged = false
    while (i < iters && !degenerate && !converged) {
      val neigh = adj.join(x, adj("b") === x("node"))
        .groupBy(col("a").as("node")).agg(sum("score").as("nscore"))
      // (A+I)x: every node keeps its own previous score plus neighbor mass
      val next = x.select(col("node"), col("score").as("self"))
        .join(neigh, Seq("node"), "left")
        .select(col("node"),
          (col("self") + coalesce(col("nscore"), lit(0.0))).as("score"))
      // sum over an EMPTY frame is a null cell — guard before getDouble
      val normRow = next.agg(sum(col("score") * col("score"))).head()
      val norm2 = if (normRow.isNullAt(0)) 0.0 else normRow.getDouble(0)
      if (norm2 <= 0.0) { degenerate = true; x = next.limit(0).localCheckpoint() }
      else {
        val xNew = next.withColumn("score", col("score") / lit(math.sqrt(norm2)))
          .localCheckpoint()
        // convergence check (networkx-style) every 5 rounds — one extra
        // node-count-sized job, typically ending the loop well before
        // the iteration cap
        if (i % 5 == 4) {
          val d = xNew.join(x.withColumnRenamed("score", "prev"), Seq("node"))
            .agg(max(abs(col("score") - col("prev")))).head()
          converged = !d.isNullAt(0) && d.getDouble(0) < 1e-7
        }
        x = xNew
      }
      i += 1
    }
    val out = x.select(col("node"), round(col("score"), 4).as("eigenvector"))
    adj.unpersist()
    out
  }
}

package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-space clustering for corpus curation: nearest-centroid
  * assignment and cluster-balanced sampling (cap each cluster's
  * contribution — the diversity-enforcement step of modern data
  * curation pipelines, cf. cluster-based dedup/selection in SemDeDup
  * §2 and DataComp-LM-style pool balancing).
  *
  * The 100-TB shape: centroid sets are SMALL by construction (a
  * codebook of thousands at most — the same declared-small artifact
  * rule as the IVF centroid table, SCALE.md), so assignment never
  * shuffles the corpus. The centroids ride a one-row broadcast
  * (collect_list → crossJoin) and each row computes its argmin in a
  * row-local higher-order fold; balanced sampling adds the one
  * window-pruned exchange capPerKey always costs. */
object Cluster {

  /** Add `cluster_id` (+ `cluster_d2`, squared euclidean) — each row's
    * nearest centroid from `centroids(cidCol, cvecCol)`, ties broken by
    * smaller centroid id (deterministic). Vector arrays may be any
    * numeric type (cast to double per element). Rows whose vector is
    * NULL or whose length disagrees with every centroid get NULL
    * cluster columns — malformed embeddings are data, not errors. An
    * EMPTY codebook likewise yields NULL for every row (no centroid can
    * win); validate codebook non-emptiness upstream if that should be
    * fatal — this operator stays lazy (no job at plan build). */
  def clusterAssign(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, cidCol: String, cvecCol: String): DataFrame = {
    // one-row broadcast of the sorted codebook: array order IS the
    // tie-break (the fold keeps the earliest on equal distance), so
    // sort by centroid id — collect_list order is not deterministic
    val cents = broadcast(centroids
      .select(struct(col(cidCol).cast("long").as("cid"),
        transform(col(cvecCol), x => x.cast("double")).as("cv")).as("__c"))
      .agg(array_sort(collect_list(col("__c"))).as("__cents")))
    val vecD = transform(col(vecCol), x => x.cast("double"))
    // the "no centroid won yet" state is a NULL cid, not a sentinel id:
    // any long is a legitimate centroid id (this codebase itself uses
    // negative ids in fixtures), so a magic value would silently
    // swallow a real centroid
    val zero = struct(lit(null).cast("long").as("cid"),
      lit(Double.MaxValue).as("d2"))
    val best = aggregate(col("__cents"), zero, (acc, c) => {
      // zip_with pads length mismatches with NULL → NULL d2 → the
      // strict < keeps acc, so a bad-dimension centroid can never win
      val d2 = aggregate(
        zip_with(vecD, c.getField("cv"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (s, x) => s + x)
      when(d2 < acc.getField("d2"),
        struct(c.getField("cid").as("cid"), d2.as("d2"))).otherwise(acc)
    })
    df.crossJoin(cents)
      .withColumn("__best", when(col(vecCol).isNotNull, best))
      .withColumn("cluster_id", col("__best.cid"))
      .withColumn("cluster_d2",
        when(col("__best.cid").isNotNull, col("__best.d2")))
      .drop("__cents", "__best")
  }

  /** Fit a seeded k-means codebook over `df`'s vectors and return it as
    * a (cid, cv) DataFrame — feed to [[clusterAssign]] / persist for
    * reuse. Deterministic in (data, k, seed); the model's centroid
    * array is the driver-side declared-small artifact. */
  def fitCentroids(df: DataFrame, vecCol: String, k: Int,
      seed: Long = 42L): DataFrame = {
    require(k >= 1, s"fitCentroids needs k >= 1, got $k")
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val vec = df.select(array_to_vector(
      transform(col(vecCol), x => x.cast("double"))).as("__features"))
    val model = new KMeans().setK(k).setSeed(seed)
      .setFeaturesCol("__features").fit(vec)
    df.sparkSession.createDataFrame(
        model.clusterCenters.zipWithIndex.map { case (c, i) =>
          (i.toLong, c.toArray.toSeq)
        }.toIndexedSeq)
      .toDF("cid", "cv")
  }

  /** Cluster-balanced sample: assign, then keep at most `nPerCluster`
    * rows per cluster (deterministic md5-bucket order, salt re-rolls) —
    * bounds any one embedding region's contribution to the mix, the
    * cluster-level analogue of per-source caps. Unassignable rows
    * (NULL cluster) are KEPT: dropping them silently would make a batch
    * of malformed embeddings vanish from the corpus. */
  def balancedSample(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, cidCol: String, cvecCol: String,
      nPerCluster: Int, salt: String = ""): DataFrame = {
    val assigned = clusterAssign(df, idCol, vecCol, centroids, cidCol, cvecCol)
    val ok = assigned.filter(col("cluster_id").isNotNull)
    graft.operators.Ops.capPerKey(ok, "cluster_id", idCol, nPerCluster, salt)
      .unionByName(assigned.filter(col("cluster_id").isNull))
  }
}

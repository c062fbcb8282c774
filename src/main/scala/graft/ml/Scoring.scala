package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.{OneHotEncoder, StringIndexer, VectorAssembler}
import org.apache.spark.ml.regression.RandomForestRegressor
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ML re-scoring — build_model / apply_model
  * (/root/reference/code/recipes.py:1728-1898).
  *
  * Reference semantics kept:
  *  - `numerical` features: regex-selected columns cast to double,
  *    nulls → 0 (recipes.py:1616-1620);
  *  - `categorical` features: one-hot (DictVectorizer → StringIndexer +
  *    OneHotEncoder, recipes.py:1610-1614);
  *  - target binarized (>0 → 1.0, recipes.py:1785);
  *  - `tries` random train/test splits, keep the model with the best
  *    test ROC-AUC (recipes.py:1789-1805);
  *  - prediction written as round(100·p) (recipes.py:1806-1808).
  *
  * Spark-scale: training data sizes for entity-resolution re-scoring are
  * modest (the labeled subset); spark.ml distributes the fit when they
  * are not.
  */
object Scoring {

  case class BuiltModel(pipeline: PipelineModel, auc: Double, target: String)

  private def assemble(numerical: Seq[String], categorical: Seq[String]) = {
    val indexers = categorical.map(c =>
      new StringIndexer().setInputCol(c).setOutputCol(s"__idx_$c").setHandleInvalid("keep"))
    val encoders = categorical.map(c =>
      new OneHotEncoder().setInputCol(s"__idx_$c").setOutputCol(s"__oh_$c"))
    val assembler = new VectorAssembler()
      .setInputCols((numerical.map(c => s"__num_$c") ++ categorical.map(c => s"__oh_$c")).toArray)
      .setOutputCol("features")
    (indexers, encoders, assembler)
  }

  private def prep(df: DataFrame, numerical: Seq[String]): DataFrame =
    numerical.foldLeft(df) { (d, c) =>
      d.withColumn(s"__num_$c", coalesce(col(c).try_cast("double"), lit(0.0)))
    }

  /** Train with best-of-N random splits on test AUC. */
  def buildModel(df: DataFrame, numerical: Seq[String], categorical: Seq[String],
      target: String, tries: Int = 3, testSize: Double = 0.33,
      numTrees: Int = 20, seed: Long = 42L): BuiltModel = {
    // tries=0 would die later on results.head (NoSuchElement, no clue
    // which knob); testSize outside (0,1) makes randomSplit produce an
    // empty train or test split and fails deep inside the fit
    require(tries >= 1, s"tries must be >= 1, got $tries")
    require(testSize > 0 && testSize < 1,
      s"testSize must be in (0, 1), got $testSize")

    val (indexers, encoders, assembler) = assemble(numerical, categorical)
    val rf = new RandomForestRegressor()
      .setFeaturesCol("features").setLabelCol("__label")
      .setNumTrees(numTrees).setSeed(seed)
    val pipeline = new Pipeline().setStages(
      (indexers ++ encoders :+ assembler :+ rf).toArray)

    val prepped = prep(df, numerical)
      .withColumn("__label", when(col(target).cast("double") > 0, 1.0).otherwise(0.0))
    val evaluator = new BinaryClassificationEvaluator()
      .setLabelCol("__label").setRawPredictionCol("prediction")
      .setMetricName("areaUnderROC")

    val results = (0 until tries).map { i =>
      val Array(train, test) = prepped.randomSplit(Array(1 - testSize, testSize), seed + i)
      val model = pipeline.fit(train)
      val auc = evaluator.evaluate(model.transform(test))
      (model, auc)
    }
    // a one-class test split makes the evaluator return NaN, and Scala's
    // Double ordering ranks NaN ABOVE every number — never pick it over
    // an actually-evaluated model
    val evaluated = results.filterNot(_._2.isNaN)
    val (best, auc) = if (evaluated.nonEmpty) evaluated.maxBy(_._2) else results.head
    BuiltModel(best, auc, target)
  }

  /** Apply: predict into `targetCol` as round(100·p), the reference's
    * matchid_hit_score_ml convention. */
  def applyModel(df: DataFrame, model: BuiltModel, numerical: Seq[String],
      targetCol: String = "matchid_hit_score_ml"): DataFrame = {
    val scored = model.pipeline.transform(prep(df, numerical))
    scored.withColumn(targetCol, round(col("prediction") * 100).cast("long"))
      .drop("prediction", "features")
      .drop(scored.columns.filter(c => c.startsWith("__num_") || c.startsWith("__idx_") || c.startsWith("__oh_")).toIndexedSeq: _*)
  }

  def save(model: BuiltModel, path: String): Unit = model.pipeline.write.overwrite().save(path)
  def load(path: String, target: String): BuiltModel =
    BuiltModel(PipelineModel.load(path), Double.NaN, target)
}

package graft.aram

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{DecisionTreeRegressor, GBTRegressor, GeneralizedLinearRegression, LinearRegression, RandomForestRegressor}
import org.apache.spark.ml.{PredictionModel, Predictor}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MLlib-backed ensemble scorer — the engine-scope rebuild of the
  * reference's 5-model ensemble (`transformer/ranking/modeling.py`): k
  * regressors, per-model error estimated by GROUP-AWARE cross-validation
  * (folds = `xxhash64(match_id) mod k`, the deterministic leak-safe fold
  * assignment from SURVEY.md §2.9 — never row-level folds, which leak
  * teammates of a match across folds), ensemble weight wᵢ ∝ 1/MSEᵢ, final
  * score = Σ wᵢ·predᵢ. The model INTERNALS are MLlib's (xgb/lgb are not
  * reproduced — out of engine scope); the ensemble algebra, fold
  * discipline, and evaluation surface are the reference's.
  */
object MLScorer {

  final case class Trained(
      models: Map[String, PredictionModel[Vector, _]],
      weights: Map[String, Double],
      assembler: VectorAssembler)

  /** Five regressors matching the reference ensemble's arity
    * (`transformer/ranking/modeling.py:16-68`): three tree models plus two
    * linear ones (the stand-ins for xgb/lgb, whose internals are out of
    * engine scope).
    */
  def defaultModels(seed: Long): Map[String, Predictor[Vector, _, _]] = Map(
    "gbt" -> new GBTRegressor().setMaxIter(10).setMaxDepth(4).setSeed(seed),
    "rf" -> new RandomForestRegressor().setNumTrees(20).setMaxDepth(6).setSeed(seed),
    "dt" -> new DecisionTreeRegressor().setMaxDepth(6).setSeed(seed),
    "lr" -> new LinearRegression().setMaxIter(50).setRegParam(1e-4),
    "glr" -> new GeneralizedLinearRegression()
      .setFamily("gaussian").setLink("identity").setMaxIter(25).setRegParam(1e-4))

  /** Cross-validated MSE per model over `nFolds` hash folds of the group
    * column, then inverse-MSE weights and a full-train fit.
    */
  def fit(train: DataFrame, featureCols: Seq[String], labelCol: String,
      groupCol: String = "match_id", nFolds: Int = 5, seed: Long = 42L): Trained = {
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
    val assembled = assembler.transform(train)
      .select(col("features"), col(labelCol).as("label"), col(groupCol))
    val folded = Preprocess.hashFold(assembled, groupCol, nFolds).cache()
    folded.count()

    val models = defaultModels(seed)
    val mse: Map[String, Double] = models.map { case (name, est) =>
      val errs = (0 until nFolds).map { f =>
        val tr = folded.filter(col("fold") =!= f)
        val va = folded.filter(col("fold") === f)
        val m = est.fit(tr).asInstanceOf[PredictionModel[Vector, _]]
        m.transform(va)
          .select(avg(pow(col("prediction") - col("label"), 2)).as("mse"))
          .head().getDouble(0)
      }
      name -> errs.sum / nFolds
    }
    val weights = Ranking.inverseErrorWeights(mse)
    val fitted = models.map { case (name, est) =>
      name -> est.fit(folded).asInstanceOf[PredictionModel[Vector, _]]
    }
    folded.unpersist()
    Trained(fitted, weights, assembler)
  }

  /** Score: per-model prediction columns + the weighted ensemble sum. */
  def score(trained: Trained, df: DataFrame, as: String = "predicted_score"): DataFrame = {
    val assembled = trained.assembler.transform(df)
    val withPreds = trained.models.foldLeft(assembled) { case (acc, (name, m)) =>
      m.transform(acc.withColumnRenamed("features", "features"))
        .withColumnRenamed("prediction", s"pred_$name")
    }
    withPreds.withColumn(as,
      Ranking.ensembleScore(trained.weights.map { case (k, w) => s"pred_$k" -> w }))
  }

  /** O3 — per-feature importances across the tree models, as the long
    * (feature, model, importance) table [[Ranking.topImportances]] expects.
    */
  def importances(trained: Trained, featureCols: Seq[String]): Seq[(String, String, Double)] =
    trained.models.toSeq.flatMap { case (name, m) =>
      val imps: Option[Vector] = m match {
        case g: org.apache.spark.ml.regression.GBTRegressionModel => Some(g.featureImportances)
        case r: org.apache.spark.ml.regression.RandomForestRegressionModel => Some(r.featureImportances)
        case d: org.apache.spark.ml.regression.DecisionTreeRegressionModel => Some(d.featureImportances)
        case _ => None
      }
      imps.toSeq.flatMap(v => featureCols.zipWithIndex.map { case (f, i) => (f, name, v(i)) })
    }
}

package graft.aram

import org.apache.spark.sql.DataFrame

/** End-to-end analytics pipeline — the reference's
  * `test_modeling.test_full_pipeline` (E3, SURVEY.md §3): raw match docs →
  * features → labels → leak-safe split → fitted preprocessing → scoring →
  * per-match predicted ranks → evaluation. The sklearn/xgb model internals
  * are out of engine scope (SURVEY.md §2.9); scoring is pluggable — any
  * function producing a `predicted_score` column (an MLlib model's
  * prediction, a rule expression, precomputed columns) slots in.
  *
  * Plan shape: the only shuffles in the whole pipeline are the two window
  * partitions (match_id; match_id×team), the distinct for split keys, and
  * the final metric aggregates — everything else is narrow projections, so
  * the pipeline scales with input size, not with operator count.
  */
object Pipeline {

  /** All fitted state for the transform side, learned on train ONLY. */
  final case class Fitted(
      encoder: Preprocess.EncoderModel,
      clip: Preprocess.ClipModel,
      scaler: Preprocess.RobustScalerModel)

  val clipCols: Seq[String] = Seq("kda", "damage_per_min", "gold_per_min")

  /** Fit preprocessing on the train split (encode → derive → clip → scale
    * over the 23 model features) — `feature_factory.prepare_features` +
    * `fit_transform`.
    */
  def fit(train: DataFrame): Fitted = {
    val encoder = Preprocess.fitEncoder(train, "champion")
    val derived = Preprocess.derivedFeatures(encoder(train))
    val clip = Preprocess.fitClip(derived, clipCols)
    val scaler = Preprocess.fitRobustScaler(clip(derived), Preprocess.modelFeatureCols)
    Fitted(encoder, clip, scaler)
  }

  /** Apply fitted preprocessing (same transforms, train statistics). */
  def transform(fitted: Fitted, df: DataFrame): DataFrame =
    fitted.scaler(fitted.clip(Preprocess.derivedFeatures(fitted.encoder(df))))

  /** A deterministic rule-based scorer standing in for the model ensemble:
    * a weighted sum over scaled features (the ensemble-combination algebra
    * `modeling.py:145-169` with rule "models").
    */
  def ruleScorer(weights: Map[String, Double]): DataFrame => DataFrame =
    df => df.withColumn("predicted_score", Ranking.ensembleScore(weights))

  /** Full run: label, split, fit on train, score both sides, rank, report.
    * Returns (labeled+ranked test split, evaluation metrics row).
    */
  def run(matches: DataFrame, scorer: DataFrame => DataFrame,
      testFraction: Double = 0.2, seed: Long = 42L): (DataFrame, DataFrame) = {
    val labeled = Labeling.label(PlayerFeatures.extract(matches))
    val (train, test) = Preprocess.splitByGroup(labeled, "match_id", testFraction, seed)
    val fitted = fit(train)
    val scoredTest = scorer(transform(fitted, test))
    val ranked = Ranking.predictedRanks(scoredTest, "predicted_score",
      Seq("match_id"), "puuid")
    val metrics = graft.ops.Aggregates.rankAccuracy(ranked, "rank_in_match", "predicted_rank")
    (ranked, metrics)
  }
}

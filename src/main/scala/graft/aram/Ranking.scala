package graft.aram

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prediction-side ranking and ensemble scoring — the reference's
  * `modeling.py` surface minus the sklearn model internals (out of engine
  * scope, SURVEY.md §2.9): what the engine owns is "combine k score columns
  * with learned weights, then rank per match".
  */
object Ranking {

  /** W2 — per-group ordinal rank of a predicted score, descending: numpy's
    * double-argsort (`transformer/ranking/modeling.py:172-212`) ≡
    * `ROW_NUMBER()`. The reference breaks ties by input order
    * (nondeterministic); we require an explicit tie-break column.
    * `groupCols` empty reproduces the ungrouped variant (`match_ids is
    * None`) — a single global ordering; fine for model evaluation sizes,
    * flagged as single-partition at scale.
    */
  def predictedRanks(df: DataFrame, scoreCol: String, groupCols: Seq[String],
      tieBreak: String, as: String = "predicted_rank"): DataFrame = {
    val w = (if (groupCols.isEmpty) Window.partitionBy()
             else Window.partitionBy(groupCols.map(col): _*))
      .orderBy(col(scoreCol).desc, col(tieBreak).asc)
    df.withColumn(as, row_number().over(w).cast("double"))
  }

  /** Inverse-error ensemble weights (`modeling.py:130-142`): wᵢ =
    * (1/mseᵢ) / Σⱼ(1/mseⱼ). Driver-side scalar math on a k-entry map, as in
    * the reference.
    */
  def inverseErrorWeights(mse: Map[String, Double]): Map[String, Double] = {
    val inv = mse.map { case (k, v) => k -> 1.0 / v }
    val z = inv.values.sum
    inv.map { case (k, v) => k -> v / z }
  }

  /** Weighted-ensemble score column: Σ wᵢ·scoreᵢ (`modeling.py:145-169`
    * without the model internals — score columns come from any scorer:
    * MLlib model output, a rule-based expression, or precomputed columns).
    */
  def ensembleScore(weights: Map[String, Double]): Column =
    weights.map { case (c, w) => col(c) * w }.reduce(_ + _)

  /** O3 — top-k feature importances: mean/std per feature across model
    * columns, sorted desc, limit k (`modeling.py:215-243`). Input is a
    * (feature, model, importance) long table; the unpivot (`stack`) happens
    * upstream.
    */
  def topImportances(long: DataFrame, k: Int = 10): DataFrame =
    long.groupBy("feature")
      .agg(avg(col("importance")).as("mean_importance"),
        stddev_samp(col("importance")).as("std_importance"))
      .orderBy(col("mean_importance").desc, col("feature").asc)
      .limit(k)
}

package graft.aram

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Labeling: composite performance score + per-match rank — the reference's
  * `calculate_performance_labels` (`transformer/ranking/feature_factory.py:
  * 111-144`). The row-wise `df.apply(score_player, axis=1)` becomes a single
  * codegen'd Column expression; the pandas `rank(method='min',
  * ascending=False)` is SQL `RANK()` exactly (ties share the lowest rank).
  */
object Labeling {

  /** The 6-term weighted score with the ×1.1 win bonus
    * (`feature_factory.py:121-137`). Exposed as a composable Column so the
    * same expression serves batch, streaming and the testdata flagship.
    */
  def performanceScore(
      kda: Column, dpm: Column, killParticipation: Column, gpm: Column,
      deathShare: Column, goldEfficiency: Column, win: Column): Column = {
    val base =
      kda * 0.25 +
      dpm / 1000 * 0.20 +
      killParticipation * 0.15 +
      gpm / 500 * 0.10 +
      (lit(1) - deathShare) * 0.15 +
      goldEfficiency * 0.15
    when(win, base * 1.1).otherwise(base)
  }

  /** Score every player row and rank within the match (1 = best). */
  def label(features: DataFrame): DataFrame = {
    val scored = features.withColumn("performance_score",
      performanceScore(col("kda"), col("damage_per_min"), col("kill_participation"),
        col("gold_per_min"), col("death_share"), col("gold_efficiency"), col("win")))
    scored.withColumn("rank_in_match",
      rank().over(Window.partitionBy(col("match_id")).orderBy(col("performance_score").desc))
        .cast("double"))
  }
}

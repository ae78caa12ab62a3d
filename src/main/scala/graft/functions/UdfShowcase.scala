package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/** The Scala-UDF tier of the function surface — provided ONCE, as the
  * reference's `df.apply(score_player, axis=1)` row function
  * (`transformer/ranking/feature_factory.py:121-137`) demonstrates the
  * escape hatch, and deliberately nowhere else: a closure UDF is an opaque
  * box to Catalyst (no predicate pushdown through it, no constant folding,
  * no whole-stage codegen fusion — every call crosses the
  * serialization boundary). Preference order stays: built-in Column
  * functions > custom codegen'd `Expression`
  * ([[PerformanceScoreExpr]]) > Scala UDF.
  */
object UdfShowcase {

  val scoreUdf = udf {
    (kda: Double, dpm: Double, kp: Double, gpm: Double,
     deathShare: Double, goldEff: Double, win: Boolean) =>
      val base = kda * 0.25 + dpm / 1000 * 0.20 + kp * 0.15 + gpm / 500 * 0.10 +
        (1 - deathShare) * 0.15 + goldEff * 0.15
      if (win) base * 1.1 else base
  }

  def score(kda: Column, dpm: Column, kp: Column, gpm: Column,
      deathShare: Column, goldEff: Column, win: Column): Column =
    scoreUdf(kda, dpm, kp, gpm, deathShare, goldEff, win)

  def register(spark: SparkSession): Unit = {
    spark.udf.register("performance_score_udf", scoreUdf)
    ()
  }
}

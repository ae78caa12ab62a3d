package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multivariate z-score outlier detection with a diagonal covariance
  * ("Mahalanobis-lite") — the multi-feature sibling of the univariate
  * robust gates already in the library (grouped MAD, winsorize): a row
  * is anomalous when its JOINT deviation across k features is large,
  *   score = Σ_j ((x_j − μ_j) / σ_j)²,
  * even if no single feature trips its own gate. The screening pass
  * before expensive per-row inspection — chi-square-distributed under
  * normality, so thresholds transfer across feature sets of the same k.
  *
  * Exactness: callers pass INTEGRAL feature columns (the repo's
  * quantize-upstream idiom), so per-group Σx and Σx² are exact longs
  * from ONE map-side-combined aggregate; μ, σ² = (Σx² − Σx·Σx/n)/(n−1)
  * and every z are fixed IEEE expressions of exact operands, mirrored
  * textually by the oracles. A feature with σ = 0 (or a group with
  * n < 2) contributes 0 to the score — a constant column certifies
  * nothing — rather than NaN-poisoning the row.
  *
  * Scale shape: one moments aggregate to |groups|·k numbers, joined
  * back (AQE broadcasts the taxonomy-sized stats) into a narrow scoring
  * projection. Nothing is collected; no window.
  */
object Outliers {

  /** Returns `df` + `score` (and per-feature stats left out — the stats
    * join is internal). Null group rows are excluded; a null feature
    * value contributes 0 to that row's score (scored on the features it
    * has).
    */
  def zScoreMulti(df: DataFrame, groupCol: String,
                  valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty)
    val aggs = valueCols.flatMap { c =>
      val v = col(c).cast("long")
      Seq(sum(v).as(s"__sx_$c"), sum(v * v).as(s"__sx2_$c"),
        count(v).as(s"__n_$c"))
    }
    val stats = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
    val scored = df.filter(col(groupCol).isNotNull).join(stats, Seq(groupCol))
    val score = valueCols.map { c =>
      val n = col(s"__n_$c")
      val mu = col(s"__sx_$c").cast("double") / n
      val varr = (col(s"__sx2_$c").cast("double") -
        col(s"__sx_$c").cast("double") * col(s"__sx_$c") / n) / (n - 1)
      val z = (col(c).cast("double") - mu) / sqrt(varr)
      when(n >= 2 && varr > 0 && col(c).isNotNull, z * z).otherwise(lit(0.0))
    }.reduce(_ + _)
    scored.withColumn("score", score)
      .drop(valueCols.flatMap(c =>
        Seq(s"__sx_$c", s"__sx2_$c", s"__n_$c")): _*)
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Extreme-value tail pricing over grouped series — the monitoring
  * family's answer to "how bad can a day get?": a mean or a quantile
  * prices the bulk; capacity planning and SLA risk read the TAIL.
  * Gumbel block-maxima (the domain of attraction of light-tailed
  * maxima, Gumbel 1958) gives the return level "the daily maximum
  * exceeded once per T blocks"; the mean-excess table is the
  * peaks-over-threshold diagnostic that picks the threshold before any
  * GPD-style fit is trusted (Davison & Smith 1990).
  *
  * Exactness discipline: block maxima are exact longs; moment sums are
  * decimal(38,0); every readout is a fixed IEEE expression of those
  * exact operands with shared literal constants (√6/π, Euler γ), so
  * both engines replay it bit-identically (callers qround).
  */
object Extremes {

  private val dec = DecimalType(38, 0)
  private val dec19 = DecimalType(19, 0)

  /** √6/π — the Gumbel method-of-moments scale factor, shared as ONE
    * double literal with the oracle SQL.
    */
  val Sqrt6OverPi = 0.779696801233676

  /** Euler–Mascheroni γ, same sharing contract. */
  val EulerGamma = 0.5772156649015329

  /** Gumbel fit on per-(group, block) maxima by the method of moments:
    *
    *   β = s·√6/π,   μ = m̄ − γ·β,
    *   x_T = μ − β·ln(−ln(1 − 1/T))     (the T-block return level)
    *
    * Output one row per group: (group, n_blocks, block_max_mean, mu,
    * beta, x_t). NULL fit when n_blocks < 2 or the maxima are constant.
    *
    * Scale shape: one map-side-combined (group, block) max collapse —
    * the only corpus-mass shuffle — then a ≤|groups| moment aggregate.
    */
  def gumbelFit(df: DataFrame, groupCol: String, blockCol: String,
      valueCol: String, returnPeriod: Int = 10): DataFrame = {
    require(returnPeriod >= 2, s"returnPeriod must be >= 2, got $returnPeriod")
    val maxima = df
      .filter(col(groupCol).isNotNull && col(blockCol).isNotNull &&
        col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("g"), col(blockCol).as("b"))
      .agg(max(col(valueCol).cast("long")).as("m"))
    val agg = maxima.groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        sum(col("m").cast(dec)).as("sm"),
        sum((col("m").cast(dec19) * col("m").cast(dec19)).cast(dec)).as("sm2"))
    val nd = col("n").cast("double")
    val mean = col("sm").cast("double") / nd
    val s = sqrt((nd * col("sm2").cast("double") -
      col("sm").cast("double") * col("sm").cast("double")) /
      (nd * (nd - 1.0)))
    val beta = s * Sqrt6OverPi
    val mu = mean - lit(EulerGamma) * beta
    val xt = mu - beta *
      log(-log(lit(1.0) - lit(1.0) / returnPeriod))
    agg.select(col("g").as(groupCol), col("n").as("n_blocks"),
      mean.as("block_max_mean"),
      when(col("n") > 1 && s > 0, mu).as("mu"),
      when(col("n") > 1 && s > 0, beta).as("beta"),
      when(col("n") > 1 && s > 0, xt).as("x_t"))
  }

  /** Mean-excess table over a caller-supplied threshold grid: for each
    * (group, u), the count of exceedances and the mean excess
    * E[x − u | x > u] — rising-linear mean excess reads as heavy tail,
    * flat as exponential; the knee picks the POT threshold.
    *
    * Exactness: exceedance counts and Σ(x − u) are exact longs (the
    * value is integral by the cents contract); one division per cell.
    *
    * Scale shape: thresholds bind as literals (×|grid| narrow explode of
    * the filtered rows), ONE (group, u) map-side-combined aggregate.
    */
  def meanExcess(df: DataFrame, groupCol: String, valueCol: String,
      thresholds: Seq[Long]): DataFrame = {
    require(thresholds.nonEmpty, "meanExcess needs at least one threshold")
    val base = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(valueCol).cast("long").as("x"))
      .withColumn("u", explode(typedLit(thresholds.sorted)))
      .filter(col("x") > col("u"))
    base.groupBy(col("g").as(groupCol), col("u"))
      .agg(count(lit(1)).as("n_exceed"),
        sum(col("x") - col("u")).as("sum_excess"))
      .select(col(groupCol), col("u"), col("n_exceed"),
        (col("sum_excess").cast("double") / col("n_exceed"))
          .as("mean_excess"))
  }
}

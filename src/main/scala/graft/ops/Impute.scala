package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fit/apply missing-value imputation — the preprocessing step between
  * the reference's fillna(-1) sentinel (categorical, covered by the P8
  * encoder) and model training for NUMERIC features: nulls take their
  * group's fitted central value instead of a magic number that skews
  * distributions.
  *
  * Fit rides [[Aggregates.groupedQuantilesCont]] (distinct-value
  * collapse + one bounded cumulative window — never a per-group sort of
  * raw rows), so the fitted table is taxonomy-sized and the exact-median
  * semantics match `quantile_cont` cross-engine; inputs follow the
  * repo's fixed-point discipline (long cents), where a .5 interpolation
  * is exact in doubles.
  *
  * Apply is a broadcast left join + coalesce — a narrow map over the
  * corpus. Groups unseen at fit time keep their nulls (imputing an
  * unknown group with a global value is a silent distribution shift;
  * callers opt into that by unioning a default row instead).
  */
object Impute {

  /** Per-group exact median of a fixed-point (long) column, nulls
    * excluded: (groupCol, median: double).
    */
  def fitGroupMedian(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    Aggregates.groupedQuantilesCont(df, groupCol, valueCol, Seq(0.5 -> "__med"))
      .select(col(groupCol), col("__med").as("median"))

  /** Fill `valueCol` nulls with the fitted group median into `outCol`
    * (double — the median interpolates). Non-null values pass through
    * cast to double; unseen groups keep null.
    */
  def applyGroupMedian(df: DataFrame, medians: DataFrame, groupCol: String,
                       valueCol: String, outCol: String): DataFrame =
    df.join(broadcast(medians.select(col(groupCol), col("median").as("__med"))),
        Seq(groupCol), "left_outer")
      .withColumn(outCol, coalesce(col(valueCol).cast("double"), col("__med")))
      .drop("__med")
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed prefix sum (cumulative sum over a global order).
  *
  * The naive formulation — `sum(...).over(Window.orderBy(...))` with no
  * partition — funnels the whole dataset through ONE reducer and is the
  * classic accidental serialization. This is the two-pass scan instead:
  *
  *   1. range-partition by the order columns (parallel sort shape);
  *   2. per-partition local cumulative sums (window partitioned by the
  *      physical partition id — as many parallel window groups as range
  *      partitions);
  *   3. per-partition totals (one tiny row per partition) turned into
  *      exclusive offsets, joined back and added.
  *
  * Parallelism stays at the range-partition count end to end; the only
  * single-partition step is the offset scan over `numPartitions` rows.
  */
object PrefixScan {

  /** Adds `outCol` = cumulative sum of `valueCol` over the total order
    * given by `orderCols` (which must be a unique key for deterministic
    * results). Input column set is preserved.
    */
  def cumulativeSum(df: DataFrame, orderCols: Seq[String], valueCol: String,
      outCol: String = "cum_sum", numParts: Option[Int] = None): DataFrame = {
    val n = numParts.getOrElse(df.sparkSession.sessionState.conf.numShufflePartitions)
    val order = orderCols.map(col)
    // checkpoint so the two consumers below see one materialization — the
    // range bounds come from sampling, so re-evaluating the exchange per
    // consumer could disagree on partition ids
    val parted = df.repartitionByRange(n, order: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false)
    val local = parted.withColumn("__local",
      sum(col(valueCol)).over(Window.partitionBy("__pid").orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // numPartitions rows: the single-partition window here scans ~n rows
    val offsets = parted.groupBy("__pid").agg(sum(col(valueCol)).as("__psum"))
      .withColumn("__offset", coalesce(
        sum(col("__psum")).over(Window.orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__offset")
    local.join(offsets, "__pid")
      .withColumn(outCol, col("__local") + col("__offset"))
      .drop("__pid", "__local", "__offset")
  }
}

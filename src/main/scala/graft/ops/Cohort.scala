package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention: users grouped by first-seen day, activity counted
  * per (cohort, day-offset) cell. The behavioral-analytics readout the
  * reference's match-history pipeline feeds downstream dashboards from
  * (its per-player first/last-seen scans in loader/match_crawler.py), as
  * a single declarative plan.
  *
  * Scale shape: three shuffles, all map-side combined —
  *   1. first-seen per user (corpus → |users| rows, min-combiner);
  *   2. the activity join back on the user key (corpus-mass equi-join;
  *      hint-free — the cohort table grows with the data, AQE broadcasts
  *      only when it truly fits, the J2/J5 discipline);
  *   3. the (cohort, offset, user) distinct collapse then the
  *      (cohort, offset) count — distinct-first keeps the count aggregate
  *      exact without countDistinct's expand.
  * Cohort sizes (|cohort-days| rows) re-aggregate the first-seen table
  * and come back on a broadcast join. Nothing is row-proportional on the
  * driver; cell count is bounded by days², not corpus size.
  */
object Cohort {

  /** → (cohort_day, day_offset, active_users, cohort_size, retention):
    * one row per cohort × offset cell that has at least one active user;
    * retention = active/size, the single float division. Null users or
    * timestamps are excluded everywhere (cohorts and activity alike).
    */
  def retention(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val base = df.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("d"))
    val firstSeen = base.groupBy(col("u")).agg(min(col("d")).as("cohort_day"))
    val sizes = firstSeen.groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("cohort_size"))
    val cells = base.join(firstSeen, Seq("u"))
      .select(col("cohort_day"), datediff(col("d"), col("cohort_day"))
        .cast("long").as("day_offset"), col("u"))
      .distinct()
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("active_users"))
    cells.join(broadcast(sizes), Seq("cohort_day"))
      .select(col("cohort_day"), col("day_offset"), col("active_users"),
        col("cohort_size"),
        (col("active_users").cast("double") / col("cohort_size"))
          .as("retention"))
  }

  /** Cohort LTV curve — [[retention]]'s revenue twin and the readout a
    * payback-period decision actually needs: cumulative revenue per user
    * by cohort age. For each (cohort_day, day_offset):
    *
    *   ltv = Σ_{o ≤ offset} revenue(cohort, o) / cohort_size
    *
    * `valueCol` must be integral (cents idiom) so per-cell revenue and
    * the cumulative sums are exact longs; ltv is one division of exact
    * operands. A cohort's curve is defined at its OBSERVED activity
    * offsets (quiet days carry no row — the cumulative still includes
    * them implicitly, matching [[retention]]'s cell granularity).
    *
    * Scale shape: one first-seen collapse (the [[retention]] aggregate),
    * one (cohort, offset) revenue aggregate, ONE cumulative window whose
    * partitions are cohort-size-in-days — never row count. Sizes
    * broadcast back.
    */
  def ltvCurve(df: DataFrame, userCol: String, tsCol: String,
               valueCol: String): DataFrame = {
    val v = col(valueCol).cast("long")
    val base = df
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull && v.isNotNull)
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("d"), v.as("x"))
    val firstSeen = base.groupBy(col("u")).agg(min(col("d")).as("cohort_day"))
    val sizes = firstSeen.groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("cohort_size"))
    val cells = base.join(firstSeen, Seq("u"))
      .groupBy(col("cohort_day"),
        datediff(col("d"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(sum(col("x")).as("rev"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy("cohort_day").orderBy(col("day_offset").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    cells
      .withColumn("cum_rev", sum(col("rev")).over(wCum))
      .join(broadcast(sizes), Seq("cohort_day"))
      .select(col("cohort_day"), col("day_offset"), col("rev"),
        col("cum_rev"), col("cohort_size"),
        (col("cum_rev").cast("double") / col("cohort_size")).as("ltv"))
  }
}

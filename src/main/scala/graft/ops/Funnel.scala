package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered funnel conversion: how many users complete stage k STRICTLY
  * after completing stages 1..k-1 (event order matters — a purchase
  * before the first view does not convert). Extends the reference's
  * per-match event sequencing (transformer/labeling orders timeline rows
  * before scoring) to the multi-stage acquisition readout.
  *
  * Scale shape: one pass per stage, each a type-filtered scan (the
  * equality predicate pushes to parquet) aggregated to |users| rows with
  * a min-combiner, then a user-keyed equi-join against the shrinking
  * reached-set — hint-free, AQE broadcasts when the survivor set fits.
  * No per-user event-list materialization, no window over the corpus;
  * stage count is a query constant, so the driver loop is bounded the
  * same way BPE's merge rounds are. The final readout window runs over
  * |stages| rows.
  */
object Funnel {

  /** → (stage_idx, stage, users, conv_from_start, conv_from_prev), one
    * row per stage. `conv_from_start` = users / stage-1 users;
    * `conv_from_prev` = users / previous-stage users (1.0 for stage 1).
    * Completion time of stage k is the earliest event of `stages(k)`
    * strictly after the user's stage-(k-1) completion time.
    */
  def conversion(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    val base = df.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("u"), col(tsCol).as("ts"), col(typeCol).as("et"))
    // each reached-set is |users| rows max; the checkpoint cut makes every
    // stage's corpus scan run exactly once (stage k's count would otherwise
    // re-derive the whole join chain below it)
    val first = base.filter(col("et") === stages.head)
      .groupBy(col("u")).agg(min(col("ts")).as("t"))
      .localCheckpoint(false)
    val reached = stages.tail.scanLeft(first) { (prev, stage) =>
      base.filter(col("et") === stage).as("e")
        .join(prev.select(col("u"), col("t").as("pt")).as("p"), Seq("u"))
        .filter(col("ts") > col("pt"))
        .groupBy(col("u")).agg(min(col("ts")).as("t"))
        .localCheckpoint(false)
    }
    val counts = reached.zip(stages).zipWithIndex.map { case ((r, st), i) =>
      r.agg(count(lit(1)).cast("long").as("users"))
        .select(lit(i + 1L).as("stage_idx"), lit(st).as("stage"), col("users"))
    }.reduce(_ unionByName _)
    // |stages| rows: the single-partition window is bounded by the query
    val w = Window.orderBy(col("stage_idx"))
    counts
      .withColumn("conv_from_start",
        col("users").cast("double") / first_value(col("users")).over(w))
      .withColumn("conv_from_prev",
        col("users").cast("double") /
          coalesce(lag(col("users"), 1).over(w), col("users")))
  }
}

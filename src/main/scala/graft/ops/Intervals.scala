package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Interval union / gaps-and-islands statistics per key — the relational
  * primitive behind "total covered time", billing-overlap collapse, and
  * availability math: given per-key [start, end) intervals, merge every
  * overlapping-or-touching run into an island and report the exact
  * covered length (double-counting removed — what a plain SUM of
  * durations gets wrong the moment two intervals overlap).
  *
  * The classic sweep: intervals ordered by (start, end); one starts a
  * NEW island iff its start exceeds the running max end of every
  * earlier interval. Island ids are the cumulative count of those
  * flags; per-island extents aggregate to (key) totals.
  *
  * Exactness: starts/ends are exact longs (epoch seconds, cents — the
  * caller's grid); flags, island ids, extents and every emitted length
  * are integer arithmetic end to end. Zero float surface.
  *
  * Scale shape: ONE shuffle on the key (both windows and both
  * aggregates share the (key) partitioning; the windows sort within the
  * key's partition only — never a global sort). Nothing is collected.
  */
object Intervals {

  def unionStats(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val base = df
      .filter(col(keyCol).isNotNull && col(startCol).isNotNull &&
        col(endCol).isNotNull &&
        col(endCol).cast("long") >= col(startCol).cast("long"))
      .select(col(keyCol).as("k"), col(startCol).cast("long").as("s"),
        col(endCol).cast("long").as("e"))
    val wOrd = Window.partitionBy("k").orderBy(col("s").asc, col("e").asc)
    val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    val flagged = base
      .withColumn("maxe", max(col("e")).over(wPrev))
      .withColumn("new_island",
        when(col("maxe").isNull || col("s") > col("maxe"), 1L).otherwise(0L))
      .withColumn("island",
        sum(col("new_island")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val islands = flagged.groupBy(col("k"), col("island"))
      .agg(min(col("s")).as("is_start"), max(col("e")).as("is_end"),
        count(lit(1)).as("n_in_island"))
    islands.groupBy(col("k").as(keyCol))
      .agg(sum(col("n_in_island")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("is_end") - col("is_start")).as("covered"),
        (max(col("is_end")) - min(col("is_start"))).as("span"))
      .withColumn("gap_total", col("span") - col("covered"))
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, the right row with the
  * greatest timestamp ≤ the left row's timestamp, per key — the canonical
  * event-alignment operator (each purchase matched to the most recent
  * prior page view; each trade to the prevailing quote).
  *
  * Built by COMPOSITION (tier (a) of the custom-operator ladder — no
  * custom strategy needed): union both sides tagged, sort each key
  * partition by (ts, side) with right rows ordered before left rows at
  * equal timestamps (≤ semantics), carry the last non-null right payload
  * forward with an ordered window, then keep the left rows. One shuffle on
  * the key — the same cost as a plain sort-merge join, with none of the
  * range-condition blowup a theta-join formulation would pay. Matches
  * DuckDB's native `ASOF JOIN` row-for-row (the oracle for `q_asof_join`).
  */
object AsOfJoin {

  /** `left`/`right` must share `keyCols` and `tsCol`; all other columns are
    * carried through — left columns as-is, right columns prefixed `r_`.
    * Unmatched left rows keep null right columns (left-outer semantics;
    * filter `r_<ts> IS NOT NULL` for inner).
    */
  def backward(left: DataFrame, right: DataFrame, keyCols: Seq[String], tsCol: String): DataFrame = {
    val leftPayload = left.columns.filterNot(c => keyCols.contains(c))
    val rightPayload = right.columns.filterNot(c => keyCols.contains(c))

    val l = left.select(
      keyCols.map(col) ++ Seq(col(tsCol).as("__ts"), lit(1).as("__side"),
        struct(leftPayload.map(col): _*).as("__l"), lit(null).cast(
          right.select(struct(rightPayload.map(col): _*)).schema.head.dataType).as("__r")): _*)
    val r = right.select(
      keyCols.map(col) ++ Seq(col(tsCol).as("__ts"), lit(0).as("__side"),
        lit(null).cast(left.select(struct(leftPayload.map(col): _*)).schema.head.dataType).as("__l"),
        struct(rightPayload.map(col): _*).as("__r")): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val leftCols = keyCols.map(col) ++ leftPayload.map(c => col(s"__l.$c").as(c))
    val rightCols = rightPayload.map(c => col(s"__match.$c").as(s"r_$c"))
    matched.select(leftCols ++ rightCols: _*)
  }
}

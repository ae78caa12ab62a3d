package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension build: turn an observation log
  * (key, event-time, attributes) into versioned validity intervals —
  * the standard way a warehouse keeps dimension history, and the shape a
  * training-data pipeline needs to join facts against *point-in-time*
  * attributes without leakage (the as-of-join's write-side counterpart).
  *
  * Semantics: per key, observations are ordered by (ts, tieBreak…); runs
  * of consecutive observations whose attribute tuple is unchanged
  * (null-safe compare, `<=>`) collapse into one version. Each surviving
  * change opens a version at its observation time; `valid_to` is the next
  * version's `valid_from` (half-open intervals, NULL = current), and
  * `version` numbers a key's history from 1.
  *
  * Scale shape: ONE hash exchange on the key. The physical plan is
  * Window(lag) → Filter → Window(lead + row_number): the filter preserves
  * both the partitioning and the sort order, so the second window adds no
  * exchange and no re-sort — per-key history never leaves its partition,
  * and key cardinality (not log length) bounds state. No driver
  * participation at any point.
  */
object Scd2 {

  /** obs → (key…, attrs…, valid_from, valid_to, version).
    *
    * @param keyCols  dimension identity (hash-partitioning key)
    * @param tsCol    event-time column (becomes `valid_from`)
    * @param tieCols  deterministic tie-break within equal timestamps
    * @param attrCols tracked attributes; a null-safe change in ANY opens
    *                 a new version
    */
  def build(obs: DataFrame, keyCols: Seq[String], tsCol: String,
            tieCols: Seq[String], attrCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty, "need keys and attrs")
    val order = (tsCol +: tieCols).map(col(_).asc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)

    // a row opens a version iff it is the key's first observation or any
    // attribute differs (null-safely) from the previous observation
    val changed: Column = attrCols
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    val opens = obs
      .withColumn("_rn", row_number().over(w))
      .withColumn("_open", col("_rn") === 1 || changed)
      .filter(col("_open"))

    // same partitioning AND order as `w` — planner reuses the exchange+sort
    val wv = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    opens.select(
      keyCols.map(col) ++ attrCols.map(col) ++ Seq(
        col(tsCol).as("valid_from"),
        lead(col(tsCol), 1).over(wv).as("valid_to"),
        row_number().over(wv).cast("long").as("version")): _*)
  }
}

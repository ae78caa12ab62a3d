package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function operators (SURVEY.md §2.4).
  *
  * The reference computes two distinct rankings whose tie semantics differ —
  * the single most test-worthy distinction in the pipeline:
  *
  *  - W1: pandas `rank(method='min', ascending=False)` per match
  *    (`transformer/ranking/feature_factory.py:139-142`) ≡ SQL `RANK()` —
  *    ties share the lowest rank, gaps follow.
  *  - W2: numpy double-argsort per match (`transformer/ranking/modeling.py:
  *    172-212`) ≡ SQL `ROW_NUMBER()` — ordinal, ties broken by input order.
  *    Input order is nondeterministic in a distributed engine, so we require
  *    an explicit deterministic tie-break column (the reference's "input
  *    order" is itself Mongo cursor order, i.e. unspecified).
  *
  * Also A1: the per-(match, team) death total that the reference builds as a
  * Python dict and probes per row (`data_extractor.py:75-81` →
  * `feature_factory.py:57-60`). A window sum avoids the join entirely — one
  * shuffle on the partition keys, then a streaming aggregation within each
  * partition. At 100 TB this is the right shape: no second shuffle, no
  * broadcast of an unboundedly-growing aggregate table.
  */
object Windows {

  /** W1 — `RANK()` over a partition, descending. Ties share the min rank. */
  def rankMinDesc(df: DataFrame, partitionCols: Seq[String], orderCol: String, as: String): DataFrame =
    df.withColumn(as, rank().over(Window.partitionBy(partitionCols.map(col): _*).orderBy(col(orderCol).desc)))

  /** W2 — `ROW_NUMBER()` over a partition, descending, with explicit
    * deterministic tie-break columns (ascending).
    */
  def ordinalRankDesc(df: DataFrame, partitionCols: Seq[String], orderCol: String, tieBreak: Seq[String], as: String): DataFrame = {
    val ordering = col(orderCol).desc +: tieBreak.map(col(_).asc)
    df.withColumn(as, row_number().over(Window.partitionBy(partitionCols.map(col): _*).orderBy(ordering: _*)))
  }

  /** A1/J1 — partition-total share: `x / max(sum(x) over partition, floor)`.
    * The reference's team-death-share (`feature_factory.py:57-60`) with the
    * same divide-by-zero floor of 1.
    */
  def partitionShare(df: DataFrame, partitionCols: Seq[String], valueCol: String, as: String, floor: Double = 1.0): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*)
    df.withColumn(as, col(valueCol) / greatest(sum(col(valueCol)).over(w), lit(floor)))
  }

  /** Generic partition aggregate attached to every row (no join, one shuffle). */
  def partitionAgg(df: DataFrame, partitionCols: Seq[String], agg: Column, as: String): DataFrame =
    df.withColumn(as, agg.over(Window.partitionBy(partitionCols.map(col): _*)))
}

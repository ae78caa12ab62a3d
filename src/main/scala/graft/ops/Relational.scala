package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scan-adjacent relational operators (SURVEY.md §2.1/§2.2/§2.6/§2.7).
  * Thin by design: these exist so the engine's surface is explicit and
  * testable, while the implementations stay fully declarative — Catalyst
  * pushes the filters and projections into the parquet scan
  * (`PushedFilters` / `ReadSchema`), which is the whole point at 100 TB.
  */
object Relational {

  /** S1/P2/P3 — filtered, projected scan. Predicates and the projection
    * reach the parquet reader (row-group skipping + column pruning).
    */
  def scan(df: DataFrame, predicate: Column, projection: Seq[Column]): DataFrame =
    df.filter(predicate).select(projection: _*)

  /** O1 — deterministic limit: sort by a unique key before limiting. The
    * reference's Mongo `cursor.limit(n)` is cursor-order (unspecified);
    * a reproducible engine must pin the order (SURVEY.md §7.3).
    */
  def sortedLimit(df: DataFrame, sortCols: Seq[String], n: Int): DataFrame =
    df.orderBy(sortCols.map(col(_).asc): _*).limit(n)

  /** O3 — top-k by a value column, descending, deterministic tie-break.
    * Lowers to `TakeOrderedAndProject` — per-partition heaps, no full sort.
    */
  def topK(df: DataFrame, valueCol: String, k: Int, tieBreak: Seq[String]): DataFrame =
    df.orderBy(col(valueCol).desc +: tieBreak.map(col(_).asc): _*).limit(k)

  /** Set op — union by column name across heterogeneous sources. */
  def unionByName(dfs: Seq[DataFrame]): DataFrame = dfs.reduce(_.unionByName(_))

  /** A2 — distinct key extraction (dimension-building primitive). */
  def distinctKeys(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col): _*).distinct()
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join operators (SURVEY.md §2.5). The reference never calls a join
  * library — its joins are dict probes and boolean masks — but the
  * semantics are exactly these four, re-expressed so Catalyst can pick
  * broadcast-hash for the small build sides:
  *
  *  - J1 team-aggregate back-join (`data_extractor.py:75-81`) — see
  *    [[Windows.partitionShare]] for the join-free form; [[aggBackJoin]]
  *    here is the explicit groupBy+join form for when the aggregate is
  *    reused across queries.
  *  - J2 semi-join by sampled keys (`feature_factory.py:284-285`) — leak-safe
  *    group membership filter.
  *  - J3 dimension lookup with default for misses
  *    (`feature_factory.py:260-263`, unseen champion → -1).
  *  - J4 full-outer merge of two nullable sides (`tasks.py:93-143`).
  */
object Joins {

  /** J1 — group aggregate joined back to every input row. Broadcast the
    * aggregate side when it is small (one row per group); at scale prefer
    * [[Windows.partitionShare]] which needs no join at all.
    */
  def aggBackJoin(df: DataFrame, keys: Seq[String], aggs: Seq[Column], broadcastAgg: Boolean = true): DataFrame = {
    val aggDf = df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    df.join(if (broadcastAgg) broadcast(aggDf) else aggDf, keys)
  }

  /** J2 — left-semi join against a key set: keep only rows whose key appears
    * in `keys`. The leak-safe split primitive. No broadcast hint by default:
    * the key side is often scale-proportional (sampled ids over a fact
    * table), and a forced hint would collect it to the driver at 100× —
    * AQE already upgrades to broadcast-hash when the side is actually under
    * `spark.sql.autoBroadcastJoinThreshold`. Pass `broadcastKeys = true`
    * only for key sets known bounded (dimension-sized).
    */
  def semiJoinByKeys(df: DataFrame, keys: DataFrame, on: Seq[String],
      broadcastKeys: Boolean = false): DataFrame =
    df.join(if (broadcastKeys) broadcast(keys) else keys, on, "left_semi")

  /** Complement of [[semiJoinByKeys]] — the dedup "already seen → reject"
    * gate (`extractor/riot/db/redis.py:55-68`) as a relational anti-join.
    * Same broadcast discipline as [[semiJoinByKeys]].
    */
  def antiJoinByKeys(df: DataFrame, keys: DataFrame, on: Seq[String],
      broadcastKeys: Boolean = false): DataFrame =
    df.join(if (broadcastKeys) broadcast(keys) else keys, on, "left_anti")

  /** J3 — broadcast left-outer dimension lookup; misses get `default`.
    * LEFT OUTER (not semi): the reference keeps unmatched rows and marks
    * them -1 (`feature_factory.py:263`), it does not drop them.
    */
  def dimLookup(df: DataFrame, dim: DataFrame, on: Seq[String], idCol: String, as: String, default: Column): DataFrame =
    df.join(broadcast(dim), on, "left")
      .withColumn(as, coalesce(col(idCol), default))
      .drop(idCol)

  /** J4 — full-outer merge by key, keeping rows where either side exists
    * (`tasks.py:112-115`: skip only if both detail and timeline failed).
    */
  def fullOuterMerge(left: DataFrame, right: DataFrame, on: Seq[String]): DataFrame =
    left.join(right, on, "full_outer")
}

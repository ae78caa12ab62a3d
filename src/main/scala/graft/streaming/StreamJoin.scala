package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join: pair each left row with every right row
  * carrying the same keys whose event time falls in
  * `[leftTs, leftTs + window)` — the watermarked-streaming form of
  * `ops.RangeJoin.pointInInterval` (whose batch execution is the oracle
  * twin, `q_interval_join`).
  *
  * Scale mechanics: Spark plans this as a state-store symmetric hash join
  * partitioned by the keys; the watermark delay bounds how much of each
  * side is buffered, so state size is (input rate × (delay + window)) per
  * key range — independent of total stream length. Both sides MUST be
  * watermarked or state grows without bound; the range condition on the
  * two event-time columns is what lets Spark evict left rows once the
  * right watermark passes `leftTs + window`.
  */
object StreamJoin {

  /** `keys` must exist on both sides; all other column names must be
    * disjoint (rename before calling). `leftTs`/`rightTs` are event-time
    * timestamp columns. `window` and `delay` are SQL interval strings
    * (e.g. "1 HOUR"); `delay` is the max out-of-orderness tolerated
    * before a row is dropped as late — for a bounded-history REPLAY
    * (files re-read in arbitrary order), size it to the full history span
    * so replay order can never fake lateness.
    */
  def intervalJoin(left: DataFrame, leftTs: String, right: DataFrame, rightTs: String,
      keys: Seq[String], window: String, delay: String): DataFrame = {
    val l = left.withWatermark(leftTs, delay).as("l")
    val r = right.withWatermark(rightTs, delay).as("r")
    val keyCond = keys.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _)
    val rangeCond = col(s"r.$rightTs") >= col(s"l.$leftTs") &&
      col(s"r.$rightTs") < col(s"l.$leftTs") + expr(s"INTERVAL $window")
    val leftRest = left.columns.filterNot(keys.contains).map(c => col(s"l.$c").as(c))
    val rightRest = right.columns.filterNot(keys.contains).map(c => col(s"r.$c").as(c))
    l.join(r, keyCond && rangeCond, "inner")
      .select(keys.map(k => col(s"l.$k").as(k)) ++ leftRest ++ rightRest: _*)
  }
}

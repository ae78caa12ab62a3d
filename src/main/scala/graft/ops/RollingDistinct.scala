package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distinct counts over trailing time windows — "7-day active
  * users per segment", the rolling-reach metric every event pipeline
  * publishes (reference analogue: the per-day match/player counters in
  * `transformer/aram/stats.py`, which only ever aggregate one day at a
  * time; this is the cross-day generalisation).
  *
  * COUNT(DISTINCT) is not a window function in Spark (or the standard),
  * and the naive rewrites are both scale traps at 100 TB:
  *   - self-join days × trailing days re-shuffles the id universe once
  *     per window slot with a day-range theta condition;
  *   - collect_set over a RANGE frame materialises every id list per
  *     (key, day) row in executor memory.
  *
  * Shape used here instead — bounded forward replication:
  *   1. collapse to distinct (key, day, id) — ONE map-side-combined
  *      aggregate, the only corpus-mass shuffle;
  *   2. each distinct triple contributes to exactly `windowDays` window
  *      end-days via `explode(sequence(day, day+w−1))` — a narrow ×w
  *      expansion, no shuffle;
  *   3. count DISTINCT ids per (key, window-day) — the partial-distinct
  *      Expand path dedups BEFORE the exchange, so the second shuffle
  *      carries ≤ w distinct rows per surviving (key, day, id), never
  *      raw events;
  *   4. keep only window-days the key actually has events on (inner join
  *      with the distinct (key, day) table — tiny, taxonomy × days).
  *
  * Replication factor = window length: cost is linear in w and in the
  * DISTINCT triple count, independent of per-day event volume — the
  * property that survives a 100× scale-up. Hot ids fan out per day, not
  * per event, so skew follows the calendar, not the traffic.
  */
object RollingDistinct {

  /** Per (keys…, day present in `df`): `u_day` = exact distinct `idCol`
    * that day, `u_trail` = exact distinct `idCol` over the trailing
    * `windowDays` days (inclusive). `dayCol` must be a date column.
    * Null keys/days don't survive the equality join — filter or coalesce
    * them upstream if they must be reported (the q_corpus_stats sentinel
    * pattern).
    */
  def trailingDistinct(df: DataFrame, keys: Seq[String], dayCol: String,
                       idCol: String, windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val kc = keys.map(col)
    // 1. the one corpus-mass shuffle: distinct contribution triples —
    // materialized (keySkew precedent) so the trailing and same-day
    // aggregates both read it instead of re-scanning the corpus twice
    val dd = df.select(kc :+ col(dayCol).as("__day") :+ col(idCol).as("__id"): _*)
      .distinct()
      .localCheckpoint(false)

    // 2–3. ×w forward replication, then partial-distinct count per end-day
    val trail = dd
      .withColumn("__wday",
        explode(sequence(col("__day"), date_add(col("__day"), windowDays - 1))))
      .groupBy(kc :+ col("__wday"): _*)
      .agg(count_distinct(col("__id")).as("u_trail"))

    // same-day counts ride the already-distinct triples (cheap re-agg)
    val daily = dd.groupBy(kc :+ col("__day"): _*)
      .agg(count_distinct(col("__id")).as("u_day"))

    // 4. report only (key, day) pairs that actually occur — a name-based
    // using-join (both sides share lineage, so positional df("c")
    // disambiguation would be fragile; the name join is unambiguous)
    daily
      .join(trail.withColumnRenamed("__wday", "__day"), keys :+ "__day")
      .select(kc ++ Seq(col("__day").as(dayCol), col("u_day"), col("u_trail")): _*)
  }
}

package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming dedup-queue semantics — the reference's Redis LIST+SET pairs
  * (`extractor/riot/db/redis.py:36-119`): enqueue-if-absent, with either
  * permanent membership (match ids, `match/queue.py:24-25`) or a TTL after
  * which a key may be admitted again (user ids, 6 h —
  * `extractor/riot/tasks.py:125-130`).
  *
  * Spark mapping:
  *  - permanent SET gate → `dropDuplicates(key)` on an unbounded stream.
  *    State grows with distinct keys — exactly like the reference's Redis
  *    SET. At 100 TB scale, put a TTL on it or periodically snapshot the
  *    seen-set to a compact table and anti-join instead.
  *  - TTL SET gate → `withWatermark` + `dropDuplicatesWithinWatermark`:
  *    a key is suppressed while it is within the watermark window and
  *    re-admitted once the watermark has passed its last sighting — the
  *    streaming-native form of Redis `SETEX` expiry, with state that is
  *    bounded by (keys seen per TTL window) instead of unbounded.
  *
  * Both operators shuffle on the key (state colocation); state lives in the
  * checkpointed state store, partitioned by `spark.sql.shuffle.partitions`.
  */
object DedupQueue {

  /** Permanent dedup gate: emit each key's first arrival only. */
  def dedupPermanent(stream: DataFrame, keyCols: Seq[String]): DataFrame =
    stream.dropDuplicates(keyCols)

  /** TTL dedup gate: emit a key's first arrival within each TTL window
    * (event-time watermark drives expiry; `ttl` e.g. "6 hours").
    */
  def dedupWithTtl(stream: DataFrame, keyCols: Seq[String], tsCol: String, ttl: String): DataFrame =
    stream.withWatermark(tsCol, ttl).dropDuplicatesWithinWatermark(keyCols)
}

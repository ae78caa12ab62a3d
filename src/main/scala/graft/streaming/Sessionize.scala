package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state via `flatMapGroupsWithState` — the engine's
  * stateful-processing surface (SURVEY.md §2.10): gap-based sessionization
  * whose batch twin is the `q_sessionize` window query (lag + cumulative
  * break-count). Streaming adds what the window can't: state that carries
  * ACROSS micro-batches per user, with event-time timeout so idle users'
  * state is dropped once the watermark passes their last possible
  * continuation (bounded state — the requirement for an unbounded stream).
  */
object Sessionize {

  case class Event(user_id: Long, event_id: Long, ts: java.sql.Timestamp)
  case class SessionState(lastTsMicros: Long, sessionId: Long)
  case class Sessionized(user_id: Long, event_id: Long, session_id: Long)

  val DefaultGapMicros: Long = 30L * 60 * 1000000 // 30 min

  private def assign(userId: Long, events: Iterator[Event],
      state: GroupState[SessionState], gapMicros: Long): Iterator[Sessionized] = {
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      var s = state.getOption.getOrElse(SessionState(Long.MinValue, 0L))
      val out = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
        val tsMicros = e.ts.getTime * 1000
        val newSession = s.lastTsMicros != Long.MinValue && tsMicros - s.lastTsMicros > gapMicros
        s = SessionState(tsMicros, if (newSession) s.sessionId + 1 else s.sessionId)
        Sessionized(userId, e.event_id, s.sessionId)
      }
      state.update(s)
      // drop state once the watermark is a full gap past the last event
      state.setTimeoutTimestamp(s.lastTsMicros / 1000 + gapMicros / 1000)
      out.iterator
    }
  }

  /** Streaming sessionize: requires a watermark on `ts` upstream. */
  def sessions(events: Dataset[Event], gapMicros: Long = DefaultGapMicros,
      watermark: String = "1 hour"): Dataset[Sessionized] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Sessionized](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (k, it, st) => assign(k, it, st, gapMicros))
  }

  /** A9 — observed metrics: named aggregates attached to any (batch or
    * streaming) DataFrame, surfaced per action / per micro-batch through
    * listeners — the reference's saved/participants/request counters
    * (`extractor/riot/tasks.py:62-64,127-131,147-149`).
    */
  def withCounters(df: DataFrame, name: String = "counters"): DataFrame =
    df.observe(name,
      count(lit(1)).as("n_rows"),
      approx_count_distinct(col(df.columns.head)).as("n_keys_approx"))
}

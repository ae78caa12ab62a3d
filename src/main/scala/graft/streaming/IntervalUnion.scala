package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming interval union (gaps-and-islands) via `flatMapGroupsWithState`
  * — the live twin of [[graft.ops.Intervals.unionStats]] (batch twin
  * oracled as `q_interval_union`): per key, exact covered seconds with
  * overlap double-counting removed, maintained ACROSS micro-batches.
  *
  * State design for an unbounded stream: the only information an exact
  * union ever needs again is the set of OPEN islands — an island whose
  * end lies below the event-time watermark can never be touched (no
  * future interval starts below the watermark), so each batch folds
  * closed islands into three scalars (count, covered mass, extents) and
  * keeps only the open tail. State per key = O(open islands), not
  * O(intervals seen).
  *
  * Emission: one RUNNING stats row per (key, batch with arrivals).
  * `n_intervals` strictly increases per emission, so the final row per
  * key (max `n_intervals`) is a pure function of the data — independent
  * of micro-batch slicing — and equals the batch operator's output,
  * which is exactly what the oracle pins. Touching intervals
  * (s == prior end) MERGE, matching the batch sweep's strict `s > maxe`
  * new-island rule.
  */
object IntervalUnion {

  case class Interval(user_id: Long, ts: java.sql.Timestamp, s: Long, e: Long)
  case class UnionState(minStart: Long, maxEnd: Long, nIntervals: Long,
      closedIslands: Long, closedCovered: Long, open: List[(Long, Long)])
  case class UnionStats(user_id: Long, n_intervals: Long, n_islands: Long,
      covered: Long, span: Long, gap_total: Long)

  /** Sweep-merge a bag of [s, e] intervals into disjoint islands
    * (touching merges — the batch twin's strict-greater rule). */
  private[streaming] def mergeSweep(intervals: List[(Long, Long)]): List[(Long, Long)] = {
    val sorted = intervals.sorted
    val buf = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
    sorted.foreach { case (s, e) =>
      if (buf.nonEmpty && s <= buf.last._2) {
        val (ls, le) = buf.remove(buf.size - 1)
        buf += ((ls, math.max(le, e)))
      } else buf += ((s, e))
    }
    buf.toList
  }

  private def update(key: Long, it: Iterator[Interval],
      state: GroupState[UnionState]): Iterator[UnionStats] = {
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val arrivals = it.toList.filter(iv => iv.e >= iv.s)
      if (arrivals.isEmpty) Iterator.empty
      else {
        val st0 = state.getOption.getOrElse(
          UnionState(Long.MaxValue, Long.MinValue, 0L, 0L, 0L, Nil))
        val open = mergeSweep(st0.open ++ arrivals.map(iv => (iv.s, iv.e)))
        val minStart = math.min(st0.minStart, arrivals.map(_.s).min)
        val maxEnd = math.max(st0.maxEnd, arrivals.map(_.e).max)
        val n = st0.nIntervals + arrivals.size
        // fold watermark-passed islands into scalars (bounded state)
        val wmSec = state.getCurrentWatermarkMs() / 1000
        val (closed, stillOpen) = open.partition(_._2 < wmSec)
        val st1 = UnionState(minStart, maxEnd, n,
          st0.closedIslands + closed.size,
          st0.closedCovered + closed.map(i => i._2 - i._1).sum,
          stillOpen)
        state.update(st1)
        // drop state an hour of event time past the last possible merge
        state.setTimeoutTimestamp(math.max(maxEnd * 1000 + 3600000L,
          state.getCurrentWatermarkMs() + 3600000L))
        val covered = st1.closedCovered + stillOpen.map(i => i._2 - i._1).sum
        val islands = st1.closedIslands + stillOpen.size
        val span = maxEnd - minStart
        Iterator.single(
          UnionStats(key, n, islands, covered, span, span - covered))
      }
    }
  }

  /** Streaming union stats: requires a watermark on `ts` upstream (set
    * here). Emits running per-key stats; take the max-`n_intervals` row
    * per key for the final table. */
  def unionStats(intervals: Dataset[Interval],
      watermark: String = "1 hour"): Dataset[UnionStats] = {
    import intervals.sparkSession.implicits._
    intervals
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UnionState, UnionStats](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}

package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregate — `Aggregator[IN, BUF, OUT]` (the optional
  * enrichment from SURVEY.md §4): a fixed-bin histogram quantile sketch.
  *
  * Exact `percentile` needs all values (sort or value map); this sketch
  * needs O(bins) state, merges associatively, and is therefore usable
  * where exact quantiles aren't: streaming aggregations (state store keeps
  * one buffer per key), partial aggregation with map-side combine, and
  * approximate quantiles over 100 TB in one pass. Error is bounded by the
  * bin width (range/bins); values outside [lo, hi] clamp to the edge bins.
  *
  * Deterministic by construction (no sampling), so results are stable
  * across partitionings and replays — unlike reservoir-based sketches.
  */
final case class HistogramQuantile(lo: Double, hi: Double, bins: Int, p: Double)
  extends Aggregator[Double, Array[Long], Double] {
  require(bins > 0 && hi > lo && p >= 0 && p <= 1)

  private def binOf(x: Double): Int = {
    val b = ((x - lo) / (hi - lo) * bins).toInt
    math.min(math.max(b, 0), bins - 1)
  }

  override def zero: Array[Long] = new Array[Long](bins)

  override def reduce(buf: Array[Long], x: Double): Array[Long] = {
    // skip NaN: (NaN).toInt == 0 would silently count it in the lowest
    // bin; exact percentile paths drop NaN, so the sketch does too
    if (!java.lang.Double.isNaN(x)) buf(binOf(x)) += 1
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bins) { a(i) += b(i); i += 1 }
    a
  }

  /** Quantile estimate: the midpoint of the bin holding the p-th value. */
  override def finish(buf: Array[Long]): Double = {
    val n = buf.sum
    if (n == 0) Double.NaN
    else {
      val target = math.max(1L, math.ceil(p * n).toLong)
      var acc = 0L; var i = 0
      while (i < bins && acc + buf(i) < target) { acc += buf(i); i += 1 }
      val width = (hi - lo) / bins
      lo + (math.min(i, bins - 1) + 0.5) * width
    }
  }

  // native long-array encoder: the buffer serializes as a primitive array
  // (UnsafeArrayData), not an ObjectOutputStream per partial merge
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object HistogramQuantile {
  /** Column form, usable in any (batch or streaming) aggregation. */
  def quantile(c: Column, lo: Double, hi: Double, bins: Int, p: Double): Column = {
    import org.apache.spark.sql.functions.udaf
    udaf(HistogramQuantile(lo, hi, bins, p)).apply(c)
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join without a cross product.
  *
  * A naive `points JOIN intervals ON p BETWEEN start AND end` has no
  * equi-key, so Spark plans a BroadcastNestedLoopJoin — an O(|P|·|I|)
  * scan that is the classic 100 TB cliff for event⋈window alignment
  * (the keyed cousin of the reference's detail⋈timeline merge,
  * `extractor/riot/tasks.py:119-149`, where the alignment key is time
  * rather than match id). The scalable shape buckets both sides by a
  * fixed time width: each point lands in exactly one bucket, each
  * interval covers `⌈len/width⌉ (+1)` buckets, and the join becomes a
  * plain shuffled equi-join on the bucket id with the exact range
  * predicate applied as a post-filter. Output pairs appear at most once
  * (the point's single bucket), so no dedup pass is needed.
  *
  * Cost model: shuffle volume is |P| + Σ⌈len_i/width⌉ rows on fixed-width
  * keys; quadratic work is confined to pairs that actually share a
  * bucket. Pick `bucketWidth` near the typical interval length — one
  * order of magnitude either way only changes the interval replication
  * factor or the per-bucket candidate count linearly. Bucket keys are
  * time-dense, so AQE's skew-join splitting handles hot buckets.
  */
object RangeJoin {

  /** Join each `points` row to every `intervals` row whose
    * `[startCol, endCol)` half-open range contains `pointCol`, with
    * optional additional equi-join `keys` (present in both sides — the
    * stream-stream-join shape). All three range columns must be LONG in
    * the same unit (e.g. `unix_micros`); values must be non-negative
    * (integral `div` truncates toward zero). Degenerate intervals
    * (`end <= start`) match nothing and are dropped before expansion.
    * Other column names must not collide across the two inputs.
    */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long, keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    // integral `div`, not `/`: double division rounds at bucket
    // boundaries (micros-scale numerators) and would misplace points
    // whose timestamp is an exact multiple of the width
    val p = points.withColumn("__bucket", expr(s"`$pointCol` div $bucketWidth"))
    val i = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__bucket",
        explode(sequence(expr(s"`$startCol` div $bucketWidth"),
          expr(s"(`$endCol` - 1) div $bucketWidth"))))
    p.join(i, "__bucket" +: keys)
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bucket")
  }
}

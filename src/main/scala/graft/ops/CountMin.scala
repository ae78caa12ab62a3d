package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan, 2005) — frequency
  * estimation over an unbounded key universe in FIXED d×w space, the
  * sketch sibling of the exact [[Aggregates]] counts and the HLL
  * distinct sketches already in the library: where HLL answers "how many
  * distinct", count-min answers "how often does THIS key occur" without
  * a per-key table. The production shapes it unlocks at 100 TB:
  * per-shard sketches that MERGE cell-wise (counts add), an incremental
  * store that absorbs a day's delta without rescanning history (the
  * [[RollingDistinct]] / MinHash-store pattern), and point-frequency
  * probes against a KB-sized table instead of a corpus-mass aggregate.
  *
  * Guarantee: estimates never undercount, and overcount by more than
  * 2n/w with probability ≤ (1/2)^d — width buys accuracy, depth buys
  * confidence. Estimates here are the classic min-over-rows readout.
  *
  * Determinism: row hashes are the repo-wide md5-60-bit derivation
  * (`hash60("j|key")` per sketch row j), so sketches and estimates are
  * bit-identical across engines, partitionings, and replays — the DuckDB
  * oracles rebuild the cells exactly.
  *
  * Scale shape: build = ONE narrow ×d explode + one map-side-combined
  * (row, bucket) aggregate to ≤ d·w cells (the only shuffle, carrying at
  * most d·w rows per map task after combine); merge = cell-wise sum of
  * sketch tables; estimate = a ×d probe of the query keys joined against
  * the d·w-cell sketch (AQE broadcasts it — it is constant-sized by
  * construction).
  */
object CountMin {

  private def rowHash(row: Int, key: org.apache.spark.sql.Column) =
    graft.functions.Md5Hash60.hash60(concat(lit(s"$row|"), key.cast("string")))

  /** Build a depth×width sketch over `keyCol` (one increment per row;
    * null keys excluded). Returns the cell table (row, bucket, c) —
    * rows 0..depth-1, buckets 0..width-1, absent cells are zero.
    */
  def build(df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"need depth>=1, width>=2: $depth×$width")
    val probes = (0 until depth).map(j =>
      struct(lit(j).as("row"), (rowHash(j, col(keyCol)) % width).as("bucket")))
    df.filter(col(keyCol).isNotNull)
      .select(explode(array(probes: _*)).as("__p"))
      .groupBy(col("__p.row").as("row"), col("__p.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Merge sketch cell tables built with the SAME depth/width/key domain:
    * counts add cell-wise. The incremental-store operation — yesterday's
    * sketch + today's delta sketch = the combined sketch, no history
    * rescan.
    */
  def merge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy("row", "bucket").agg(sum(col("c")).as("c"))

  /** Point-frequency estimates for `keys` (one column) against a sketch
    * cell table: est = min over rows of the probed cell (absent cell =
    * 0). Returns (key, est).
    */
  def estimate(sketch: DataFrame, keys: DataFrame, depth: Int,
               width: Int): DataFrame = {
    require(depth >= 1 && width >= 2)
    val keyCol = keys.columns.head
    val probes = (0 until depth).map(j =>
      struct(lit(j).as("row"), (rowHash(j, col("key")) % width).as("bucket")))
    keys.select(col(keyCol).as("key")).distinct()
      .select(col("key"), explode(array(probes: _*)).as("__p"))
      .select(col("key"), col("__p.row").as("row"), col("__p.bucket").as("bucket"))
      .join(sketch, Seq("row", "bucket"), "left_outer")
      .groupBy("key")
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Categorical-distribution drift metrics — the training-mix monitor: how
  * far each segment's category mix (event types per week, languages per
  * crawl snapshot, domains per shard) sits from the corpus-wide mix.
  * The reference's analogue is pandas `value_counts` normalization eyeballed
  * in notebooks; at 100 TB the comparison must be an aggregate, not a plot.
  *
  * Per segment s with share vector p and global share vector q:
  *   entropy(s) = −Σ_c p_c ln p_c            (mix diversity)
  *   kl(s‖g)    =  Σ_c p_c ln (p_c / q_c)    (drift vs corpus)
  *   tvd(s,g)   = ½ Σ_c |p_c − q_c|          (worst-case share gap)
  *
  * Exactness/determinism: counts are exact longs; shares are single IEEE
  * divisions of those longs (bit-identical cross-engine); ln is the only
  * libm call and every output passes through the caller's `qround` (the
  * repo's float-aggregate discipline — category counts are small, so
  * re-association noise is ~1e-15, far under the rounding grain).
  * KL's p·ln(p/q) terms are well-defined because a segment's categories
  * are a subset of the global ones (q_c > 0 wherever p_c > 0); absent
  * categories contribute 0 to entropy/KL by the usual 0·ln 0 = 0
  * convention, and TVD folds them in exactly via
  *   ½ (Σ_present |p_c − q_c| + 1 − Σ_present q_c)
  * — only present (segment, category) rows are ever materialized.
  *
  * Scale shape: one map-side-combined aggregate to (segment, category)
  * counts — the ONLY corpus-mass shuffle; global category shares derive
  * from re-aggregating that table and broadcast back onto it (category
  * cardinality is bounded — languages, event types, domains — never
  * row-proportional); one final per-segment aggregate. Nothing is
  * collected on the driver.
  */
object Distribution {

  /** Per-segment drift report: (segCol, n_rows, n_cats, entropy, kl, tvd).
    * Raw (unrounded) doubles — callers `qround` at the query layer.
    */
  def categoricalDrift(df: DataFrame, segCol: String, catCol: String): DataFrame = {
    val segCat = df
      .filter(col(segCol).isNotNull && col(catCol).isNotNull)
      .groupBy(col(segCol), col(catCol))
      .agg(count(lit(1)).as("sc_n"))
      .localCheckpoint(false) // consumed by global re-agg AND the join below
    val global = segCat.groupBy(col(catCol)).agg(sum(col("sc_n")).as("c_n"))
    val totals = segCat.groupBy(col(segCol)).agg(sum(col("sc_n")).as("s_n"))
    val grand = global.agg(sum(col("c_n")).as("g_n"))

    // global shares and the 1-row grand total are category-bounded →
    // broadcast by contract; segment totals can be many (one per segment),
    // so that join is left to cost — it reuses segCat's partitioning when
    // it does shuffle (same key as the final aggregate)
    val joined = segCat
      .join(broadcast(global), catCol)
      .join(totals, segCol)
      .crossJoin(broadcast(grand))
      .withColumn("p", col("sc_n").cast("double") / col("s_n"))
      .withColumn("q", col("c_n").cast("double") / col("g_n"))
    joined.groupBy(col(segCol))
      .agg(
        max(col("s_n")).as("n_rows"),
        count(lit(1)).as("n_cats"),
        (-sum(col("p") * log(col("p")))).as("entropy"),
        sum(col("p") * log(col("p") / col("q"))).as("kl"),
        ((sum(abs(col("p") - col("q"))) + lit(1.0) - sum(col("q"))) / 2.0).as("tvd"))
  }
}

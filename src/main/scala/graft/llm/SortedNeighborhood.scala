package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sorted-neighborhood method (SNM) candidate generation — the classic
  * record-linkage blocking scheme (Hernández & Stolfo, SIGMOD'95)
  * complementing the hash-bucket families already in this package
  * ([[MinHashDedup]] bands, [[SimHashDedup]] pigeonhole, [[NGramJaccard]]
  * prefix filters): sort the corpus by a discriminating key and compare
  * only rows within a fixed window of positions. Where LSH recall depends
  * on similarity thresholds, SNM recall depends on the sort key placing
  * near-duplicates adjacently — the right tool when a cheap canonical key
  * (normalized name, text prefix, zip+street) exists, and the standard
  * second pass when LSH bands miss low-similarity-but-same-entity pairs.
  *
  * Reference behavioral anchor: the reference dedups whole items by id
  * queue (`extractor/riot/match/queue.py`); SNM is part of the
  * beyond-reference training-data surface (SURVEY §2.11).
  *
  * Scale shape — never a self-theta-join on rank distance (that is a
  * broadcast-nested-loop at any size):
  *  1. global rank over (key, id) via [[graft.ops.PrefixScan]]'s two-pass
  *     range-partitioned scan — the parallel sort shape, no single-reducer
  *     window;
  *  2. each row replicates into its own rank block `rn div w` AND the next
  *     one (×2, fixed) — any pair within w positions then shares ≥ 1
  *     block;
  *  3. one equi-join on the block id, gap filter inside the block,
  *     emitted exactly once (only in the block `rb div w`, which every
  *     qualifying pair shares exactly once — no distinct pass needed).
  * Join fan-in per block is ≤ 2w rows, so the pair volume is Θ(n·w) by
  * construction — the window parameter IS the cost bound, independent of
  * key skew (ties share blocks only w rows at a time).
  */
object SortedNeighborhood {

  /** Candidate pairs within `window` positions of the global
    * (`sortKeyCol`, `idCol`) order. Returns one row per ordered pair:
    * (a_id, b_id, gap, a_key, b_key) with 0 < gap < window and a before
    * b. Ids must be unique non-null; null sort keys are excluded (a null
    * key carries no adjacency information).
    */
  def candidatePairs(df: DataFrame, idCol: String, sortKeyCol: String,
                     window: Int): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    val w = window.toLong
    val base = df
      .filter(col(sortKeyCol).isNotNull && col(idCol).isNotNull)
      .select(col(idCol).as("__id"), col(sortKeyCol).as("__k"))
      .withColumn("__one", lit(1L))
    // 1-based global rank: cumulative count over the total (key, id) order.
    // Checkpointed: both sides of the block join consume it, and without
    // the cut the whole two-pass rank pipeline runs twice.
    val ranked = graft.ops.PrefixScan
      .cumulativeSum(base, Seq("__k", "__id"), "__one", "rn")
      .drop("__one")
      .localCheckpoint(false)
    val blocks = ranked.select(col("__id"), col("__k"), col("rn"),
      explode(array(expr(s"rn div $w"), expr(s"rn div $w + 1"))).as("__b"))
    val a = blocks.select(col("__b"), col("__id").as("a_id"),
      col("__k").as("a_key"), col("rn").as("__ra"))
    val b = blocks.select(col("__b"), col("__id").as("b_id"),
      col("__k").as("b_key"), col("rn").as("__rb"))
    a.join(b, Seq("__b"))
      .filter(col("__rb") > col("__ra") &&
        col("__rb") - col("__ra") < w &&
        // exactly-once emission: of the 1-2 blocks a qualifying pair
        // shares, keep only b's home block
        col("__b") === expr(s"__rb div $w"))
      .select(col("a_id"), col("b_id"),
        (col("__rb") - col("__ra")).as("gap"), col("a_key"), col("b_key"))
  }
}

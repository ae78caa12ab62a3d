package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composite training-data scrub — the llm operators assembled in
  * their production order, cheapest-first so each stage shrinks the input
  * of the next:
  *
  *   1. quality gate      (per-row expression, no shuffle)
  *   2. language gate     (per-row expression, no shuffle)
  *   3. exact dedup       (one hash shuffle, min-id survivor)
  *   4. near-dup removal  (MinHash LSH; only survivors of 1-3 pay for it)
  *
  * Near-dup survivorship is transitive by default (connected components
  * via [[DupClusters]] — one min-id survivor per dup cluster however the
  * pairs chain); `transitive = false` falls back to the cheaper
  * single-pass pairwise rule (drop the larger id of every pair).
  */
object CorpusPipeline {

  final case class Config(
      minQuality: Double = 0.3,
      keepLangs: Seq[String] = Seq("en"),
      shingleK: Int = 3,
      numHashes: Int = 12,
      numBands: Int = 4,
      jaccardThreshold: Double = 0.8,
      /** true → connected-components survivorship ([[DupClusters]]): one
        * survivor per transitive dup cluster; false → single-pass pairwise
        * rule (drop the larger id of each pair).
        */
      transitive: Boolean = true,
      /** true → md5/Rabin-Karp shingle hashing ([[MinHashDedup]]'s
        * DuckDB-parity family) instead of xxhash64; used by the
        * cross-engine oracle query, identical algebra otherwise.
        */
      oracleParity: Boolean = false)

  /** Returns (cleaned corpus, per-stage counts row). */
  def scrub(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): (DataFrame, DataFrame) = {
    val en = TextAnalysis.langStopwords.head._2
    // spread before the (regex-heavy) gates: a single-row-group local scan
    // serializes them on one core; no-op at scale (Partitioning.spread)
    val gated = graft.ops.Partitioning.spread(docs)
      .withColumn("__quality", TextAnalysis.qualityScore(col(textCol), en))
      .withColumn("__lang", TextAnalysis.langId(col(textCol)))
      .filter(col("__quality") >= cfg.minQuality && col("__lang").isin(cfg.keepLangs: _*))
      .drop("__quality", "__lang")

    // The exact-dedup survivor table fans out to three consumers (the
    // near-dup pipeline, the survivor base of the anti-join, and the stats
    // row); checkpoint it lazily so the gate expressions + dedup shuffle
    // run once instead of once per consumer — the shared-intermediate
    // materialization a production run would express as a persisted table.
    val exact = Dedup.dropExactDuplicates(gated, idCol, textCol).localCheckpoint(false)

    // exact dedup already ran, so exact-set groups are (near-)singletons:
    // skip the set collapse — it would be pure fixed cost here
    val nearPairs = MinHashDedup.nearDuplicates(exact, idCol, textCol,
      cfg.shingleK, cfg.numHashes, cfg.numBands, cfg.jaccardThreshold,
      oracleParity = cfg.oracleParity, collapseExactSets = false)
    val cleaned =
      if (cfg.transitive) DupClusters.dropClusters(exact, nearPairs, idCol)
      else {
        // Unhinted anti-join: the drop set grows with the corpus's dup
        // mass, so let AQE pick broadcast vs shuffle at runtime.
        val dropIds = nearPairs.select(col("id_b").as(idCol)).distinct()
        exact.join(dropIds, Seq(idCol), "left_anti")
      }

    val stats = docs.select(count(lit(1)).as("n_input"))
      .crossJoin(gated.select(count(lit(1)).as("n_after_gates")))
      .crossJoin(exact.select(count(lit(1)).as("n_after_exact")))
      .crossJoin(cleaned.select(count(lit(1)).as("n_after_neardup")))
    (cleaned, stats)
  }
}

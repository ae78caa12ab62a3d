package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share word
  * n-grams with a held-out evaluation corpus — the standard pre-training
  * hygiene pass (n-gram collision against eval sets) that must run over
  * the full corpus before a model trains on it.
  *
  * Scale shape: both sides reduce to distinct hashed n-grams (the same
  * Rabin-Karp word-shingle algebra as [[MinHashDedup]], so any engine can
  * reproduce the gram ids). The benchmark side is distinct-gram only —
  * eval sets are MBs against a corpus of TBs, so AQE broadcasts it when
  * small; with no forced hint the join otherwise degrades to a shuffled
  * hash join partitioned by gram. Cost is one explode + one join +
  * one aggregate — never corpus × benchmark.
  */
object Decontaminate {

  /** Distinct hashed word n-grams per document; docs shorter than n words
    * contribute nothing (empty gram array explodes to zero rows).
    */
  private def docGrams(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(
        MinHashDedup.rollingShingleHashes(MinHashDedup.wordHashes(col(textCol)), n))).as("gram"))

  /** (doc_id, n_shared_grams) for every training document sharing at least
    * `minShared` distinct word n-grams with `bench`.
    */
  def contaminated(train: DataFrame, bench: DataFrame, idCol: String, textCol: String,
      n: Int = 5, minShared: Int = 1): DataFrame = {
    val benchGrams = docGrams(bench, idCol, textCol, n).select("gram").distinct()
    docGrams(train, idCol, textCol, n)
      .join(benchGrams, "gram")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared_grams"))
      .filter(col("n_shared_grams") >= minShared)
  }

  /** `train` minus every contaminated document — the scrub form. */
  def decontaminate(train: DataFrame, bench: DataFrame, idCol: String, textCol: String,
      n: Int = 5, minShared: Int = 1): DataFrame = {
    val bad = contaminated(train, bench, idCol, textCol, n, minShared)
      .select(col("doc_id").as(idCol))
    train.join(bad, Seq(idCol), "left_anti")
  }

  /** Per-document n-gram NOVELTY against a reference corpus — the
    * graded complement of [[contaminated]]'s binary flag: for every
    * train document with ≥1 gram, its distinct-gram count, how many of
    * those grams the reference already contains, and the novel fraction.
    * The dedup-aware quality signal corpus curation ranks on (novelty ≈
    * information the reference slice doesn't already have); documents
    * shorter than n words carry no grams and are absent, like
    * [[contaminated]].
    *
    * Scale shape: identical to [[contaminated]] except the gram join is
    * LEFT (per-gram seen flag) — one explode, one join against the
    * distinct-gram reference side (AQE-broadcast when eval-sized), one
    * map-side-combined per-doc aggregate. Never corpus × reference.
    */
  def noveltyScores(train: DataFrame, ref: DataFrame, idCol: String, textCol: String,
      n: Int = 5): DataFrame = {
    val refGrams = docGrams(ref, idCol, textCol, n).select("gram").distinct()
      .withColumn("__seen", lit(1L))
    docGrams(train, idCol, textCol, n)
      .join(refGrams, Seq("gram"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__seen"), lit(0L))).as("n_seen"))
      .withColumn("n_novel", col("n_grams") - col("n_seen"))
  }
}

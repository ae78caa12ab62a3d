package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer TRAINING (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units"), the step the
  * vocabulary-induction ops (`TextAnalysis.vocabTopGrams` /
  * `encodeTokens`) assume already happened. Completes the reference's
  * encoder-fitting surface (`transformer/ranking/feature_factory.py:
  * 243-265` fits a categorical vocabulary on train data; a text pipeline's
  * analogue is fitting the subword vocabulary itself).
  *
  * The merge loop as dataflow:
  *
  *   1. corpus → DISTINCT WORD table with counts (one shuffle; from here
  *      on, work is vocabulary-sized — corpus size only enters via the
  *      counts, which is what makes BPE training tractable at 100 TB: the
  *      word-shape table for a web corpus is millions of rows, not
  *      trillions);
  *   2. per iteration: adjacent symbol pairs weighted by word count →
  *      partial-aggregated groupBy → argmax via TakeOrdered(1) with a
  *      lexicographic tie-break (deterministic across partitionings and
  *      engines) → the winning pair broadcast into a narrow fold that
  *      merges it greedily left-to-right inside every word;
  *   3. periodic eager localCheckpoints truncate the per-iteration lambda
  *      lineage (the [[DupClusters]] discipline) so plan depth stays
  *      bounded by the checkpoint interval, not numMerges.
  *
  * Apply ([[segment]]) is the classic imperative per-word loop over the
  * learned ranks via mapPartitions — tokenizer application is stateful
  * per-row iteration (like the [[Multimodal]] codec), not expression math.
  */
object Bpe {

  /** End-of-word marker — distinguishes "w" mid-word from "w" word-final,
    * exactly as in the original BPE formulation.
    */
  val EndOfWord = "</w>"

  /** Whitespace corpus → (word, n) weighted vocabulary. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Split a `word` column into its initial symbol sequence: code points +
    * the end-of-word marker (Java-regex empty matches advance by code
    * point, so astral-plane characters stay whole symbols — [[segment]]
    * iterates the same way). Shared with the oracle query
    * `q_bpe_top_pairs`, which must symbolize identically to the trainer.
    */
  private[graft] def initialSymbols = {
    // concat, NOT array_union — union dedups and "aab" must stay [a,a,b]
    val chars = split(col("word"), "")
    concat(filter(chars, c => length(c) > 0), array(lit(EndOfWord)))
  }

  /** Adjacent symbol pairs weighted by word count — one training
    * iteration's statistics, partial-aggregated. Shared by [[train]] and
    * the `q_bpe_top_pairs` oracle query so the checked expression IS the
    * trained one.
    */
  private[graft] def pairCounts(words: DataFrame): DataFrame =
    words
      .select(explode(transform(slice(col("syms"), lit(1), size(col("syms")) - 1),
        (s, idx) => struct(s.as("l"), element_at(col("syms"), idx + 2).as("r")))).as("p"),
        col("n"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("n")).as("cnt"))

  /** One greedy left-to-right merge of the pair (l, r) inside a symbol
    * array, as a pure fold: "aaa" under (a,a) becomes ["aa","a"], matching
    * reference BPE implementations. `l`/`r` are Columns so the winning
    * pair can flow in AS DATA (from the chained argmax join) instead of a
    * driver-collected literal.
    */
  private def mergePair(syms: org.apache.spark.sql.Column,
      l: org.apache.spark.sql.Column, r: org.apache.spark.sql.Column) =
    aggregate(syms, array().cast("array<string>"), (acc, x) => {
      val lastIdx = size(acc)
      val last = element_at(acc, -1)
      when(lastIdx > 0 && last === l && x === r,
        concat(slice(acc, lit(1), lastIdx - 1), array(concat(l, r))))
        .otherwise(concat(acc, array(x)))
    })

  /** Learn `numMerges` merge rules. Returns the merges table
    * (rank, left, right, pair_count) in learned order. Stops early when no
    * pair reaches `minCount`.
    *
    * The greedy loop is inherently sequential — each argmax depends on the
    * previous merge's output — but consecutive merges are often provably
    * INDEPENDENT, and those can share one driver round-trip. Per round,
    * ONE action collects the top-`maxBatch` candidate pairs plus, for each
    * candidate symbol, the max count over its adjacent pairs (both from
    * the same aggregated exchange — ReusedExchange dedups the shuffle).
    * The driver then accepts the longest candidate PREFIX p₁..pₖ where
    * each pⱼ provably stays the sequential argmax after p₁..pⱼ₋₁ apply:
    *
    *  - disjointness: applying (l,r) only perturbs pairs of the form
    *    (x,l), (r,y), (l,r) — so pⱼ's own count is invariant iff
    *    lⱼ ≠ rᵢ and rⱼ ≠ lᵢ;
    *  - created-symbol identity: the new symbol lᵢrᵢ must not equal
    *    either of pⱼ's symbols as a STRING, or merged occurrences would
    *    feed pⱼ's count;
    *  - created-count bound: pairs created by pᵢ have count
    *    ≤ max(max_x cnt(x,lᵢ), max_y cnt(rᵢ,y)) — pⱼ must count STRICTLY
    *    above that bound or a created pair could (tie-break included)
    *    out-rank it.
    *
    * Other old pairs only ever lose count, so the sorted prefix order is
    * the sequential order; the first unprovable candidate ends the batch
    * (accepting a later one would reorder the sequence). The result is
    * bit-identical to the one-at-a-time loop — pinned by BpeSpec (blockwise
    * vs maxBatch=1 on fixtures AND a natural corpus) and cross-engine by
    * the unrolled DuckDB oracle (`q_bpe_merges`). Driver round-trips per
    * merge drop by the average accepted-batch size: ~1.7× on chain-heavy
    * natural text (early BPE merges genuinely depend on each other:
    * e,r → er → er</w>), up to maxBatch× when candidate counts are
    * well-separated and symbol-disjoint, as in wide flat vocabularies.
    */
  def train(spark: SparkSession, docs: DataFrame, textCol: String,
      numMerges: Int, minCount: Long = 2L, maxBatch: Int = 16): DataFrame = {
    import spark.implicits._
    val initial = wordCounts(docs, textCol)
      .select(initialSymbols.as("syms"), col("n"))
      .localCheckpoint(true)
    // Size the loop's parallelism to the VOCABULARY, not the session
    // default: every iteration shuffles the word-shape table, and a 40-row
    // vocab under 32 shuffle partitions pays ~30 task launches per
    // iteration for nothing. ~50k word shapes per partition keeps test
    // corpora on one task while a 100M-shape web vocab still gets
    // thousands-wide parallelism. Never via session conf — a conf flip
    // would leak into queries planned concurrently on the shared session;
    // the pair-count exchange runs at session width and AQE coalesces it
    // when the data is small.
    val parts = math.max(1, (initial.count() / 50000L).toInt)
    var words = initial.repartition(parts).localCheckpoint(true)
    unpersistCheckpoint(initial)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var done = false
    var unCheckpointed = 0
    while (merges.size < numMerges && !done) {
      val k = math.min(maxBatch, numMerges - merges.size)
      val pc = pairCounts(words).filter(col("cnt") >= minCount)
      val top = pc.orderBy(col("cnt").desc, col("l").asc, col("r").asc).limit(k)
      // per-symbol adjacency maxes, tagged and unioned with the candidates
      // so ONE collect serves the whole round (a candidate-filtered join
      // would broadcast and each broadcast is its own sub-job); the rows
      // collected are O(|symbol alphabet|) = base chars + merges so far,
      // never corpus- or vocabulary-shaped
      val lmax = pc.groupBy(col("r").as("s")).agg(max("cnt").as("m")) // max over (x, s)
      val rmax = pc.groupBy(col("l").as("s")).agg(max("cnt").as("m")) // max over (s, y)
      val packed = top.select(lit(0).as("tag"), col("l"), col("r"), col("cnt"))
        .unionByName(lmax.select(lit(1).as("tag"), col("s").as("l"), lit("").as("r"), col("m").as("cnt")))
        .unionByName(rmax.select(lit(2).as("tag"), col("s").as("l"), lit("").as("r"), col("m").as("cnt")))
        .as[(Int, String, String, Long)].collect()
      val cands = packed.filter(_._1 == 0).map(t => (t._2, t._3, t._4))
        .sortBy { case (l, r, c) => (-c, l, r) }
      val lmaxMap = packed.filter(_._1 == 1).map(t => t._2 -> t._4).toMap
      val rmaxMap = packed.filter(_._1 == 2).map(t => t._2 -> t._4).toMap
      if (cands.isEmpty) done = true
      else {
        val acc = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        var blocked = false
        for ((l, r, c) <- cands if !blocked) {
          val provable = acc.forall { case (al, ar, _) =>
            r != al && l != ar && l != al + ar && r != al + ar &&
              c > math.max(lmaxMap.getOrElse(al, 0L), rmaxMap.getOrElse(ar, 0L))
          }
          if (provable) acc += ((l, r, c)) else blocked = true
        }
        val base = merges.size.toLong
        merges ++= acc.zipWithIndex.map { case ((l, r, c), j) => (base + j, l, r, c) }
        words = acc.foldLeft(words) { case (w, (l, r, _)) =>
          w.select(mergePair(col("syms"), lit(l), lit(r)).as("syms"), col("n"))
        }
        unCheckpointed += acc.size
        if (cands.length < k && acc.length == cands.length) done = true
        if (!done && merges.size < numMerges && unCheckpointed >= 4) {
          // eager checkpoint truncates the nested-fold plan; the
          // superseded block storage is released via the checkpointed RDD
          // (Dataset.unpersist alone would not touch localCheckpoint
          // blocks — ContextCleaner would reclaim them only at GC time)
          val prev = words
          words = words.localCheckpoint(true)
          unpersistCheckpoint(prev)
          unCheckpointed = 0
        }
      }
    }
    unpersistCheckpoint(words)
    merges.toSeq.toDF("rank", "left", "right", "pair_count")
  }

  /** Free a localCheckpoint'ed Dataset's storage promptly: the checkpoint
    * blocks belong to the underlying RDD, which `Dataset.unpersist` does
    * not reach (it only drops CacheManager entries), so unpersist the
    * physical-scan RDD as well and leave ContextCleaner as the backstop.
    */
  private def unpersistCheckpoint(df: DataFrame): Unit = {
    df.unpersist()
    try df.queryExecution.toRdd.unpersist(blocking = false)
    catch { case _: Throwable => () } // best-effort; ContextCleaner backstops
  }

  /** Tokenize text with learned merges: per word, repeatedly merge the
    * lowest-rank adjacent pair until none applies (the standard BPE apply
    * loop), returning one row per doc with its ordered `tokens` array.
    * Narrow — the rank map broadcasts, each partition tokenizes
    * independently. Words split by CODE POINT, matching [[train]]'s
    * symbolization (UTF-16 code-unit iteration would hand surrogate
    * halves to the rank lookups and never match astral-plane merges).
    */
  def segment(spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
      merges: DataFrame): DataFrame = {
    import spark.implicits._
    val ranks = merges.select("left", "right", "rank")
      .as[(String, String, Long)].collect()
      .map { case (l, r, k) => (l, r) -> k }.toMap
    val bc = spark.sparkContext.broadcast(ranks)
    docs.select(col(idCol).cast("long").as("_1"), col(textCol).as("_2")).as[(Long, String)]
      .mapPartitions { rows =>
        val rk = bc.value
        rows.map { case (id, text) =>
          val toks = text.split(" ").filter(_.nonEmpty).flatMap { w =>
            var syms = w.codePoints().toArray
              .map(cp => new String(Character.toChars(cp))).toVector :+ EndOfWord
            var continue = true
            while (continue && syms.length > 1) {
              val cands = syms.zip(syms.tail).zipWithIndex
                .flatMap { case (p, idx) => rk.get(p).map(r => (r, idx)) }
              if (cands.isEmpty) continue = false
              else {
                val (_, idx) = cands.minBy(_._1)
                syms = (syms.take(idx) :+ (syms(idx) + syms(idx + 1))) ++ syms.drop(idx + 2)
              }
            }
            syms
          }
          (id, toks)
        }
      }.toDF(idCol, "tokens")
  }
}

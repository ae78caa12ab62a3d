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
    * reference BPE implementations.
    */
  private def mergePair(syms: org.apache.spark.sql.Column, l: String, r: String) =
    aggregate(syms, array().cast("array<string>"), (acc, x) => {
      val lastIdx = size(acc)
      val last = element_at(acc, -1)
      when(lastIdx > 0 && last === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), lastIdx - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x)))
    })

  /** Learn `numMerges` merge rules. Returns the merges table
    * (rank, left, right, pair_count) in learned order. Stops early when no
    * pair reaches `minCount`.
    */
  def train(spark: SparkSession, docs: DataFrame, textCol: String,
      numMerges: Int, minCount: Long = 2L, checkpointEvery: Int = 4): DataFrame = {
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
    initial.unpersist()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      // adjacent pairs weighted by word count, partial-aggregated; the
      // single winner row is the only thing that reaches the driver
      val best = pairCounts(words)
        .filter(col("cnt") >= minCount)
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1)
        .as[(String, String, Long)].collect()
      best match {
        case Array((l, r, cnt)) =>
          merges += ((i.toLong, l, r, cnt))
          words = words.withColumn("syms", mergePair(col("syms"), l, r))
          if ((i + 1) % checkpointEvery == 0) {
            // eager checkpoint truncates the nested-fold plan; the
            // superseded cached copy is freed immediately — without the
            // unpersist a vocabulary-sized training retains one full
            // word-shape copy per interval for the life of the loop
            val prev = words
            words = words.localCheckpoint(true)
            prev.unpersist()
          }
          i += 1
        case _ => done = true
      }
    }
    words.unpersist()
    merges.toSeq.toDF("rank", "left", "right", "pair_count")
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

package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed token co-occurrence with pointwise mutual information — the
  * association-mining pass embedding pipelines (word2vec / GloVe / SPPMI
  * matrices, Levy & Goldberg 2014) run over a corpus before training, and
  * a useful collocation detector in its own right.
  *
  * Semantics: within each document, every unordered token pair whose
  * positions are at most `window` apart co-occurs once per position pair
  * (the skip-gram convention). With C(a,b) the pair count, C(w) unigram
  * token counts, T total tokens and P total pair occurrences:
  *
  *   pmi(a,b) = ln( (C(a,b)/P) / ((C(a)/T)·(C(b)/T)) )
  *
  * computed in doubles with a fixed operand order so an oracle engine
  * reproduces it bit-for-bit (and rounded by the caller for comparison).
  *
  * Scale shape: pair generation is a pure per-row array expression
  * (`slice` bounds the lookahead, so output is ≤ window·tokens rows of
  * fixed width — no joins, no shuffle); pair counting is one hash
  * aggregate with map-side combine on the (wa, wb) key; the unigram table
  * is vocabulary-sized and joined to the *aggregated* pair table (never
  * the raw pair stream); corpus totals ride a broadcast 1-row cross join.
  * `minPairCount` cuts the long tail before the joins, keeping the output
  * collocation-sized rather than corpus-sized.
  */
object Cooccurrence {

  /** docs → (wa, wb, cab, pmi): unordered co-occurring pairs at distance
    * ≤ `window`, with counts ≥ `minPairCount` and their PMI.
    */
  def pmiPairs(docs: DataFrame, idCol: String, textCol: String,
               window: Int = 3, minPairCount: Long = 5L): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val toks = docs.select(split(col(textCol), " ").as("ws"))

    // unigram counts + total token mass over the WHOLE corpus (1-token
    // docs contribute unigrams even though they generate no pairs)
    val uni = toks.select(explode(col("ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))
    val tokTotal = toks.select(size(col("ws")).cast("long").as("n"))
      .agg(sum(col("n")).as("tok_total"))

    // per-position lookahead pairs: for position i, every token in
    // slice(ws, i+1, window) is a co-occurrence; slice clips at the doc
    // tail, so the expression never indexes out of range
    val pairs = toks.filter(size(col("ws")) >= 2)
      .select(explode(flatten(transform(
        sequence(lit(1), size(col("ws")) - 1),
        i => transform(slice(col("ws"), i + 1, lit(window)),
          w2 => struct(
            least(element_at(col("ws"), i), w2).as("wa"),
            greatest(element_at(col("ws"), i), w2).as("wb")))))).as("p"))
      .select(col("p.wa").as("wa"), col("p.wb").as("wb"))

    val pairTotal = pairs.agg(count(lit(1)).as("pair_total"))
    val pairCounts = pairs.groupBy("wa", "wb")
      .agg(count(lit(1)).as("cab"))
      .filter(col("cab") >= minPairCount)

    // fixed operand order: ln((cab·T·T) / (P·ca·cb)) — mirrored verbatim
    // by the cross-engine oracle
    pairCounts
      .join(uni.select(col("w").as("wa"), col("cw").as("ca")), Seq("wa"))
      .join(uni.select(col("w").as("wb"), col("cw").as("cb")), Seq("wb"))
      .crossJoin(broadcast(tokTotal))
      .crossJoin(broadcast(pairTotal))
      .select(col("wa"), col("wb"), col("cab"),
        log((col("cab").cast("double") * col("tok_total") * col("tok_total")) /
          (col("pair_total").cast("double") * col("ca") * col("cb"))).as("pmi"))
  }

  /** TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004): build
    * the word adjacency graph (tokens of length ≥ `minLen` co-occurring
    * at distance 1, symmetrized) and rank words by PageRank over it —
    * the unsupervised keyword scorer a corpus-curation pipeline runs to
    * label clusters and audit topical drift without a model.
    *
    * Composition, not a new engine: the graph rides the repo-wide
    * 60-bit md5 word ids (so any oracle engine derives identical node
    * ids from the words), and the ranking IS
    * [[graft.ops.GraphRank.pageRankFixedPoint]] — the same exact
    * integer recurrence, bit-reproducible cross-engine by unrolling.
    * Top-`topK` rows by (pr DESC, word ASC) — rank ties cut
    * deterministically.
    *
    * Scale shape: adjacent-pair generation is a per-row array zip (no
    * join, ≤|tokens| pairs); the distinct edge list is one map-side-
    * combined aggregate; then the PageRank loop's documented
    * one-exchange-per-iteration shape; the final top-k is a
    * TakeOrdered, never a full sort.
    */
  def textRankKeywords(docs: DataFrame, idCol: String, textCol: String,
      minLen: Int = 4, iterations: Int = 5, topK: Int = 20): DataFrame = {
    val toks = graft.ops.Partitioning.spread(docs.select(col(textCol)))
      .select(split(col(textCol), " ").as("ws"))
    // adjacent pairs (w_i, w_{i+1}): zip the array against its own tail
    val adj = toks.filter(size(col("ws")) >= 2)
      .select(explode(zip_with(
        slice(col("ws"), lit(1), size(col("ws")) - 1),
        slice(col("ws"), lit(2), size(col("ws")) - 1),
        (a, b) => struct(a.as("wa"), b.as("wb")))).as("p"))
      .select(col("p.wa").as("wa"), col("p.wb").as("wb"))
      .filter(length(col("wa")) >= minLen && length(col("wb")) >= minLen)
      // checkpoint (round 16): adj feeds FOUR consumers (both union arms
      // of the edge list and both arms of the word table) — uncut, the
      // corpus tokenize + pair explode ran four times
      .localCheckpoint(false)
    def wid(c: org.apache.spark.sql.Column) =
      graft.functions.Md5Hash60.hash60(c)
    val edges = adj
      .select(wid(col("wa")).as("src"), wid(col("wb")).as("dst"))
      .unionAll(adj.select(wid(col("wb")).as("src"), wid(col("wa")).as("dst")))
    val words = adj.select(col("wa").as("word"))
      .unionAll(adj.select(col("wb").as("word")))
      .distinct()
      .select(wid(col("word")).as("node"), col("word"))
    graft.ops.GraphRank.pageRankFixedPoint(edges, iterations)
      .join(words, Seq("node"))
      .orderBy(col("pr").desc, col("word").asc)
      .limit(topK)
      .select(col("word"), col("pr"))
  }
}

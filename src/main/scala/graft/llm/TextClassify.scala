package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes over whitespace tokens — the trained
  * counterpart to [[TextAnalysis]]'s heuristic screens. Real corpus
  * pipelines gate documents with a cheap trained classifier (fastText-style
  * quality/language models); MNB is the distributable skeleton of that
  * component: fit = one (label, term) count aggregate, apply = one join +
  * one aggregate, no iterative state. The reference calls sklearn
  * estimators in-memory (`transformer/ranking/modeling.py:75-110`); here
  * both halves are shuffles that scale with corpus bytes.
  *
  * Model (add-one smoothing over the train vocabulary V):
  *   log P(ℓ)      = ln(docs_ℓ / docs)
  *   log P(t | ℓ)  = ln((c_{ℓt} + 1) / (T_ℓ + V))
  *   score(d, ℓ)   = log P(ℓ) + Σ_{t∈d} tf_{dt} · log P(t | ℓ)
  * Out-of-vocabulary test terms take the per-label smoothed unseen mass
  * ln(1/(T_ℓ + V)) (c = 0) and are included in EVERY label's score —
  * standard MNB: because T_ℓ differs by label the OOV contribution is
  * not label-uniform, but every score stays a total over the same term
  * set, which is what keeps the comparison cross-engine exact.
  *
  * Determinism: every ln lands on a 1e-12 long grid (floor(x·1e12 + 0.5))
  * BEFORE the per-document sum — the [[Pca]] per-term grid discipline —
  * so document scores are exact integer sums (term order cannot reassociate
  * them) and the argmax is a pure integer comparison with label-ascending
  * tie-break. Grid headroom: |ln| ≤ ~40 ⇒ 4e13 per term occurrence;
  * documents up to ~2e5 tokens stay under 2⁶³.
  *
  * Scale shape: fit = one map-side-combined (label, term) count (vocab-
  * bounded output) + a ≤|labels| prior table; apply = the test term-
  * frequency collapse cross-joined with the broadcast label table
  * (|labels| is bounded — languages, quality tiers), LEFT-joined to the
  * (term, label) model on the term key (vocab-sized, shuffle join), then
  * ONE (doc, label) aggregate and a |labels|-wide argmax window. Nothing
  * is collected; the model never leaves the cluster.
  */
object TextClassify {

  private def grid(c: Column): Column = floor(c * 1e12 + 0.5).cast("long")

  /** Fit on `train`, score every `test` document against every train
    * label: (idCol, actual, lab, s) with s the 1e-12-grid integer score
    * total — the shared kernel under [[naiveBayes]] and [[labelNoise]],
    * public so eval compositions can consume the per-label scores as a
    * RANKING signal (best-F1 / gains curves over one label's score).
    */
  def docScores(train: DataFrame, test: DataFrame, idCol: String,
      textCol: String, labelCol: String): DataFrame = {
    // spread: tokenization otherwise runs at scan parallelism (one task
    // on single-row-group local files; no-op at scale)
    val toks = (df: DataFrame, keep: Seq[Column]) => graft.ops.Partitioning
      .spread(df.filter(col(textCol).isNotNull && col(labelCol).isNotNull))
      .select(keep :+ explode(split(col(textCol), " ")).as("term"): _*)

    // ---- fit: (term, label) counts, label totals, priors, vocab size
    val tl = toks(train, Seq(col(labelCol).as("lab")))
      .groupBy("term", "lab").agg(count(lit(1)).as("c"))
      .localCheckpoint(false) // feeds totals, vocab AND the apply join
    val labTok = tl.groupBy("lab").agg(sum(col("c")).as("t_l"))
    val priors = train
      .filter(col(textCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(labelCol).as("lab")).agg(count(lit(1)).as("d_l"))
    val totals = priors.agg(sum(col("d_l")).as("d_all"))
    val vocab = tl.select("term").distinct().agg(count(lit(1)).as("v_all"))
    val labels = priors.join(labTok, "lab")
      .crossJoin(totals).crossJoin(vocab)
      .withColumn("lp_prior",
        grid(log(col("d_l").cast("double") / col("d_all"))))

    // ---- apply: test term frequencies × labels, model left-joined
    val tf = toks(test, Seq(col(idCol), col(labelCol).as("actual")))
      .groupBy(col(idCol), col("actual"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val scoredTerms = tf
      .crossJoin(broadcast(labels.select("lab", "t_l", "v_all", "lp_prior")))
      .join(tl, Seq("term", "lab"), "left")
      .withColumn("lp_term", grid(log(
        (coalesce(col("c"), lit(0L)) + lit(1L)).cast("double") /
          (col("t_l") + col("v_all")))))
    scoredTerms
      .groupBy(col(idCol), col("actual"), col("lab"))
      .agg((sum(col("tf") * col("lp_term")) + first(col("lp_prior")))
        .as("s"))
  }

  /** Fit on `train`, score+predict every `test` document.
    * Output: (idCol, actual, pred, correct, score) — score is the winning
    * log-likelihood (raw double; callers `qround`).
    */
  def naiveBayes(train: DataFrame, test: DataFrame, idCol: String,
      textCol: String, labelCol: String): DataFrame = {
    val pick = Window.partitionBy(col(idCol))
      .orderBy(col("s").desc, col("lab").asc)
    docScores(train, test, idCol, textCol, labelCol)
      .withColumn("rn", row_number().over(pick))
      .filter(col("rn") === 1)
      .select(col(idCol), col("actual"), col("lab").as("pred"),
        (col("lab") === col("actual")).as("correct"),
        (col("s").cast("double") / 1e12).as("score"))
  }

  /** Label-noise screen (confident-learning-lite): fit the model on the
    * WHOLE labeled corpus, re-score every document, and surface the ones
    * the corpus-level evidence itself votes AGAINST — pred ≠ actual, with
    *   margin = (s_pred − s_actual) / 1e12 > 0
    * as the strength of the disagreement. The cheap first pass of every
    * annotation-cleaning loop: a mislabeled document's own tokens pull
    * its score toward the right class no matter what the label column
    * says. Exact: both scores are grid-integer totals, the margin is one
    * IEEE division of their exact difference.
    *
    * Scale shape: [[docScores]]' fit+apply shape plus one |labels|-wide
    * argmax window and a broadcast-sized self-join on the actual row.
    */
  def labelNoise(df: DataFrame, idCol: String, textCol: String,
      labelCol: String): DataFrame = {
    val scores = docScores(df, df, idCol, textCol, labelCol)
      .localCheckpoint(false) // the argmax and the actual-row lookup
    val pick = Window.partitionBy(col(idCol))
      .orderBy(col("s").desc, col("lab").asc)
    val winner = scores
      .withColumn("rn", row_number().over(pick))
      .filter(col("rn") === 1)
      .select(col(idCol), col("actual"), col("lab").as("pred"),
        col("s").as("s_pred"))
    val actualRow = scores.filter(col("lab") === col("actual"))
      .select(col(idCol), col("s").as("s_act"))
    winner.join(actualRow, Seq(idCol))
      .filter(col("pred") =!= col("actual"))
      .select(col(idCol), col("actual"), col("pred"),
        ((col("s_pred") - col("s_act")).cast("double") / 1e12).as("margin"))
  }

  /** Per-term χ² feature selection (Yang & Pedersen 1997) — the vocab
    * screen a text classifier runs before [[naiveBayes]] fits: for each
    * term, the 2×2 association between DOCUMENT presence and a boolean
    * label,
    *
    *   χ² = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d))
    *
    * (a = label∧present … d = ¬label∧absent, document-level counts).
    * Top-k by the rounded χ² (term tie-break) — the terms that carry the
    * label signal; everything else is model noise.
    *
    * Exactness: a/b/c/d are exact longs from ONE (term, label) presence
    * collapse + a 1-row label-total broadcast (absent cells derive by
    * subtraction — no per-document vocab join); (ad − bc)² and the
    * marginal product widen to decimal(38,0); χ² is ONE division of
    * exact operands. NULL when any marginal is 0.
    *
    * Scale shape: one token explode → per-doc distinct collapse → one
    * term aggregate (the tf-idf shuffle class), a 1-row broadcast, one
    * TakeOrdered cut. Nothing is collected.
    */
  def termChi2(docs: DataFrame, idCol: String, textCol: String,
      labelCol: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val dec19 = org.apache.spark.sql.types.DecimalType(19, 0)
    val base = docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull &&
        labelCol.isNotNull)
      .select(col(idCol).as("doc"), labelCol.cast("boolean").as("y"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term", "doc").agg(max(col("y")).as("y")) // presence, not tf
    val perTerm = base.groupBy("term")
      .agg(count_if(col("y")).as("a"), count_if(!col("y")).as("b"))
    val tot = docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull &&
        labelCol.isNotNull)
      .agg(count_if(labelCol.cast("boolean")).as("npos"),
        count_if(!labelCol.cast("boolean")).as("nneg"))
    val joined = perTerm.crossJoin(broadcast(tot))
      .withColumn("c", col("npos") - col("a"))
      .withColumn("d", col("nneg") - col("b"))
    val det = (col("a").cast(dec19) * col("d").cast(dec19)).cast(dec) -
      (col("b").cast(dec19) * col("c").cast(dec19)).cast(dec)
    val nTot = (col("npos") + col("nneg")).cast("double")
    val marg = (col("a") + col("b")).cast("double") *
      (col("c") + col("d")).cast("double") *
      (col("a") + col("c")).cast("double") *
      (col("b") + col("d")).cast("double")
    val chi2 = nTot * det.cast("double") * det.cast("double") / marg
    joined
      .select(col("term"), col("a"), col("b"), col("c"), col("d"),
        when(col("a") + col("b") > 0 && col("c") + col("d") > 0 &&
          col("a") + col("c") > 0 && col("b") + col("d") > 0,
          floor(chi2 * 1e6 + 0.5) / 1e6).as("chi2"))
      .orderBy(col("chi2").desc, col("term").asc)
      .limit(k)
  }
}

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
    val toks = (df: DataFrame, keep: Seq[Column]) => df
      .filter(col(textCol).isNotNull && col(labelCol).isNotNull)
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
}

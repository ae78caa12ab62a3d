package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Okapi BM25 scoring — the lexical-retrieval primitive a training-data
  * pipeline uses for targeted corpus search: pulling documents that match
  * an eval-set query (contamination triage), mining domain-specific
  * subcorpora by keyword, or building sparse-retrieval baselines next to
  * the embedding ANN tiers in [[Similarity]].
  *
  * Score of a single-term query t against document d (Robertson/Walker):
  *
  *   idf(t)      = ln(1 + (N − df + 0.5)/(df + 0.5))
  *   bm25(t, d)  = idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *
  * with N docs, df the term's document frequency, dl the doc length and
  * avgdl the mean length. Multi-term query scores are sums of per-term
  * scores — callers aggregate the returned per-term rows.
  *
  * Scale shape: the corpus is tokenized once into a (term, doc) frequency
  * table (one hash aggregate); the query-term set — small by definition —
  * is BROADCAST against it, so the corpus-sized table is filtered without
  * a shuffle on the big side; df and the corpus stats are computed on the
  * already-filtered (tiny) match set and a 1-row broadcast respectively.
  * Nothing corpus-sized moves after the first aggregate.
  */
object Retrieval {

  /** docs × terms → (term, doc_id, tf, score) for every document that
    * contains the term (tf ≥ 1). `terms` is a 1-column DataFrame of
    * single tokens; it is broadcast (query sets are small).
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String, terms: DataFrame,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val t = docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("ws"))
    val stats = t.agg(count(lit(1)).as("n"),
      (sum(size(col("ws"))).cast("double") / count(lit(1))).as("avgdl"))
    val dl = t.select(col("doc_id"), size(col("ws")).as("dl"))

    val termCol = terms.columns.head
    val tf = t.select(col("doc_id"), explode(col("ws")).as("term"))
      .join(broadcast(terms.select(col(termCol).as("term"))), Seq("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))

    // fixed operand order, mirrored by the oracle SQL
    tf.join(df, Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("term"), col("doc_id"), col("tf"),
        (log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
          .as("score"))
  }
}

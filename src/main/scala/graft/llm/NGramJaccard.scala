package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact n-gram Jaccard similarity — the verification primitive under the
  * MinHash/SimHash approximations, and a standalone near-dup operator for
  * corpora small enough (or pre-bucketed enough) to afford exact set math.
  *
  * The pairing strategy is blocked self-join: pairs are only formed inside
  * a cheap deterministic block (here: token-count bucket — near-dups have
  * near-equal lengths), never corpus × corpus. Block size bounds the
  * quadratic cost; the block key is a one-expression bucket so the only
  * shuffle is the self-join on it.
  */
object NGramJaccard {

  /** Distinct word n-gram set. */
  def ngramSet(text: Column, n: Int): Column =
    array_distinct(MinHashDedup.shingles(text, n))

  def jaccard(a: Column, b: Column): Column =
    when(size(array_union(a, b)) > 0,
      size(array_intersect(a, b)).cast("double") / size(array_union(a, b)))
      .otherwise(0.0)

  /** All pairs within the same length bucket with Jaccard ≥ threshold.
    * `bucketWidth` = token-count rounding; near-equal-length docs share a
    * bucket (a doc pair differing by > bucketWidth tokens can't be a
    * near-dup at meaningful thresholds anyway).
    */
  def similarPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, bucketWidth: Int = 8, threshold: Double = 0.5): DataFrame = {
    val prepared = docs.select(
      col(idCol),
      ngramSet(col(textCol), n).as("grams"),
      floor(size(split(col(textCol), " ")) / bucketWidth).as("len_bucket"))
    val a = prepared.select(col("len_bucket"), col(idCol).as("id_a"), col("grams").as("g_a"))
    val b = prepared.select(col("len_bucket"), col(idCol).as("id_b"), col("grams").as("g_b"))
    a.join(b, Seq("len_bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("g_a"), col("g_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}

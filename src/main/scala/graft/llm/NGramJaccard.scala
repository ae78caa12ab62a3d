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
    *
    * Implementation is an INVERTED INDEX, not a pairwise array compare:
    * explode (doc → gram) postings, self-join on (bucket, gram), count
    * shared grams per pair, then |A∩B| / (|A| + |B| − |A∩B|). Cost is
    * linear in postings plus the size of the true co-occurrence graph —
    * pairs sharing zero grams are never materialized, where the naive
    * bucket cross-join touches every pair. (Pairs sharing no gram have
    * Jaccard 0 and can't pass any positive threshold, so results are
    * identical.) This is the shape that survives 100 TB; the quadratic
    * variant dies at thousands of docs per bucket.
    */
  def similarPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, bucketWidth: Int = 8, threshold: Double = 0.5,
      materialize: Boolean = true): DataFrame = {
    require(threshold > 0.0, "inverted-index Jaccard requires a positive threshold")
    val prepared = docs.select(
      col(idCol),
      ngramSet(col(textCol), n).as("grams"),
      floor(size(split(col(textCol), " ")) / bucketWidth).as("len_bucket"))
      .withColumn("n_grams", size(col("grams")))
    // both sides of the self-join read the postings; materializing once
    // avoids shingling every document twice (see MinHashDedup scaladoc)
    val postingsLazy = prepared.select(col("len_bucket"), col(idCol), col("n_grams"),
      explode(col("grams")).as("gram"))
    val postings = if (materialize) postingsLazy.localCheckpoint(false) else postingsLazy
    val a = postings.select(col("len_bucket"), col("gram"),
      col(idCol).as("id_a"), col("n_grams").as("n_a"))
    val b = postings.select(col("len_bucket"), col("gram"),
      col(idCol).as("id_b"), col("n_grams").as("n_b"))
    a.join(b, Seq("len_bucket", "gram"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "n_a", "n_b")
      .agg(count(lit(1)).as("shared"))
      .select(col("id_a"), col("id_b"),
        (col("shared").cast("double") / (col("n_a") + col("n_b") - col("shared"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}

package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact and canonical-form deduplication — the first rungs of the corpus
  * dedup ladder (near-dup lives in [[MinHashDedup]] / [[SimHashDedup]] /
  * [[NGramJaccard]]).
  *
  * The scalable exact-dedup shape is hash-groupBy, NOT `dropDuplicates`
  * with a nondeterministic survivor: group on a content hash, keep a
  * deterministic representative (min id). One shuffle on the hash — and
  * because the hash is uniformly distributed, the shuffle is skew-free by
  * construction, which is what makes this safe at 100 TB. Grouping on
  * `md5(text)` rather than `text` also keeps shuffle rows small (16 bytes
  * + ids instead of whole documents).
  */
object Dedup {

  /** Group-by content hash: one row per distinct content with the surviving
    * id (min) and the duplicate count.
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String,
      canonicalize: Boolean = false): DataFrame = {
    val key = if (canonicalize) TextAnalysis.fingerprint(col(textCol)) else md5(col(textCol))
    docs.groupBy(key.as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))
  }

  /** Deduplicated corpus: keeps exactly the representative rows (the min-id
    * row per content hash), dropping every other duplicate. Window-free
    * variant would re-join on (fp, keep_id); the window form shuffles once.
    */
  def dropExactDuplicates(docs: DataFrame, idCol: String, textCol: String,
      canonicalize: Boolean = false): DataFrame = {
    val key = if (canonicalize) TextAnalysis.fingerprint(col(textCol)) else md5(col(textCol))
    docs.withColumn("__fp", key)
      .withColumn("__rn", row_number().over(Window.partitionBy(col("__fp")).orderBy(col(idCol).asc)))
      .filter(col("__rn") === 1)
      .drop("__fp", "__rn")
  }

  /** Last-write-wins dedup by key — the batch form of the reference's
    * idempotent upsert sink (`extractor/riot/db/mongodb.py:27-67`,
    * `replace_one(upsert=True)`): for each key keep the newest version.
    * `orderCols` break ties deterministically (e.g. ts desc, id desc).
    */
  def lastWriteWins(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column]): DataFrame =
    df.withColumn("__rn",
        row_number().over(Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)))
      .filter(col("__rn") === 1)
      .drop("__rn")
}

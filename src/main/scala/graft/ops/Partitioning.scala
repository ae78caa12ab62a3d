package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Partitioning and skew control — the knobs that decide whether a plan
  * that is correct at sf0.1 is still alive at 100 TB.
  *
  * - Salting: a hot key (one match id with millions of rows, one n-gram in
  *   every document) turns a keyed shuffle into a single straggler task.
  *   Salted two-phase aggregation splits each key into `salt` subkeys,
  *   aggregates partials in parallel, then combines per original key —
  *   the map-side-combine idea applied one level deeper. AQE's skew-join
  *   splitting handles the JOIN case at runtime; salting is for the
  *   aggregate case AQE does not rewrite.
  * - Salted broadcast-replicate join: for a skewed LEFT side joining a
  *   small-but-not-tiny right side, replicate the right side `salt` times
  *   so every left subkey finds its partner without one reducer owning the
  *   hot key.
  * - Bucketing: pre-shuffling a fact table into hash buckets on its join
  *   key turns every later equi-join/agg on that key into a shuffle-free
  *   co-partitioned plan — pay the shuffle once at write time.
  */
object Partitioning {

  /** Two-phase salted aggregation: partial aggregate on (keys, salt), final
    * combine on keys. `partials` and `finals` must compose (sum/sum,
    * count/sum, min/min, ...): pass the partial aggs and the matching
    * recombiners over the partial column names.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salt: Int,
      partials: Seq[Column], finals: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
    val partial = salted.groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
    partial.groupBy(keys.map(col): _*).agg(finals.head, finals.tail: _*)
  }

  /** Skew-safe join of a skewed left side against a modest right side:
    * left rows get a random-ish salt in [0, salt); right rows are
    * replicated once per salt value; the join key becomes (key, salt).
    * Right side stays broadcastable as long as |right| × salt is small.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String], salt: Int,
      joinType: String = "inner"): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
    val replicatedRight = right
      .withColumn("__salt_i", explode(sequence(lit(0), lit(salt - 1))))
      .withColumn("__salt", col("__salt_i").cast("long")).drop("__salt_i")
    saltedLeft.join(broadcast(replicatedRight), keys :+ "__salt", joinType)
      .drop("__salt")
  }

  /** Write a table bucketed (and optionally sorted) by its join key. Later
    * equi-joins/aggregations between tables bucketed the same way run
    * without a shuffle (`SortMergeJoin` over pre-sorted buckets).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }
}

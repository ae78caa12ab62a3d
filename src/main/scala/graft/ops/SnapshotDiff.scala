package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC-style snapshot differencing: one changelog row per key present in
  * either snapshot, labeled `insert` / `delete` / `update` / `unchanged`.
  * This is the batch form of the reference's idempotent upsert-by-key sink
  * (`extractor/riot/db/mongodb.py:27-67` — replace_one(upsert=True) applied
  * between two states of the store), generalized to emit WHAT changed.
  *
  * The plan is a single full-outer join on the key columns — never a
  * driver-side collect — so it scales with the snapshots; at 100 TB,
  * pre-bucketing both snapshots on the key ([[Partitioning.bucketedWrite]])
  * makes the join shuffle-free, which is how a daily 100 TB-vs-100 TB diff
  * stays tractable.
  *
  * Null discipline: presence is tracked with literal marker columns (not
  * key nullability), so nullable compare columns never misclassify a row;
  * value comparison is null-safe (`<=>` — null vs null is `unchanged`,
  * null vs value is `update`).
  */
object SnapshotDiff {

  /** @param compare value columns whose (null-safe) inequality marks a key
    *                as updated; both snapshots must carry all `keys` and
    *                `compare` columns. Output: keys, `old_`/`new_`-prefixed
    *                compare columns, `op`.
    */
  def changelog(oldSnap: DataFrame, newSnap: DataFrame, keys: Seq[String],
      compare: Seq[String]): DataFrame = {
    val o = oldSnap.select(
      keys.map(col) ++ compare.map(c => col(c).as(s"old_$c")) :+ lit(true).as("__in_old"): _*)
    val n = newSnap.select(
      keys.map(col) ++ compare.map(c => col(c).as(s"new_$c")) :+ lit(true).as("__in_new"): _*)
    val changed = compare.map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, keys, "full_outer")
      .withColumn("op",
        when(col("__in_old").isNull, lit("insert"))
          .when(col("__in_new").isNull, lit("delete"))
          .when(changed, lit("update"))
          .otherwise(lit("unchanged")))
      .drop("__in_old", "__in_new")
  }

  /** The inverse operation — apply a changelog to a snapshot:
    * `applyChangelog(old, changelog(old, new)) ≡ new` (the round-trip
    * identity `q_cdc_apply` oracle-pins). Deletes drop their keys,
    * inserts/updates take the `new_` values, everything else carries
    * through untouched.
    *
    * Scale shape — the reason CDC exists: work is O(|delta|), not
    * O(|snapshot|). Unchanged rows never re-materialize through the
    * changelog: the only snapshot-sized operation is one LEFT ANTI join
    * against the touched-key set, which AQE broadcasts whenever the
    * delta is small (the daily-feed case); upserts are a union of
    * delta-sized rows. With both sides bucketed by key the anti join is
    * exchange-free too.
    */
  def applyChangelog(oldSnap: DataFrame, changelog: DataFrame,
                     keys: Seq[String], compare: Seq[String]): DataFrame = {
    val delta = changelog.filter(col("op") =!= "unchanged")
    val touched = delta.select(keys.map(col): _*)
    val kept = oldSnap.select(keys.map(col) ++ compare.map(col): _*)
      .join(touched, keys, "left_anti")
    val upserts = delta.filter(col("op").isin("insert", "update"))
      .select(keys.map(col) ++ compare.map(c => col(s"new_$c").as(c)): _*)
    kept.unionByName(upserts)
  }
}

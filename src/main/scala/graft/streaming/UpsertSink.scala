package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** Idempotent key-based upsert sink — the reference's
  * `replace_one({_id}, doc, upsert=True)` Mongo writes
  * (`extractor/riot/db/mongodb.py:27-107`): at-least-once delivery +
  * last-write-wins by key = effectively-exactly-once contents.
  *
  * Log-structured design: each micro-batch appends a parquet delta under
  * `dir/delta_<epoch>/`; readers (and the periodic compactor) resolve the
  * current state with a last-write-wins window over (key, version). This is
  * the scalable shape — appends are cheap and parallel, conflict resolution
  * is one shuffle at read/compact time, and replaying a batch (Spark's
  * at-least-once `foreachBatch` contract) is harmless because the same
  * (key, version) rows resolve identically.
  */
object UpsertSink {

  /** foreachBatch body: append the batch as a delta, tagged with batchId so
    * replays overwrite their own delta deterministically.
    */
  def writeDelta(batch: DataFrame, batchId: Long, dir: String): Unit =
    batch.write.mode("overwrite").parquet(s"$dir/delta_$batchId")

  /** Resolve current state: newest row per key across all deltas. */
  def readCurrent(spark: SparkSession, dir: String, keyCols: Seq[String],
      versionCols: Seq[String]): DataFrame = {
    val all = spark.read.parquet(s"$dir/delta_*")
    Dedup.lastWriteWins(all, keyCols, versionCols.map(col(_).desc))
  }

  /** Compact all deltas into a single resolved snapshot (run periodically;
    * readers between compactions pay one window over the delta tail).
    */
  def compact(spark: SparkSession, dir: String, keyCols: Seq[String],
      versionCols: Seq[String]): Unit = {
    val current = readCurrent(spark, dir, keyCols, versionCols).cache()
    current.count() // materialize before deleting inputs
    current.write.mode("overwrite").parquet(s"$dir/compacted_tmp")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val base = new org.apache.hadoop.fs.Path(dir)
    fs.listStatus(base).filter(_.getPath.getName.startsWith("delta_"))
      .foreach(s => fs.delete(s.getPath, true))
    fs.rename(new org.apache.hadoop.fs.Path(s"$dir/compacted_tmp"),
      new org.apache.hadoop.fs.Path(s"$dir/delta_0"))
    current.unpersist()
  }
}

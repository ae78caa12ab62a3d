package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-aware parquet sinks: the write-side layout decisions that make
  * 100 TB readable. A table partitioned by a low-cardinality predicate
  * column (date, event type, language) turns every query filtering on it
  * into a directory prune — the scan never opens non-matching partitions
  * (`PartitionFilters` in the plan, vs row-group-level `PushedFilters`).
  *
  * Cardinality rule: partition columns must stay in the hundreds-to-
  * thousands of values (directories), never ids; high-cardinality layout
  * belongs to bucketing ([[Partitioning.writeBucketed]]) or sort-within-
  * partition (min/max row-group pruning on the sorted column).
  */
object Sinks {

  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      sortCols: Seq[String] = Nil): Unit = {
    val sorted = if (sortCols.nonEmpty)
      df.sortWithinPartitions(sortCols.map(col): _*) else df
    sorted.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}

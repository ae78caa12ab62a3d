package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (`/root/testdata/sf*`; see TESTDATA.md). Plain `spark.read.parquet` so
  * Catalyst's parquet source handles predicate pushdown, column pruning and
  * row-group skipping — the scan-side optimizations the reference hand-wrote
  * as Mongo query documents (`transformer/ranking/data_extractor.py:52-63`).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "region")
  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) (read as long via
    * `spark.sql.legacy.parquet.nanosAsLong`) and as TIMESTAMP(MICROS)
    * without timezone (read as TIMESTAMP_NTZ under Spark 4's
    * `parquet.inferTimestampNTZ` default) across driver data drops. This
    * loader normalizes every form to a session-zone TIMESTAMP — sessions
    * pin UTC, so the NTZ→LTZ cast is wall-clock-identical to DuckDB's
    * naive read, and the nanos path floors to micros exactly like DuckDB's
    * nanos→micros truncation. All downstream `unix_micros`/window/range
    * arithmetic assumes this canonical type.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}

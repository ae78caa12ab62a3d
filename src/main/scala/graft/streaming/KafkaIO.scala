package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._

/** S7 — Kafka source/sink (SURVEY.md §2, row S7; reference anchor:
  * `common/kafka/__init__.py:1-3`, a docstring-only stub — nothing in the
  * reference ever produces or consumes a topic).
  *
  * The Spark-native form is the built-in `kafka` data source
  * (`spark-sql-kafka-0-10`): a streaming scan that maps one topic-partition
  * to one input partition and scales ingestion with the topic's partition
  * count — plus pure-Column envelope transforms between the Kafka wire
  * record and typed rows. The envelope logic here is the real, tested
  * surface (it is what a pipeline author writes); the connector wiring is
  * exact but NOT executable in this sandbox — the connector is a separate
  * artifact from Spark core and no broker/jar is available offline, so
  * [[readStream]]/[[writeTo]] fail fast with Spark's missing-data-source
  * error until the jar is on the classpath (KafkaIOSpec pins that failure
  * mode, and StreamingSpec drives the same envelope transforms through a
  * file-backed stream carrying the identical wire schema).
  */
object KafkaIO {

  /** The record schema `format("kafka")` emits — one row per Kafka record.
    * Key/value are raw bytes (Kafka is payload-agnostic); everything else
    * is broker metadata. `timestampType`: 0 = CreateTime, 1 = LogAppendTime.
    */
  val recordSchema: StructType = StructType(Seq(
    StructField("key", BinaryType, nullable = true),
    StructField("value", BinaryType, nullable = true),
    StructField("topic", StringType, nullable = true),
    StructField("partition", IntegerType, nullable = true),
    StructField("offset", LongType, nullable = true),
    StructField("timestamp", TimestampType, nullable = true),
    StructField("timestampType", IntegerType, nullable = true)))

  /** Micro-batch stream over a topic (earliest → latest by default).
    * `maxOffsetsPerTrigger` is the O4 queue-drain cap in Kafka terms:
    * backpressure by bounding records per micro-batch.
    */
  def readStream(spark: SparkSession, bootstrapServers: String, topics: String,
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Option[Long] = None): DataFrame = {
    val r = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topics)
      .option("startingOffsets", startingOffsets)
    maxOffsetsPerTrigger.fold(r)(n => r.option("maxOffsetsPerTrigger", n.toString)).load()
  }

  /** One-shot batch read of a topic's current contents (the backfill path). */
  def readBatch(spark: SparkSession, bootstrapServers: String, topics: String): DataFrame =
    spark.read.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topics)
      .option("startingOffsets", "earliest").option("endingOffsets", "latest")
      .load()

  /** Decode UTF-8 JSON values from Kafka records into typed columns:
    * broker metadata kept, payload fields lifted to top level. Malformed
    * payloads yield null fields (from_json PERMISSIVE) — the S3
    * error→null contract, never a dropped record.
    */
  def decodeJson(records: DataFrame, payloadSchema: StructType): DataFrame =
    records.select(
        col("topic"), col("partition"), col("offset"), col("timestamp"),
        from_json(col("value").cast("string"), payloadSchema).as("payload"))
      .select(col("topic"), col("partition"), col("offset"), col("timestamp"),
        col("payload.*"))

  /** Encode rows into the Kafka SINK contract — (key binary, value binary)
    * with the whole row as a JSON value. Keying by a stable id keeps a
    * key's records in one topic-partition (per-key ordering, the upsert
    * sink's prerequisite downstream).
    */
  def encodeJson(df: DataFrame, keyCol: String): DataFrame =
    df.select(
      col(keyCol).cast("string").cast("binary").as("key"),
      to_json(struct(df.columns.map(col): _*)).cast("binary").as("value"))

  /** Stream-write encoded records to a topic (exactly-once to Kafka is
    * at-least-once + idempotent producer semantics; the checkpoint carries
    * the source offsets).
    */
  def writeTo(encoded: DataFrame, bootstrapServers: String, topic: String,
      checkpointLocation: String): DataStreamWriter[org.apache.spark.sql.Row] =
    encoded.writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("checkpointLocation", checkpointLocation)
}

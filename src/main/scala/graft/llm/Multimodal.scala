package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus batch decode / feature-extract / frame-sample
  * operators.
  *
  * The Spark-side plumbing is real and tested — schema, partitioning,
  * iterator-batched `mapPartitions` (the Scala analog of `mapInPandas`:
  * one decoder instantiation per partition, streaming batches, never
  * collecting a partition into memory). The codec itself is STUBBED with a
  * deterministic fake (`FakeCodec`) because no image/audio libraries exist
  * in this environment — swap `Codec` for a real implementation (JavaCV,
  * TwelveMonkeys, ffmpeg-cli wrapper) without touching the plumbing.
  *
  * Scale notes: payloads stay columnar-compressed in parquet; metadata-only
  * queries never read the binary column (columnar pruning); decode runs
  * narrow (no shuffle) and should be partitioned by size —
  * `spark.sql.files.maxPartitionBytes` bounds executor memory per task
  * since each task holds at most a batch of decoded frames.
  */
object Multimodal {

  /** media row: payload + metadata struct (FIXTURES-style). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),         // image | audio | video
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType)
    )))
  ))

  /** Decoder contract. Real implementations decode `payload`; the fake is
    * deterministic on the payload bytes so tests are stable.
    */
  trait Codec extends Serializable {
    def decodeDims(payload: Array[Byte]): (Int, Int)
    def extractFeatures(payload: Array[Byte], n: Int): Array[Float]
    /** Resize: returns the transformed payload for (w, h). The fake keeps
      * bytes deterministic; a real codec would re-encode pixels.
      */
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte]
  }

  /** Deterministic stand-in: "dimensions" and "features" derived from byte
    * content. Replace with a real codec in production.
    */
  object FakeCodec extends Codec {
    def decodeDims(payload: Array[Byte]): (Int, Int) = {
      val h = java.util.Arrays.hashCode(payload)
      (math.abs(h % 1920) + 1, math.abs((h / 1920) % 1080) + 1)
    }
    def extractFeatures(payload: Array[Byte], n: Int): Array[Float] = {
      val out = new Array[Float](n)
      var i = 0
      while (i < n) {
        out(i) = (if (payload.isEmpty) 0 else payload(i % payload.length).toInt) / 128.0f
        i += 1
      }
      out
    }
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
      (s"resized:${w}x$h:".getBytes("UTF-8") ++ payload).take(math.max(16, w * h / 1000))
  }

  private val decodedSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("features", ArrayType(FloatType))))

  /** Batch decode + feature extraction. `mapPartitions` so the codec is
    * initialized once per partition, and rows are pulled in bounded
    * `batchSize` groups (the Arrow-batch shape of a scalar-iterator Pandas
    * UDF): a real decoder amortizes setup per batch, and memory per task is
    * bounded by one decoded batch, never a whole partition.
    */
  def decodeAndFeaturize(media: DataFrame, codec: Codec, featureDim: Int = 16,
      batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("media_id"), col("payload")).rdd.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // one codec invocation context per batch
        batch.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val (w, h) = codec.decodeDims(payload)
          Row(id, w, h, codec.extractFeatures(payload, featureDim).toSeq)
        }
      }
    }
    spark.createDataFrame(rdd, decodedSchema)
  }

  private val resizedSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Batch resize to a target box: same iterator-batched shape; output
    * payload replaces the input (write it back with an upsert by
    * media_id). Partition sizing note: cap input split bytes
    * (`spark.sql.files.maxPartitionBytes`) so a task holds ≤ one batch of
    * decoded frames.
    */
  def resizeTo(media: DataFrame, codec: Codec, w: Int, h: Int,
      batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("media_id"), col("payload")).rdd.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        Row(r.getLong(0), codec.resize(r.getAs[Array[Byte]](1), w, h), w, h)
      })
    }
    spark.createDataFrame(rdd, resizedSchema)
  }

  /** Frame sampling for video-kind rows: emit `frames` evenly spaced
    * (media_id, frame_idx, ts_ms) rows — pure expression, generator-based,
    * no decode needed for the schedule itself.
    */
  def sampleFrames(media: DataFrame, frames: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("meta.duration_ms").as("duration_ms"),
        posexplode(sequence(lit(0), lit(frames - 1))))
      .select(col("media_id"), col("pos").cast("long").as("frame_idx"),
        (col("col") * col("duration_ms") / frames).cast("long").as("ts_ms"))

  /** Metadata projection: never touches `payload` (columnar pruning keeps
    * the scan tiny even when payloads are GB-scale).
    */
  def metadataOnly(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("kind"), col("meta.mime").as("mime"),
      octet_length(col("payload")).cast("long").as("n_bytes"), md5(col("payload")).as("digest"))
}

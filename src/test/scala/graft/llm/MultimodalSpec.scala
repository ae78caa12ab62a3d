package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val media = {
    val rows = Seq(
      Row(1L, "image", "fake-image-bytes-aaaa".getBytes("UTF-8"),
        Row("image/png", 640, 480, null)),
      Row(2L, "video", "fake-video-bytes-bbbbbb".getBytes("UTF-8"),
        Row("video/mp4", 1920, 1080, 4000L)),
      Row(3L, "audio", "fake-audio".getBytes("UTF-8"),
        Row("audio/wav", null, null, 2500L))
    )
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
  }

  test("metadata projection never decodes: sizes and digests only") {
    val m = Multimodal.metadataOnly(media).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("n_bytes")).toMap
    assert(m(1L) === "fake-image-bytes-aaaa".length.toLong)
    assert(m(3L) === "fake-audio".length.toLong)
  }

  test("decodeAndFeaturize: one feature vector per row, deterministic") {
    val a = Multimodal.decodeAndFeaturize(media, Multimodal.FakeCodec, featureDim = 8).collect()
    val b = Multimodal.decodeAndFeaturize(media.repartition(3), Multimodal.FakeCodec, featureDim = 8)
      .collect()
    assert(a.length === 3)
    val fa = a.map(r => r.getLong(0) -> r.getSeq[Float](3)).toMap
    val fb = b.map(r => r.getLong(0) -> r.getSeq[Float](3)).toMap
    assert(fa === fb) // partitioning-independent
    assert(fa(1L).length === 8)
    a.foreach { r => assert(r.getInt(1) > 0 && r.getInt(2) > 0) }
  }

  test("resize: batched, deterministic, dims stamped") {
    val out = Multimodal.resizeTo(media, Multimodal.FakeCodec, 320, 240, batchSize = 2)
      .collect().map(r => r.getLong(0) -> (r.getAs[Array[Byte]](1), r.getInt(2), r.getInt(3))).toMap
    assert(out.size === 3)
    out.values.foreach { case (p, w, h) => assert(w === 320 && h === 240 && p.nonEmpty) }
    val again = Multimodal.resizeTo(media.repartition(3), Multimodal.FakeCodec, 320, 240)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(again === out.map { case (k, (p, _, _)) => k -> p.toSeq })
  }

  test("frame sampling: evenly spaced schedule for video rows only") {
    val frames = Multimodal.sampleFrames(media, frames = 4).collect()
    assert(frames.length === 4)
    assert(frames.forall(_.getAs[Long]("media_id") == 2L))
    val ts = frames.sortBy(_.getAs[Long]("frame_idx")).map(_.getAs[Long]("ts_ms"))
    assert(ts.toSeq === Seq(0L, 1000L, 2000L, 3000L))
  }
}

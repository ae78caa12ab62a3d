package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Canned paginated endpoints (zero egress): 10 ids per page, id text
  * deterministic in (page, pos). Public no-arg constructors — the source
  * instantiates clients by class name on driver and executors.
  */
class SevenPageClient extends HttpIdStreamSource.PageClient {
  override def pagesAvailable(): Long = 7L
  override def fetchPage(page: Long): Seq[String] =
    (0 until 10).map(i => s"KR_${page}_$i")
}

/** The same endpoint after three more pages were published — pages 0-6
  * identical (the committed-log contract), 7-9 new.
  */
class TenPageClient extends SevenPageClient {
  override def pagesAvailable(): Long = 10L
}

class HttpIdStreamSourceSpec extends SparkSpec {

  private val fmt = classOf[HttpIdSourceProvider].getName

  test("batch read: all available pages, one partition each, (page,pos,id) rows") {
    val df = spark.read.format(fmt)
      .option("client", classOf[SevenPageClient].getName).load()
    assert(df.rdd.getNumPartitions === 7)
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.length === 70)
    assert(rows.map(_._3).distinct.length === 70)
    assert(rows.forall { case (page, pos, id) => id == s"KR_${page}_$pos" })
  }

  test("micro-batch stream: admission control paces pages per trigger") {
    val ckpt = Files.createTempDirectory("http_src_ckpt").toString
    val q = spark.readStream.format(fmt)
      .option("client", classOf[SevenPageClient].getName)
      .option("maxPagesPerTrigger", "3")
      .load()
      .writeStream.format("memory").queryName("http_ids_paced")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val perBatch = q.recentProgress.map(_.numInputRows).filter(_ > 0).sorted.toSeq
    assert(perBatch === Seq(10L, 30L, 30L), s"got $perBatch")  // 3+3+1 pages
    assert(spark.table("http_ids_paced").count() === 70)
    assert(spark.table("http_ids_paced").select("id").distinct().count() === 70)
  }

  test("checkpoint resume: a restarted query reads only newly published pages") {
    // a recovery-capable sink (the memory sink can't resume): parquet out
    val ckpt = Files.createTempDirectory("http_src_resume").toString
    val out = Files.createTempDirectory("http_src_out").toString
    def run(clientCls: String): Unit = {
      val q = spark.readStream.format(fmt)
        .option("client", clientCls).load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run(classOf[SevenPageClient].getName)
    assert(spark.read.parquet(out).count() === 70)

    // endpoint grows to 10 pages; restart from the SAME checkpoint —
    // the committed offset (7 pages) must hold, so only pages 7-9 arrive
    run(classOf[TenPageClient].getName)
    val all = spark.read.parquet(out)
    assert(all.count() === 100, "restart re-read already-committed pages")
    assert(all.select("id").distinct().count() === 100, "duplicate ids after resume")
    assert(all.groupBy("page").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
      === (0L until 10L).map(_ -> 10L).toMap)
  }
}

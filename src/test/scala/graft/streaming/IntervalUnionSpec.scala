package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming interval union: the final-per-key emitted row must equal the
  * batch sweep regardless of micro-batch slicing, and the open-island
  * state must merge touching/overlapping windows exactly.
  */
class IntervalUnionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
  private def sec(t: Timestamp): Long = t.getTime / 1000

  private def iv(u: Long, start: String, minutes: Long): IntervalUnion.Interval = {
    val t = ts(start)
    IntervalUnion.Interval(u, t, sec(t), sec(t) + minutes * 60)
  }

  private def runSliced(slices: Seq[Seq[IntervalUnion.Interval]])
      : Map[Long, (Long, Long, Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[IntervalUnion.Interval]
    val name = "iu_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = IntervalUnion.unionStats(in.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    slices.foreach { s => in.addData(s); q.processAllAvailable() }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("n_intervals").desc)
    val out = spark.table(name)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .as[(Long, Long, Long, Long, Long, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    q.stop()
    spark.catalog.dropTempView(name)
    out
  }

  test("final per-key stats are micro-batch-slicing invariant and match the batch sweep") {
    // user 1: [09:00,09:30) + [09:20,09:50) overlap → one island 50 min;
    //         [11:00,11:10) disjoint → second island; span 09:00→11:10
    // user 2: [09:00,09:10) + touching [09:10,09:20) → ONE island
    val all = Seq(
      iv(1L, "09:00", 30), iv(1L, "09:20", 30), iv(1L, "11:00", 10),
      iv(2L, "09:00", 10), iv(2L, "09:10", 10))
    val expected = Map(
      1L -> ((3L, 2L, 3600L, 7800L, 4200L)),
      2L -> ((2L, 1L, 1200L, 1200L, 0L)))
    assert(runSliced(Seq(all)) === expected)                  // one batch
    // one interval per batch, replayed in EVENT-TIME order (the ordered-
    // slab replay contract — arbitrary key interleaving across batches
    // would put old rows behind the advancing watermark and drop them)
    assert(runSliced(all.sortBy(_.s).map(Seq(_))) === expected)
    assert(runSliced(Seq(all.take(2), all.drop(2))) === expected)
    // batch operator agrees row-for-row
    val batch = graft.ops.Intervals.unionStats(
        all.toDF("user_id", "ts", "s", "e"), "user_id", "s", "e")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(batch === expected)
  }

  test("mergeSweep merges touching and contained intervals, keeps gaps") {
    assert(IntervalUnion.mergeSweep(List((10L, 20L), (20L, 30L))) ===
      List((10L, 30L)))                       // touching merges
    assert(IntervalUnion.mergeSweep(List((10L, 40L), (15L, 20L))) ===
      List((10L, 40L)))                       // containment collapses
    assert(IntervalUnion.mergeSweep(List((30L, 40L), (10L, 20L))) ===
      List((10L, 20L), (30L, 40L)))           // order-free, gap kept
    assert(IntervalUnion.mergeSweep(Nil) === Nil)
  }
}

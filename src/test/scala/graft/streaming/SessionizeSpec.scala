package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("stateful sessionize: gaps split sessions, state persists across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Sessionize.Event]
    val q = Sessionize.sessions(in.toDS(), watermark = "2 hours")
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()

    // batch 1: user 1 — two close events (one session), then a 40-min gap
    in.addData(
      Sessionize.Event(1L, 1L, ts("09:00")),
      Sessionize.Event(1L, 2L, ts("09:10")),
      Sessionize.Event(1L, 3L, ts("09:55")))
    q.processAllAvailable()
    // batch 2: user 1 continues within gap of event 3 → same session as 3;
    // user 2 starts fresh
    in.addData(
      Sessionize.Event(1L, 4L, ts("10:05")),
      Sessionize.Event(2L, 5L, ts("10:00")))
    q.processAllAvailable()

    val out = spark.table("sessions").as[Sessionize.Sessionized].collect()
      .map(s => s.event_id -> s.session_id).toMap
    q.stop()
    assert(out(1L) === 0L && out(2L) === 0L) // same session
    assert(out(3L) === 1L)                   // 45-min gap → new session
    assert(out(4L) === 1L)                   // cross-batch continuation (10-min gap)
    assert(out(5L) === 0L)                   // new user starts at session 0
  }

  test("observed counters surface per action") {
    @volatile var seen: Option[(Long, Long)] = None
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        qe.observedMetrics.get("counters").foreach { row =>
          seen = Some((row.getAs[Long]("n_rows"), row.getAs[Long]("n_keys_approx")))
        }
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val df = Seq((1L, "a"), (2L, "b"), (2L, "c")).toDF("user_id", "v")
      Sessionize.withCounters(df).collect()
      // listener delivery is async; poll briefly
      val deadline = System.currentTimeMillis() + 10000
      while (seen.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(seen.exists(_._1 == 3L))
    } finally spark.listenerManager.unregister(listener)
  }
}

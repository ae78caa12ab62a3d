package graft.ops

import java.sql.Timestamp
import graft.SparkSpec

class CohortFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("retention: cohorts by first-seen day, offsets counted once per user-day") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 18:00:00")),
      (1L, ts("2024-01-03 09:00:00")),
      (2L, ts("2024-01-01 23:00:00")), (2L, ts("2024-01-02 01:00:00")),
      (3L, ts("2024-01-02 12:00:00"))).toDF("user_id", "ts")
    val out = Cohort.retention(df, "user_id", "ts")
      .as[(java.sql.Date, Long, Long, Long, Double)].collect()
      .map(r => (r._1.toString, r._2) -> ((r._3, r._4, r._5))).toMap
    // cohort 01-01 has users {1,2}: day0 both, day1 only user 2, day2 only user 1
    assert(out(("2024-01-01", 0L)) === ((2L, 2L, 1.0)))
    assert(out(("2024-01-01", 1L)) === ((1L, 2L, 0.5)))
    assert(out(("2024-01-01", 2L)) === ((1L, 2L, 0.5)))
    assert(out(("2024-01-02", 0L)) === ((1L, 1L, 1.0)))
    assert(out.size === 4)
  }

  test("retention drops null users and null timestamps") {
    val df = Seq(
      (Some(1L), Some(ts("2024-01-01 10:00:00"))),
      (None, Some(ts("2024-01-01 11:00:00"))),
      (Some(1L), None)).toDF("user_id", "ts")
    val out = Cohort.retention(df, "user_id", "ts").collect()
    assert(out.length === 1 && out.head.getLong(2) === 1L)
  }

  test("funnel: order matters — stage events before the prior stage do not count") {
    val df = Seq(
      // u1 completes a->b->c in order
      (1L, ts("2024-01-01 10:00:00"), "a"), (1L, ts("2024-01-01 11:00:00"), "b"),
      (1L, ts("2024-01-01 12:00:00"), "c"),
      // u2 has b BEFORE a, and no b after -> stops at stage a
      (2L, ts("2024-01-01 09:00:00"), "b"), (2L, ts("2024-01-01 10:00:00"), "a"),
      // u3 reaches b; c is simultaneous with b (not strictly after) -> stops at b
      (3L, ts("2024-01-01 08:00:00"), "a"), (3L, ts("2024-01-01 09:00:00"), "b"),
      (3L, ts("2024-01-01 09:00:00"), "c"),
      // u4 never does a
      (4L, ts("2024-01-01 07:00:00"), "b")).toDF("user_id", "ts", "event_type")
    val out = Funnel.conversion(df, "user_id", "ts", "event_type", Seq("a", "b", "c"))
      .as[(Long, String, Long, Double, Double)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ===
      Seq((1L, "a", 3L), (2L, "b", 2L), (3L, "c", 1L)))
    assert(out(0)._4 === 1.0 && out(0)._5 === 1.0)
    assert(math.abs(out(1)._4 - 2.0 / 3) < 1e-12 && math.abs(out(1)._5 - 2.0 / 3) < 1e-12)
    assert(math.abs(out(2)._4 - 1.0 / 3) < 1e-12 && out(2)._5 === 0.5)
  }

  test("funnel uses the earliest qualifying event per stage, not any event") {
    // u1: a@10, b@11, b@09 (pre-a ignored), c@10:30 BEFORE first valid b -> no c
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"), (1L, ts("2024-01-01 09:00:00"), "b"),
      (1L, ts("2024-01-01 11:00:00"), "b"), (1L, ts("2024-01-01 10:30:00"), "c"))
      .toDF("user_id", "ts", "event_type")
    val out = Funnel.conversion(df, "user_id", "ts", "event_type", Seq("a", "b", "c"))
      .as[(Long, String, Long, Double, Double)].collect().sortBy(_._1)
    assert(out.map(_._3).toSeq === Seq(1L, 1L, 0L))
  }

  test("funnel with a single stage returns one row with unit conversions") {
    val df = Seq((1L, ts("2024-01-01 10:00:00"), "a")).toDF("user_id", "ts", "event_type")
    val out = Funnel.conversion(df, "user_id", "ts", "event_type", Seq("a"))
      .as[(Long, String, Long, Double, Double)].collect()
    assert(out.toSeq === Seq((1L, "a", 1L, 1.0, 1.0)))
  }

  test("ltvCurve: cumulative revenue per user by cohort age") {
    // u1 (cohort day 1): 100 then 50 next day; u2 (same cohort): 200 on
    // day 0 → cells (0, 300) and (1, 50); ltv 150 then 175
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-02 09:00:00"), 50L),
      (2L, ts("2024-01-01 23:00:00"), 200L))
      .toDF("user_id", "ts", "cents")
    val out = Cohort.ltvCurve(df, "user_id", "ts", "cents")
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out(0L) === ((300L, 300L, 2L, 150.0)))
    assert(out(1L) === ((50L, 350L, 2L, 175.0)))
  }

  test("sequencePatterns: 2- and 3-gram mining with entity support") {
    val df = Seq(
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"), (1L, 3L, 3L, "a"),
      (1L, 4L, 4L, "b"),
      (2L, 1L, 5L, "a"), (2L, 2L, 6L, "b"))
      .toDF("u", "ts", "id", "et")
    val out = graft.ops.Attribution.sequencePatterns(df, "u", "ts", "id",
        "et", maxN = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(out(("a>b", 2L)) === ((2L, 3L)))
    assert(out(("b>a", 2L)) === ((1L, 1L)))
    assert(out(("a>b>a", 3L)) === ((1L, 1L)))
    assert(out(("b>a>b", 3L)) === ((1L, 1L)))
    assert(out.size === 4)
  }
}

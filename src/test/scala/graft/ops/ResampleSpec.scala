package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Date

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  // key a: obs on day 1 and 4 (value null on 4 per col2); key b: single day
  private lazy val daily = Seq(
    ("a", d("2024-01-01"), Some(10L), Some(1.0)),
    ("a", d("2024-01-04"), Some(40L), None: Option[Double]),
    ("b", d("2024-02-10"), None: Option[Long], Some(7.0))
  ).toDF("k", "day", "v", "w")

  test("grid covers every day of each key's span, inclusive") {
    val out = Resample.dailyGridFfill(daily, Seq("k"), "day", Seq("v", "w"))
    val days = out.filter(col("k") === "a").select("day").as[Date].collect().map(_.toString).sorted
    assert(days === Array("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"))
    assert(out.filter(col("k") === "b").count() === 1)
  }

  test("forward fill carries the last non-null; interior nulls inherit") {
    val out = Resample.dailyGridFfill(daily, Seq("k"), "day", Seq("v", "w"))
      .filter(col("k") === "a").orderBy("day")
      .select("v", "w").collect()
    assert(out.map(r => r.getLong(0)).toSeq === Seq(10L, 10L, 10L, 40L))
    // w observed only on day 1 -> carried through day 4 (day-4 null inherits)
    assert(out.map(r => r.getDouble(1)).toSeq === Seq(1.0, 1.0, 1.0, 1.0))
  }

  test("days before a key's first observation stay null (no backfill)") {
    val withLead = Seq(
      ("c", d("2024-03-01"), None: Option[Long]),
      ("c", d("2024-03-03"), Some(5L))
    ).toDF("k", "day", "v")
    val out = Resample.dailyGridFfill(withLead, Seq("k"), "day", Seq("v"))
      .orderBy("day").select("v").collect()
    assert(out(0).isNullAt(0) && out(1).isNullAt(0) && out(2).getLong(0) === 5L)
  }

  test("empty input produces an empty grid, not an error") {
    val empty = daily.filter(col("k") === "zzz")
    assert(Resample.dailyGridFfill(empty, Seq("k"), "day", Seq("v", "w")).count() === 0)
  }

  test("result is partitioning-independent") {
    val a = Resample.dailyGridFfill(daily.repartition(7), Seq("k"), "day", Seq("v", "w"))
      .orderBy("k", "day").collect().toSeq
    val b = Resample.dailyGridFfill(daily.coalesce(1), Seq("k"), "day", Seq("v", "w"))
      .orderBy("k", "day").collect().toSeq
    assert(a === b)
  }

  test("dailyGridInterp: straight line through gaps, exact at observations, no extrapolation") {
    // obs at day 1 (v=10) and day 4 (v=40): days 2,3 interpolate to 20, 30
    val obs = Seq(
      ("a", d("2024-03-01"), 10L),
      ("a", d("2024-03-04"), 40L),
      ("b", d("2024-03-01"), 7L) // singleton key: grid of one, exact value
    ).toDF("k", "day", "v")
    val got = Resample.dailyGridInterp(obs, Seq("k"), "day", "v")
      .orderBy("k", "day")
      .select("k", "day", "v_interp")
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(got.toSeq === Seq(
      ("a", "2024-03-01", Some(10.0)),
      ("a", "2024-03-02", Some(20.0)),
      ("a", "2024-03-03", Some(30.0)),
      ("a", "2024-03-04", Some(40.0)),
      ("b", "2024-03-01", Some(7.0))))
    // a null-valued observed day inside the span interpolates too, and a
    // null BEFORE the first real observation stays null
    val withNull = Seq(
      ("c", d("2024-03-01"), None: Option[Long]),
      ("c", d("2024-03-02"), Some(10L)),
      ("c", d("2024-03-04"), Some(30L))
    ).toDF("k", "day", "v")
    val out = Resample.dailyGridInterp(withNull, Seq("k"), "day", "v")
      .orderBy("day").select("v_interp").collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getDouble(0) === 10.0)
    assert(out(2).getDouble(0) === 20.0)
    assert(out(3).getDouble(0) === 30.0)
  }
}

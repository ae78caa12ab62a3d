package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  private lazy val left = Seq(
    (1L, ts(10), "p1"), (1L, ts(30), "p2"), (2L, ts(5), "p3"), (1L, ts(20), "p4")
  ).toDF("user_id", "ts", "pid")
  private lazy val right = Seq(
    (1L, ts(8), "v1", 1.0), (1L, ts(20), "v2", 2.0), (2L, ts(9), "v3", 3.0)
  ).toDF("user_id", "ts", "vid", "value")

  test("backward as-of: greatest right ts <= left ts, per key, inclusive") {
    val j = AsOfJoin.backward(left, right, Seq("user_id"), "ts")
      .collect().map(r => r.getAs[String]("pid") ->
        Option(r.getAs[String]("r_vid"))).toMap
    assert(j("p1") === Some("v1"))  // 10:10 → v1@10:08
    assert(j("p4") === Some("v2"))  // 10:20 → v2@10:20 (inclusive, equal ts)
    assert(j("p2") === Some("v2"))  // 10:30 → v2 still prevailing
    assert(j("p3") === None)        // 10:05 precedes user 2's only view
  }

  test("keys are isolated: no cross-user matches") {
    val j = AsOfJoin.backward(left, right, Seq("user_id"), "ts")
    // user 2's purchase can't see user 1's views
    assert(j.filter(col("user_id") === 2 && col("r_vid").isNotNull).count() === 0)
  }

  test("left-outer shape: every left row survives") {
    assert(AsOfJoin.backward(left, right, Seq("user_id"), "ts").count() === left.count())
  }

  test("property: matches a brute-force reference on random data") {
    val rng = new scala.util.Random(7)
    val lRows = (1 to 200).map(i => (rng.nextInt(8).toLong, ts(rng.nextInt(60)), s"L$i"))
    val rRows = (1 to 150).map(i => (rng.nextInt(8).toLong, ts(rng.nextInt(60)), s"R$i", rng.nextDouble()))
    // de-dup right timestamps per key: equal-ts right rows make the winner
    // order-dependent in ANY as-of implementation
    val rUniq = rRows.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq

    val l = lRows.toDF("k", "ts", "lid")
    val r = rUniq.toDF("k", "ts", "rid", "v")
    val got = AsOfJoin.backward(l, r, Seq("k"), "ts")
      .collect().map(x => x.getAs[String]("lid") -> Option(x.getAs[String]("r_rid"))).toMap

    val expected = lRows.map { case (k, t, lid) =>
      val candidates = rUniq.filter(rr => rr._1 == k && !rr._2.after(t))
      lid -> (if (candidates.isEmpty) None
              else Some(candidates.maxBy(_._2.getTime)._3))
    }.toMap
    assert(got === expected)
  }

  test("tolerance gate: stale matches revert to the unmatched shape") {
    // views at 10:00 and 10:30; purchases at 10:31 (fresh for both),
    // 10:45 (only 10:30 within 10 min? no — 15 min old → stale)
    val l = Seq((1L, ts(31), "p1"), (1L, ts(45), "p2"), (2L, ts(10), "p3"))
      .toDF("k", "ts", "lid")
    val r = Seq((1L, ts(0), "v0", 0.0), (1L, ts(30), "v30", 3.0))
      .toDF("k", "ts", "rid", "v")
    val joined = AsOfJoin.backward(l, r, Seq("k"), "ts")
    val got = AsOfJoin.withTolerance(joined, "ts", 10L * 60 * 1000000)
      .collect().map(x => x.getAs[String]("lid") ->
        ((Option(x.getAs[String]("r_rid")), Option(x.getAs[Any]("r_ts"))))).toMap
    assert(got("p1") === ((Some("v30"), Some(ts(30)))))  // 1 min old: fresh
    assert(got("p2") === ((None, None)))                 // 15 min old: nulled together
    assert(got("p3") === ((None, None)))                 // never matched: unchanged
    // zero tolerance keeps only equal-timestamp matches
    val exact = AsOfJoin.withTolerance(
        AsOfJoin.backward(Seq((1L, ts(30), "px")).toDF("k", "ts", "lid"), r, Seq("k"), "ts"),
        "ts", 0L)
      .collect().map(x => Option(x.getAs[String]("r_rid"))).toSeq
    assert(exact === Seq(Some("v30")))
  }

  test("explicit-payload tolerance leaves left-side r_* columns untouched") {
    // the LEFT carries a column legitimately named r_score: the explicit
    // right-payload form must null only the join's own r_ts/r_rid on a
    // stale match, never the left column
    val l = Seq((1L, ts(45), "p1", 9.9)).toDF("k", "ts", "lid", "r_score")
    val r = Seq((1L, ts(30), "v30")).toDF("k", "ts", "rid")
    val joined = AsOfJoin.backward(l, r, Seq("k"), "ts")
    val row = AsOfJoin.withTolerance(joined, "ts", 10L * 60 * 1000000,
        Seq("ts", "rid")).collect().head
    assert(Option(row.getAs[String]("r_rid")) === None)   // stale: nulled
    assert(Option(row.getAs[Any]("r_ts")) === None)
    assert(row.getAs[Double]("r_score") === 9.9)          // left col intact
  }

  test("tolerance rejects non-timestamp ts columns instead of guessing units") {
    val l = Seq((1L, 100L, "p1")).toDF("k", "ts", "lid")
    val r = Seq((1L, 90L, "v")).toDF("k", "ts", "rid")
    val joined = AsOfJoin.backward(l, r, Seq("k"), "ts")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.withTolerance(joined, "ts", 1000000L)
    }
    assert(e.getMessage.contains("must be TIMESTAMP"))
  }
}

package graft.plans

import graft.SparkSpec
import graft.ops.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinNativeSpec extends SparkSpec {
  import spark.implicits._

  // (key, ts, payload) fixtures; unique ts per key so the ≤-tie contract
  // can't mask ordering bugs
  private def mkLeft(rows: Seq[(Long, Long, String)]) =
    rows.toDF("k", "ts", "lp")
  private def mkRight(rows: Seq[(Long, Long, Double)]) =
    rows.toDF("k", "ts", "rp")

  private val left = mkLeft(Seq(
    (1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "early"),
    (2L, 100L, "c"), (3L, 7L, "nokey")))
  private val right = mkRight(Seq(
    (1L, 8L, 0.8), (1L, 15L, 1.5), (1L, 20L, 2.0),
    (2L, 100L, 10.0), (4L, 1L, 4.0)))

  test("native exec matches the compositional form row-for-row") {
    val a = AsOfJoinNative.backward(left, right, Seq("k"), "ts")
      .orderBy("k", "ts").collect().toSeq
    val b = AsOfJoin.backward(left, right, Seq("k"), "ts")
      .orderBy("k", "ts").collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("backward ≤ semantics: greatest right time not after the left time") {
    val got = AsOfJoinNative.backward(left, right, Seq("k"), "ts")
      .select($"k", $"ts", $"lp", $"r_ts", $"r_rp")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((Option(r.get(3)), Option(r.get(4))))).toMap
    assert(got((1L, 10L)) === ((Some(8L), Some(0.8))))   // 8 ≤ 10 < 15
    assert(got((1L, 20L)) === ((Some(20L), Some(2.0))))  // equal ts matches
    assert(got((1L, 5L)) === ((None, None)))             // nothing before 5
    assert(got((2L, 100L)) === ((Some(100L), Some(10.0))))
    assert(got((3L, 7L)) === ((None, None)))             // key absent on right
  }

  test("the plan is AsOfJoinExec over two exchanges, not a window rewrite") {
    val df = AsOfJoinNative.backward(left, right, Seq("k"), "ts")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(800))
    assert(!plan.contains("Window"), plan.take(800))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 2, s"expected 2 exchanges, plan:\n${plan.take(1500)}")
  }

  test("matches composition on a large generated workload across partitionings") {
    val l = (0 until 3000).map(i => ((i % 37).toLong, (i * 13 % 997).toLong, s"l$i"))
    val r = (0 until 2000).map(i => ((i % 41).toLong, (i * 17 % 991).toLong, i / 10.0))
    // dedup (k, ts) on the right: equal-ts right rows are tie-broken by
    // sort arrival order in BOTH forms, which is not a stable contract
    val lDf = mkLeft(l)
    val rDf = mkRight(r.groupBy(x => (x._1, x._2)).map(_._2.head).toSeq)
    val a = AsOfJoinNative.backward(lDf.repartition(7), rDf.repartition(3), Seq("k"), "ts")
      .orderBy("k", "ts", "lp").collect().toSeq
    val b = AsOfJoin.backward(lDf, rDf, Seq("k"), "ts")
      .orderBy("k", "ts", "lp").collect().toSeq
    assert(a === b)
  }

  test("forward variant: smallest right time ≥ left, native ≡ composition") {
    val got = AsOfJoinNative.forward(left, right, Seq("k"), "ts")
      .select($"k", $"ts", $"lp", $"r_ts", $"r_rp")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((Option(r.get(3)), Option(r.get(4))))).toMap
    assert(got((1L, 10L)) === ((Some(15L), Some(1.5)))) // next at/after 10
    assert(got((1L, 20L)) === ((Some(20L), Some(2.0)))) // equal ts matches
    assert(got((1L, 5L)) === ((Some(8L), Some(0.8))))
    assert(got((3L, 7L)) === ((None, None)))
    val comp = graft.ops.AsOfJoin.forward(left, right, Seq("k"), "ts")
      .orderBy("k", "ts").collect().toSeq
    val nat = AsOfJoinNative.forward(left, right, Seq("k"), "ts")
      .orderBy("k", "ts").collect().toSeq
    assert(nat === comp)
  }

  test("forward ≡ composition on the generated workload") {
    val l = (0 until 2000).map(i => ((i % 31).toLong, (i * 11 % 883).toLong, s"l$i"))
    val r = (0 until 1500).map(i => ((i % 29).toLong, (i * 19 % 877).toLong, i / 8.0))
    val lDf = mkLeft(l)
    val rDf = mkRight(r.groupBy(x => (x._1, x._2)).map(_._2.head).toSeq)
    val a = AsOfJoinNative.forward(lDf.repartition(5), rDf.repartition(9), Seq("k"), "ts")
      .orderBy("k", "ts", "lp").collect().toSeq
    val b = graft.ops.AsOfJoin.forward(lDf, rDf, Seq("k"), "ts")
      .orderBy("k", "ts", "lp").collect().toSeq
    assert(a === b)
  }

  test("prune rule: a narrow select reaches both parquet ReadSchemas") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val l = ev.filter(col("event_type") === "purchase")
    val r = ev.filter(col("event_type") === "view")
    val narrow = AsOfJoinNative.backward(l, r, Seq("user_id"), "ts")
      .select("event_id", "r_value")
    val plan = narrow.queryExecution.executedPlan.toString
    // neither side needs props (nor the right side event_id): without the
    // injected rule the opaque node forces BOTH scans to read everything
    assert(!plan.contains("props"), plan.take(2000))
    assert(plan.contains("AsOfJoin"), plan.take(500))
    // and pruning must not change results
    val wide = AsOfJoinNative.backward(l, r, Seq("user_id"), "ts")
    val a = narrow.orderBy("event_id").collect().toSeq
    val b = wide.select("event_id", "r_value").orderBy("event_id").collect().toSeq
    assert(a === b && a.nonEmpty)
  }

  test("null left time matches nothing; null right times are skipped") {
    val lDf = Seq((Some(1L), Some(10L), "x"), (Some(1L), None, "nullts"))
      .toDF("k", "ts", "lp")
    val rDf = Seq((Some(1L), None, 9.9), (Some(1L), Some(4L), 0.4))
      .toDF("k", "ts", "rp")
    val got = AsOfJoinNative.backward(lDf, rDf, Seq("k"), "ts")
      .collect().map(r => r.getString(2) -> Option(r.get(4))).toMap
    assert(got("x") === Some(0.4))      // the null-ts right row is skipped
    assert(got("nullts") === None)      // a null left ts cannot match
  }
}

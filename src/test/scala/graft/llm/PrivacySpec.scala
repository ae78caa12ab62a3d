package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("kAnonymityAudit: exact class sizes, l-diversity, and risk flags") {
    // QI class (a,1): 6 rows / 2 sensitive values; (a,2): 2 rows / 1 value;
    // (b,1): 1 row / 1 value
    val rows = Seq.fill(4)(("a", 1L, "s1")) ++ Seq.fill(2)(("a", 1L, "s2")) ++
      Seq(("a", 2L, "s1"), ("a", 2L, "s1"), ("b", 1L, "s3"))
    val df = rows.toDF("g", "band", "sens")
    val got = Privacy.kAnonymityAudit(df, Seq("g", "band"), "sens", k = 5L)
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got(("a", 1L)) === ((6L, 2L, false)))
    assert(got(("a", 2L)) === ((2L, 1L, true)))
    assert(got(("b", 1L)) === ((1L, 1L, true)))
  }

  test("laplaceNoisyCounts: deterministic, unbiased-ish, epsilon scales noise exactly") {
    val df = (1L to 3000L).map(i => (s"g${i % 50}", i)).toDF("g", "x")
    val a = Privacy.laplaceNoisyCounts(df, Seq("g"), epsilon = 1.0)
    val b = Privacy.laplaceNoisyCounts(df.repartition(17), Seq("g"), epsilon = 1.0)
    val am = a.collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    val bm = b.collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    assert(am === bm, "noise must be a pure function of the group key")
    assert(am.size === 50)
    // every group's true count is 60; noise is centered — the released
    // values straddle it and stay within a plausible Laplace(1) envelope
    val noises = am.values.map { case (t, n, _) => n - t }.toSeq
    assert(noises.exists(_ > 0) && noises.exists(_ < 0))
    assert(math.abs(noises.sum / noises.size) < 1.0)
    // b = 1/eps: doubling epsilon exactly halves each draw (same uniform,
    // multiply by 0.5 is an exact IEEE op)
    val half = Privacy.laplaceNoisyCounts(df, Seq("g"), epsilon = 2.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    am.foreach { case (g, (t, n, _)) =>
      // (t + x) - t re-rounds, so compare within an ulp-scale tolerance
      assert(math.abs((half(g) - t) - (n - t) / 2.0) < 1e-9, s"group $g")
    }
    // released = round(noisy) clamped at 0
    am.values.foreach { case (_, n, rel) =>
      assert(rel === math.max(0L, math.floor(n + 0.5).toLong))
    }
  }

  test("generalizationLadder: risk strictly relaxes as bands widen, exact at both ends") {
    // 100 rows in one stratum, values 0..99: width 1 → 100 singleton
    // classes (all risky at k=5); width 100 → one class of 100 (none)
    val df = (0L until 100L).map(v => ("s", v)).toDF("g", "v")
    val got = Privacy.generalizationLadder(df, "g", "v", Seq(1L, 10L, 100L), k = 5L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L) === ((100L, 100L, 100L, 1L)))
    assert(got(10L) === ((10L, 0L, 0L, 10L)))
    assert(got(100L) === ((1L, 0L, 0L, 100L)))
  }
}

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
}

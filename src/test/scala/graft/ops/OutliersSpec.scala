package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OutliersSpec extends SparkSpec {
  import spark.implicits._

  test("multivariate z-score matches hand moments; joint deviation adds") {
    // group g: x ~ {0,10} balanced, y ~ {0,100} balanced + one (10,100) row
    val rows = Seq(("g", 0L, 0L), ("g", 10L, 100L), ("g", 0L, 100L), ("g", 10L, 0L))
    val got = Outliers.zScoreMulti(rows.toDF("g", "x", "y"), "g", Seq("x", "y"))
      .select("x", "y", "score").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // x: mean 5, var = (4·25)/3; z² = 25/(100/3) = 0.75 for every row; same for y
    got.values.foreach(s => assert(math.abs(s - 1.5) < 1e-12, s.toString))
  }

  test("constant features contribute zero, never NaN; null group excluded") {
    val rows = Seq((Some("g"), 1L, 7L), (Some("g"), 5L, 7L), (None, 100L, 7L))
      .toDF("g", "x", "c")
    val got = Outliers.zScoreMulti(rows, "g", Seq("x", "c"))
      .select("x", "score").as[(Long, Double)].collect().toMap
    assert(got.size === 2)                        // null group dropped
    assert(!got.values.exists(_.isNaN))
    // c constant → only x contributes: z² = 1 for both rows (n=2)
    got.values.foreach(s => assert(math.abs(s - 0.5) < 1e-12))
  }

  test("an injected outlier dominates the group's max score") {
    val base = (1 to 100).map(i => ("g", (i % 10).toLong, (i % 7).toLong))
    val rows = base :+ (("g", 1000L, 1000L))
    val got = Outliers.zScoreMulti(rows.toDF("g", "x", "y"), "g", Seq("x", "y"))
      .agg(max(col("score"))).collect().head.getDouble(0)
    assert(got > 50.0, got.toString)
  }
}

class ParetoSpec extends SparkSpec {
  import spark.implicits._

  test("pareto coverage: minimal prefix flagged, shares cumulative") {
    // masses 50, 30, 15, 5 → 80% reached by {a, b} (cum .5, .8); c enters
    // only because prev-cum .8 is NOT < .8 → c excluded
    val rows = Seq(("a", 50L), ("b", 30L), ("c", 15L), ("d", 5L))
    val got = Aggregates.paretoCoverage(rows.toDF("k", "m"), "k", "m", 0.8)
      .select("k", "cum_share", "in_top")
      .as[(String, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("a") === ((0.5, true)))
    assert(got("b") === ((0.8, true)))
    assert(got("c")._2 === false && got("d")._2 === false)
    // ties rank by key ascending (deterministic)
    val tied = Seq(("z", 10L), ("y", 10L)).toDF("k", "m")
    val t = Aggregates.paretoCoverage(tied, "k", "m", 0.5)
      .select("k", "in_top").as[(String, Boolean)].collect().toMap
    assert(t("y") && !t("z"))
  }

  test("masses aggregate per key; rows with null key/mass drop") {
    val rows = Seq((Some("a"), Some(5L)), (Some("a"), Some(5L)),
      (Some("b"), Some(10L)), (None, Some(99L)), (Some("c"), None))
      .toDF("k", "m")
    val got = Aggregates.paretoCoverage(rows, "k", "m", 1.0)
      .select("k", "mass").as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 10L, "b" -> 10L))
  }

  test("mahalanobis2: correlation-aware score catches the off-axis outlier") {
    import org.apache.spark.sql.functions.{col, lit}
    // x, y strongly correlated (y ≈ 2x); one point breaks the correlation
    // (x=50, y=10) while staying inside both marginal ranges
    val rows = ((1 to 50).map(i => (i.toLong, i.toLong, 2L * i + (i % 3))) :+
      ((99L, 50L, 10L))).toDF("id", "x", "y").withColumn("g", lit("g"))
    val out = Outliers.mahalanobis2(rows, "g", "x", "y")
      .select(col("id"), col("d2")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.maxBy(_._2)._1 === 99L, s"off-axis point must dominate")
    assert(out(99L) > 3 * out.filter(_._1 != 99L).values.max)
  }

  test("mahalanobis2: hand covariance algebra and degenerate guards") {
    import org.apache.spark.sql.functions.{col, lit}
    // corners of a square: μ=(1,1), vxx=vyy=1, vxy=0 -> d² = dx²+dy² = 2
    val sq = Seq((1L, 0L, 0L), (2L, 2L, 0L), (3L, 0L, 2L), (4L, 2L, 2L))
      .toDF("id", "x", "y").withColumn("g", lit("g"))
    val d2 = Outliers.mahalanobis2(sq, "g", "x", "y")
      .select(col("d2")).collect().map(_.getDouble(0))
    assert(d2.forall(v => math.abs(v - 2.0) < 1e-12))
    // perfectly collinear features: det = 0 -> NULL everywhere
    val line = (1 to 10).map(i => (i.toLong, i.toLong, 3L * i))
      .toDF("id", "x", "y").withColumn("g", lit("g"))
    assert(Outliers.mahalanobis2(line, "g", "x", "y")
      .select(col("d2")).collect().forall(_.isNullAt(0)))
  }

  test("iqrFences: hand quartiles, fences, tail counts; whale-proof") {
    import spark.implicits._
    // 1..8 plus a 100-whale: n=9, q1 = v at ceil(9/4)=3 → 3,
    // q3 at ceil(27/4)=7 → 7; fences −3 / 13; only the whale is out
    val rows = ((1L to 8L) :+ 100L).map(v => ("g", v)).toDF("g", "v")
    val r = Outliers.iqrFences(rows, "g", "v").collect().head
    assert(r.getLong(1) === 9L && r.getLong(2) === 3L && r.getLong(3) === 7L)
    assert(r.getLong(4) === 4L)
    assert(r.getDouble(5) === -3.0 && r.getDouble(6) === 13.0)
    assert(r.getLong(7) === 0L && r.getLong(8) === 1L)
    // the whale cannot move the fences: replacing it with 10^9 changes
    // nothing but its own exceedance (z-scores would have collapsed)
    val worse = ((1L to 8L) :+ 1000000000L).map(v => ("g", v)).toDF("g", "v")
    val w = Outliers.iqrFences(worse, "g", "v").collect().head
    assert(w.getLong(2) === 3L && w.getLong(3) === 7L && w.getLong(8) === 1L)
  }
}

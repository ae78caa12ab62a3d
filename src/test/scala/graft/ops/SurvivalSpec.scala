package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  private def km(rows: Seq[(String, Long, Int)]): Map[(String, Long), (Long, Long, Long, Double)] =
    Survival.kaplanMeier(rows.toDF("g", "dur", "ev"), "g", "dur", "ev")
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap

  test("textbook example: censoring keeps subjects in the risk set until their time") {
    // classic KM: events at t=1 (1 of 5), t=3 (1 of 3); censored at t=2, t=3, t=4
    val rows = Seq(("a", 1L, 1), ("a", 2L, 0), ("a", 3L, 1), ("a", 3L, 0), ("a", 4L, 0))
    val r = km(rows)
    val (n1, d1, _, s1) = r(("a", 1L))
    assert(n1 === 5L && d1 === 1L && math.abs(s1 - 0.8) < 1e-12)
    val (n3, d3, c3, s3) = r(("a", 3L))
    // risk set at 3: 5 - 1(event@1) - 1(censored@2) = 3; S = 0.8 * (1 - 1/3)
    assert(n3 === 3L && d3 === 1L && c3 === 1L)
    assert(math.abs(s3 - 0.8 * (2.0 / 3)) < 1e-12)
    // censored-only times emit no curve row
    assert(!r.contains(("a", 2L)) && !r.contains(("a", 4L)))
  }

  test("no censoring degrades to plain survival fractions") {
    // durations for i=1..10 of (i%3 + 1): three 1s, four 2s, three 3s
    val rows = (1 to 10).map(i => ("g", (i % 3 + 1).toLong, 1))
    val r = km(rows)
    // t=1: 3 events of 10; t=2: 4 of 7; t=3: 3 of 3 → S hits exactly 0
    assert(r(("g", 1L))._1 === 10L && math.abs(r(("g", 1L))._4 - 0.7) < 1e-12)
    assert(math.abs(r(("g", 2L))._4 - 0.7 * (3.0 / 7)) < 1e-12)
    assert(r(("g", 3L))._4 === 0.0)
  }

  test("groups are independent; partitioning-invariant bits") {
    val rows = (1 to 200).map(i =>
      (s"g${i % 2}", (i * 13 % 17).toLong, if (i % 3 == 0) 0 else 1))
    val df = rows.toDF("g", "dur", "ev")
    def run(p: Int) = Survival.kaplanMeier(df.repartition(p), "g", "dur", "ev")
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2, r._3, r._4, r._5,
        java.lang.Double.doubleToLongBits(r._6))).toSet
    assert(run(1) === run(13))
    // a group's curve must not see the other group's subjects
    val solo = km(rows.filter(_._1 == "g0"))
    val both = km(rows)
    assert(solo.keySet.forall(k => solo(k) == both(k)))
  }

  private def na(rows: Seq[(String, Long, Int)])
      : Map[(String, Long), (Long, Long, Long, Double, Double, Double)] =
    Survival.nelsonAalen(rows.toDF("g", "dur", "ev"), "g", "dur", "ev")
      .as[(String, Long, Long, Long, Long, Double, Double, Double)]
      .collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6, r._7, r._8))).toMap

  test("nelson-aalen: textbook cumulative hazard with censoring") {
    // 10 subjects: events at t=1 (2), t=3 (1); censored at t=2 (3); rest
    // censored at t=5
    val rows = Seq.fill(2)(("g", 1L, 1)) ++ Seq.fill(3)(("g", 2L, 0)) ++
      Seq(("g", 3L, 1)) ++ Seq.fill(4)(("g", 5L, 0))
    val r = na(rows)
    // t=1: n=10, d=2 → h=0.2; t=3: n=5, d=1 → h=0.2, H=0.4
    val (n1, d1, _, h1, ch1, s1) = r(("g", 1L))
    assert(n1 === 10L && d1 === 2L && h1 === 0.2 && ch1 === 0.2)
    assert(math.abs(s1 - math.exp(-0.2)) < 1e-15)
    val (n3, d3, _, h3, ch3, s3) = r(("g", 3L))
    assert(n3 === 5L && d3 === 1L && h3 === 0.2)
    assert(math.abs(ch3 - 0.4) < 1e-15 && math.abs(s3 - math.exp(-0.4)) < 1e-15)
    assert(!r.contains(("g", 2L)) && !r.contains(("g", 5L))) // censor-only times
  }

  test("nelson-aalen: exhausted risk set stays finite (vs KM's hard zero)") {
    val rows = Seq(("g", 1L, 1), ("g", 1L, 1)) // both die at t=1
    val (n, d, _, h, ch, s) = na(rows)(("g", 1L))
    assert(n === 2L && d === 2L && h === 1.0 && ch === 1.0)
    assert(math.abs(s - math.exp(-1.0)) < 1e-15 && s > 0.0)
  }

  test("nelson-aalen: partitioning-invariant bits, groups independent") {
    val rows = (1 to 200).map(i =>
      (s"g${i % 2}", (i * 13 % 17).toLong, if (i % 3 == 0) 0 else 1))
    val df = rows.toDF("g", "dur", "ev")
    def run(p: Int) = Survival.nelsonAalen(df.repartition(p), "g", "dur", "ev")
      .as[(String, Long, Long, Long, Long, Double, Double, Double)].collect()
      .map(r => (r._1, r._2, r._3, r._4, r._5,
        java.lang.Double.doubleToLongBits(r._6),
        java.lang.Double.doubleToLongBits(r._7),
        java.lang.Double.doubleToLongBits(r._8))).toSet
    assert(run(1) === run(13))
    val solo = na(rows.filter(_._1 == "g1"))
    val both = na(rows)
    assert(solo.keySet.forall(k => solo(k) == both(k)))
  }
}

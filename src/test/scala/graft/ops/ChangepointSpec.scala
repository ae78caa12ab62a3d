package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class ChangepointSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential replay of the textbook recursion, scaled by n like the
    * operator: S'_i = max(0, S'_{i-1} + (n·x_i − Σx − ⌊n·κ⌋)).
    */
  private def brute(xs: Seq[Long], slack: Double, threshold: Double)
      : Seq[(Double, Boolean)] = {
    val n = xs.size; val s = xs.sum
    val nk = math.floor(n * slack).toLong; val nh = math.floor(n * threshold).toLong
    var acc = 0L
    xs.map { x =>
      acc = math.max(0L, acc + (x * n - s - nk))
      (acc.toDouble / n, acc > nh)
    }
  }

  private def run(xs: Seq[Long], slack: Double, threshold: Double, parts: Int = 4)
      : Seq[(Double, Boolean)] =
    Changepoint.cusum(
        xs.zipWithIndex.map { case (x, i) => ("g", i.toLong, x) }
          .toDF("g", "t", "v").repartition(parts), "g", "t", "v", slack, threshold)
      .orderBy("t").as[(String, Long, Long, Double, Boolean)]
      .collect().map(r => (r._4, r._5)).toSeq

  test("window scan identity ≡ the sequential max(0, ·) recursion") {
    val xs = Seq[Long](10, 12, 9, 11, 30, 32, 31, 8, 10, 29, 30)
    assert(run(xs, slack = 2.0, threshold = 8.0) === brute(xs, 2.0, 8.0))
  }

  test("a flat series never alarms; a sustained shift alarms and stays up") {
    val flat = Seq.fill(20)(100L)
    assert(run(flat, 1.0, 5.0).forall(r => r._1 == 0.0 && !r._2))
    val shifted = Seq.fill(10)(100L) ++ Seq.fill(10)(120L)
    val alarms = run(shifted, 5.0, 30.0).map(_._2)
    assert(!alarms.take(10).exists(identity)) // quiet before the shift
    assert(alarms.last)                       // latched well after it
    val first = alarms.indexOf(true)
    assert(first >= 10 && alarms.drop(first).forall(identity))
  }

  test("groups independent; partitioning-invariant (integer state)") {
    val rows = (for { g <- Seq("a", "b"); i <- 0 until 50 }
      yield (g, i.toLong, ((i * 37 % 23) + (if (g == "b" && i > 30) 40 else 0)).toLong))
    def go(parts: Int) = Changepoint.cusum(
        rows.toDF("g", "t", "v").repartition(parts), "g", "t", "v", 3.0, 20.0)
      .as[(String, Long, Long, Double, Boolean)].collect().toSet
    assert(go(1) === go(17))
    val bAlarms = go(1).filter(r => r._1 == "b" && r._5)
    assert(bAlarms.nonEmpty && bAlarms.forall(_._2 > 30))
    assert(!go(1).exists(r => r._1 == "a" && r._5))
  }

  private def sprt(rows: Seq[(String, Long, Int)], p0: Double, p1: Double)
      : Map[(String, Long), (Long, Long, Double, String)] =
    Changepoint.sprtBernoulli(rows.toDF("g", "t", "y"), "g", "t", col("y"), p0, p1)
      .as[(String, Long, Long, Long, Double, String)]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap

  test("sprt: llr matches the closed form and accumulates in time order") {
    // periods: t=1 has 10 trials 3 hits; t=2 has 10 trials 5 hits
    val rows = (1 to 10).map(i => ("g", 1L, if (i <= 3) 1 else 0)) ++
      (1 to 10).map(i => ("g", 2L, if (i <= 5) 1 else 0))
    val r = sprt(rows, p0 = 0.1, p1 = 0.3)
    val lp = math.log(0.3 / 0.1); val ln = math.log(0.7 / 0.9)
    assert(r(("g", 1L))._1 === 10L && r(("g", 1L))._2 === 3L)
    assert(math.abs(r(("g", 1L))._3 - (3 * lp + 7 * ln)) < 1e-12)
    assert(math.abs(r(("g", 2L))._3 - (8 * lp + 12 * ln)) < 1e-12)
  }

  test("sprt: strong evidence crosses the H1 boundary, null data the H0 one") {
    // 40% hits vs H0 p=0.1: should accept H1 eventually
    val hot = (1L to 20L).flatMap(t => (1 to 10).map(i => ("hot", t, if (i <= 4) 1 else 0)))
    val cold = (1L to 20L).flatMap(t => (1 to 10).map(i => ("cold", t, 0)))
    // 20% sits between p0 and p1: the evidence stays ambiguous at first
    val mild = (1L to 3L).flatMap(t => (1 to 10).map(i => ("mild", t, if (i <= 2) 1 else 0)))
    val r = sprt(hot ++ cold ++ mild, p0 = 0.1, p1 = 0.3)
    assert(r(("hot", 20L))._4 === "accept_h1")
    assert(r(("cold", 20L))._4 === "accept_h0")
    assert(r(("mild", 1L))._4 === "continue")
  }

  test("sprt: partitioning-invariant bits; nulls dropped") {
    val rows = (1 to 300).map(i => (s"g${i % 2}", (i % 15).toLong, i % 4 min 1))
    def run(parts: Int) =
      Changepoint.sprtBernoulli(rows.toDF("g", "t", "y").repartition(parts),
        "g", "t", col("y"), 0.5, 0.7)
        .collect().map(_.toSeq.map {
          case d: Double => java.lang.Double.doubleToLongBits(d)
          case v => v
        }).sortBy(_.mkString("|"))
    assert(run(1) === run(13))
  }

  test("pageHinkley: running-mean deviations, alarm past lambda") {
    import spark.implicits._
    // flat 10s then a 50: running means 10,10,10,10,18 → terms
    // 0,0,0,0,32 (slack 0) → ph = 0,0,0,0,32; alarm at λ = 20
    val s = (1L to 4L).map(t => ("g", t, 10L)) :+ (("g", 5L, 50L))
    val out = Changepoint.pageHinkley(s.toDF("g", "t", "v"), "g", "t", "v",
        slack = 0.0, threshold = 20.0)
      .collect().map(r => r.getLong(1) -> ((r.getDouble(3), r.getBoolean(4))))
      .toMap
    (1L to 4L).foreach(t => assert(out(t) === ((0.0, false)), s"t=$t"))
    assert(math.abs(out(5L)._1 - 32.0) < 1e-9 && out(5L)._2)
    // slack eats small deviations: δ = 40 keeps everything quiet
    val quiet = Changepoint.pageHinkley(s.toDF("g", "t", "v"), "g", "t", "v",
      slack = 40.0, threshold = 20.0)
    assert(quiet.filter(col("alarm")).count() === 0L)
  }

  test("pettitt: hand-worked shift, tie midranks, earliest argmax") {
    import spark.implicits._
    // series 1,2,10,11 (ranks 1..4): per-term 2r−n−1 = −3,−1,1,3,
    // U = −3,−4,−3,0 ⇒ K = 4 at t = 2, p = 2·exp(−6·16/80) ≈ 0.60239
    val s = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 10L), ("g", 4L, 11L))
      .toDF("g", "t", "v")
    val r = Changepoint.pettitt(s, "g", "t", "v").collect().head
    assert(r.getLong(1) === 4L && r.getLong(2) === 4L && r.getLong(3) === 2L)
    assert(math.abs(r.getDouble(4) - 0.6023884238244043) < 1e-9)
    // constant series: all midranks equal ⇒ U ≡ 0, K = 0, p capped at 1
    val c = Seq(("g", 1L, 5L), ("g", 2L, 5L), ("g", 3L, 5L)).toDF("g", "t", "v")
    val rc = Changepoint.pettitt(c, "g", "t", "v").collect().head
    assert(rc.getLong(2) === 0L && rc.getDouble(4) === 1.0)
    // a hard level shift places t* at the boundary
    val shift = ((1L to 20L).map(t => ("g", t, 10L)) ++
      (21L to 40L).map(t => ("g", t, 90L))).toDF("g", "t", "v")
    val rs = Changepoint.pettitt(shift, "g", "t", "v").collect().head
    assert(rs.getLong(3) === 20L && rs.getDouble(4) < 1e-6)
    // determinism under repartitioning
    val rng = new scala.util.Random(47)
    val big = (1 to 300).map(i =>
      (s"g${i % 3}", i.toLong, rng.nextInt(50).toLong)).toDF("g", "t", "v")
    def run(p: Int) = Changepoint.pettitt(big.repartition(p), "g", "t", "v")
      .collect().map(_.toSeq.map {
        case d: Double => java.lang.Double.doubleToLongBits(d)
        case v => v
      }).sortBy(_.mkString("|"))
    assert(run(1) === run(11))
  }
}

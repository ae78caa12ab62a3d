package graft.ops

import graft.SparkSpec
import org.scalactic.Tolerance._

class CorrelationSpec extends SparkSpec {
  import spark.implicits._

  private def rho(rows: Seq[(String, Long, Long)])
      : Map[String, (Long, Option[Double])] =
    Correlation.groupSpearman(rows.toDF("g", "x", "y"), "g", "x", "y")
      .as[(String, Long, Option[Double])]
      .collect().map { case (g, n, r) => g -> ((n, r)) }.toMap

  test("any strictly monotone map gives rho = 1 exactly, even nonlinear") {
    val rows = (1L to 9L).map(x => ("g", x, x * x * x - 2 * x))
    val (n, r) = rho(rows)("g")
    assert(n === 9L && r === Some(1.0))
  }

  test("strictly decreasing gives rho = -1 exactly") {
    val (_, r) = rho((1L to 7L).map(x => ("g", x, 100 - x * x)))("g")
    assert(r === Some(-1.0))
  }

  test("tie blocks get average ranks (hand-computed)") {
    // x = [1,2,2,3] -> ranks [1, 2.5, 2.5, 4]; y = [10,30,20,40] -> [1,3,2,4]
    val rows = Seq(("g", 1L, 10L), ("g", 2L, 30L), ("g", 2L, 20L), ("g", 3L, 40L))
    val expected = 4.5 / math.sqrt(4.5 * 5.0)
    val (n, r) = rho(rows)("g")
    assert(n === 4L && math.abs(r.get - expected) < 1e-12)
  }

  test("constant column within a group yields null rho") {
    val (n, r) = rho(Seq(("g", 1L, 7L), ("g", 2L, 7L), ("g", 3L, 7L)))("g")
    assert(n === 3L && r.isEmpty)
    val (n2, r2) = rho(Seq(("h", 5L, 1L)))("h")
    assert(n2 === 1L && r2.isEmpty)
  }

  test("groups are independent and null coordinates are dropped") {
    val df = Seq(
      ("a", Some(1L), Some(3L)), ("a", Some(2L), Some(5L)), ("a", None, Some(9L)),
      ("b", Some(1L), Some(9L)), ("b", Some(2L), Some(4L)), ("b", Some(3L), None))
      .toDF("g", "x", "y")
    val out = Correlation.groupSpearman(df, "g", "x", "y")
      .as[(String, Long, Option[Double])].collect().map(t => t._1 -> t).toMap
    assert(out("a")._2 === 2L && out("a")._3 === Some(1.0))
    assert(out("b")._2 === 2L && out("b")._3 === Some(-1.0))
  }

  test("rho is invariant to input partitioning (order-free sums)") {
    val rows = (1L to 200L).map(i => ("g", i % 17, (i * 31) % 23))
    val one = Correlation.groupSpearman(
      rows.toDF("g", "x", "y").repartition(1), "g", "x", "y")
      .as[(String, Long, Option[Double])].collect().head
    val many = Correlation.groupSpearman(
      rows.toDF("g", "x", "y").repartition(13), "g", "x", "y")
      .as[(String, Long, Option[Double])].collect().head
    assert(one === many)
  }
}

class PearsonMatrixSpec extends SparkSpec {
  import spark.implicits._

  private def corrOf(rows: Seq[(Long, Long, Long)], cols: Seq[String] = Seq("a", "b", "c"))
      : Map[(String, String), (Long, Option[Double])] =
    Correlation.pearsonMatrix(rows.toDF(cols: _*), cols)
      .as[(String, String, Long, Option[Double])].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4))).toMap

  test("perfect linear relations give ±1; all pairs emitted once (i < j)") {
    val rows = (1L to 40L).map(i => (i, 3 * i + 7, 100 - 2 * i))
    val out = corrOf(rows)
    assert(out.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")))
    assert(out(("a", "b"))._2.get === 1.0 +- 1e-12)
    assert(out(("a", "c"))._2.get === -1.0 +- 1e-12)
    assert(out(("b", "c"))._2.get === -1.0 +- 1e-12)
  }

  test("matches the closed-form brute computation on arbitrary data") {
    val rows = (1L to 120L).map(i => (i * 31 % 17, i * 13 % 23, i * 7 % 11))
    val out = corrOf(rows)
    def brute(xs: Seq[Long], ys: Seq[Long]): Double = {
      val n = xs.size.toDouble
      val (sx, sy) = (xs.sum.toDouble, ys.sum.toDouble)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum.toDouble
      val sxx = xs.map(a => a * a).sum.toDouble
      val syy = ys.map(a => a * a).sum.toDouble
      (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    }
    val (as, bs, cs) = (rows.map(_._1), rows.map(_._2), rows.map(_._3))
    assert(out(("a", "b"))._2.get === brute(as, bs) +- 1e-9)
    assert(out(("a", "c"))._2.get === brute(as, cs) +- 1e-9)
    assert(out(("b", "c"))._2.get === brute(bs, cs) +- 1e-9)
  }

  test("listwise-complete n; constant column yields null corr; partitioning-invariant") {
    val df = Seq(
      (Some(1L), Some(2L), Some(5L)), (Some(2L), None, Some(5L)),
      (Some(3L), Some(6L), Some(5L)), (Some(4L), Some(8L), Some(5L)))
      .toDF("a", "b", "c")
    val out = Correlation.pearsonMatrix(df, Seq("a", "b", "c"))
      .as[(String, String, Long, Option[Double])].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4))).toMap
    assert(out.values.forall(_._1 == 3L)) // the null-b row dropped everywhere
    assert(out(("a", "c"))._2.isEmpty && out(("b", "c"))._2.isEmpty) // c constant
    assert(out(("a", "b"))._2.get === 1.0 +- 1e-12)
    val rows = (1L to 150L).map(i => (i * 31 % 17, i * 13 % 23, i * 7 % 11))
    val one = corrOf(rows)
    val many = Correlation.pearsonMatrix(
      rows.toDF("a", "b", "c").repartition(13), Seq("a", "b", "c"))
      .as[(String, String, Long, Option[Double])].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4))).toMap
    assert(one === many)
  }

  private def tau(rows: Seq[(String, Long, Long)])
      : Map[String, (Long, Long, Long, Long, Option[Double])] =
    Correlation.kendallTau(rows.toDF("g", "x", "y"), "g", "x", "y")
      .as[(String, Long, Long, Long, Long, Option[Double])]
      .collect().map { case (g, np, nc, nd, nt, t) => g -> ((np, nc, nd, nt, t)) }.toMap

  test("kendall: strictly increasing y gives tau = 1, decreasing gives -1") {
    val up = (1L to 6L).map(x => ("u", x, 10 + x))
    val dn = (1L to 6L).map(x => ("d", x, 10 - x))
    val r = tau(up ++ dn)
    assert(r("u") === ((15L, 15L, 0L, 0L, Some(1.0))))
    assert(r("d") === ((15L, 0L, 15L, 0L, Some(-1.0))))
  }

  test("kendall: hand-computed mixed case with y ties (tau-b)") {
    // pairs over x=1..4, y = 3,1,3,2: (1,2)D (1,3)T (1,4)D (2,3)C (2,4)C (3,4)D
    val r = tau(Seq(("g", 1L, 3L), ("g", 2L, 1L), ("g", 3L, 3L), ("g", 4L, 2L)))("g")
    val (np, nc, nd, nt, t) = r
    assert((np, nc, nd, nt) === ((6L, 2L, 3L, 1L)))
    assert(math.abs(t.get - (2.0 - 3.0) / math.sqrt(6.0 * 5.0)) < 1e-15)
  }

  test("kendall: all-tied y yields null tau; single point emits no row") {
    val r = tau(Seq(("t", 1L, 5L), ("t", 2L, 5L), ("t", 3L, 5L), ("solo", 1L, 9L)))
    assert(r("t")._5.isEmpty && r("t")._4 === 3L)
    assert(!r.contains("solo"))
  }

  test("kendall: groups independent, nulls dropped, partitioning-invariant") {
    val rows = (1 to 120).map(i => (s"g${i % 3}", i.toLong, (i * 17 % 29).toLong))
    val df = rows.toDF("g", "x", "y")
    def run(p: Int) = Correlation.kendallTau(df.repartition(p), "g", "x", "y")
      .as[(String, Long, Long, Long, Long, Option[Double])].collect().toSet
    assert(run(1) === run(11))
    val withNull = rows.map { case (g, x, y) => (g, Some(x), Some(y)) } :+
      (("g0", Some(999L), Option.empty[Long]))
    val r2 = Correlation.kendallTau(withNull.toDF("g", "x", "y"), "g", "x", "y")
      .as[(String, Long, Long, Long, Long, Option[Double])].collect()
      .map(t => t._1 -> t._2).toMap
    assert(r2("g0") === tau(rows)("g0")._1) // null-y row contributed no pairs
  }

  test("partialCorr: confound removal — x,y independent given z") {
    // x = z + noise_x, y = z + noise_y with independent noises: the
    // marginal r_xy is strongly positive, the partial must collapse
    val rng = new scala.util.Random(43)
    val rows = (1 to 2000).map { _ =>
      val z = rng.nextInt(100).toLong
      (z + rng.nextInt(20), z + rng.nextInt(20), z)
    }.toDF("x", "y", "z")
    val r = Correlation.partialCorr(rows, "x", "y", "z").collect().head
    assert(r.getLong(0) === 2000L)
    assert(r.getDouble(1) > 0.8, "marginal r_xy rides the confounder")
    assert(math.abs(r.getDouble(4)) < 0.1, "partial r must collapse")
  }

  test("partialCorr: hand moments and degenerate guards") {
    // exact small fixture: x=(1,2,3,4), y=(2,4,6,8) (r_xy=1), z constant
    val c = Seq((1L, 2L, 5L), (2L, 4L, 5L), (3L, 6L, 5L), (4L, 8L, 5L))
      .toDF("x", "y", "z")
    val rc = Correlation.partialCorr(c, "x", "y", "z").collect().head
    assert(rc.getDouble(1) === 1.0)
    assert(rc.isNullAt(2) && rc.isNullAt(3) && rc.isNullAt(4),
      "constant z has no variance: control r's and partial are NULL")
    // r_xz = ±1 gates the partial (division by zero shield)
    val g = Seq((1L, 5L, 1L), (2L, 3L, 2L), (3L, 9L, 3L)).toDF("x", "y", "z")
    val rg = Correlation.partialCorr(g, "x", "y", "z").collect().head
    assert(rg.getDouble(2) === 1.0 && rg.isNullAt(4))
    // bit determinism
    val rng = new scala.util.Random(47)
    val big = (1 to 500).map(_ => (rng.nextInt(50).toLong,
      rng.nextInt(50).toLong, rng.nextInt(50).toLong)).toDF("x", "y", "z")
    def bits(p: Int) = Correlation.partialCorr(big.repartition(p), "x", "y", "z")
      .collect().head.toSeq.map {
        case d: Double => java.lang.Double.doubleToLongBits(d)
        case v => v
      }
    assert(bits(1) === bits(9))
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class RegressionSpec extends SparkSpec {
  import spark.implicits._

  private def ols(rows: Seq[(String, Long, Long)])
      : Map[String, (Long, Option[Double], Option[Double], Option[Double])] =
    Regression.groupOls(rows.toDF("g", "x", "y"), "g", "x", "y")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map { case (g, n, s, i, r) => g -> ((n, s, i, r)) }.toMap

  test("perfect line recovers slope, intercept, and r2 = 1 exactly") {
    val rows = (0L to 10L).map(x => ("g", x, 3 + 2 * x))
    val (n, s, i, r) = ols(rows)("g")
    assert(n === 11L && s === Some(2.0) && i === Some(3.0) && r === Some(1.0))
  }

  test("negative trend") {
    val rows = (0L to 5L).map(x => ("g", x, 100 - 7 * x))
    val (_, s, i, _) = ols(rows)("g")
    assert(s === Some(-7.0) && i === Some(100.0))
  }

  test("constant x yields null estimates") {
    val (n, s, i, r) = ols(Seq(("g", 4L, 1L), ("g", 4L, 9L)))("g")
    assert(n === 2L && s.isEmpty && i.isEmpty && r.isEmpty)
  }

  test("constant y: zero slope, intercept = mean, null r2") {
    val (_, s, i, r) = ols(Seq(("g", 1L, 5L), ("g", 2L, 5L), ("g", 3L, 5L)))("g")
    assert(s === Some(0.0) && i === Some(5.0) && r.isEmpty)
  }

  test("hand-computed noisy fit matches the closed form") {
    val pts = Seq((1L, 2L), (2L, 5L), (3L, 4L), (4L, 9L), (5L, 8L))
    val n = pts.size.toDouble
    val sx = pts.map(_._1).sum.toDouble; val sy = pts.map(_._2).sum.toDouble
    val sxy = pts.map(p => p._1 * p._2).sum.toDouble
    val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    val syy = pts.map(p => p._2 * p._2).sum.toDouble
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val r2 = (n * sxy - sx * sy) * (n * sxy - sx * sy) /
      ((n * sxx - sx * sx) * (n * syy - sy * sy))
    val (_, s, _, r) = ols(pts.map { case (x, y) => ("g", x, y) })("g")
    assert(math.abs(s.get - slope) < 1e-12 && math.abs(r.get - r2) < 1e-12)
  }

  test("groups are independent; null coordinates are dropped") {
    val df = Seq(
      ("a", Some(1L), Some(1L)), ("a", Some(2L), Some(2L)), ("a", None, Some(9L)),
      ("b", Some(1L), Some(10L)), ("b", Some(2L), Some(8L)), ("b", Some(3L), None))
      .toDF("g", "x", "y")
    val r = Regression.groupOls(df, "g", "x", "y")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(t => t._1 -> t).toMap
    assert(r("a")._2 === 2L && r("a")._3 === Some(1.0))
    assert(r("b")._2 === 2L && r("b")._3 === Some(-2.0))
  }

  test("32-bit inputs do not wrap: products widen to long BEFORE summing") {
    // y = 50000 cents: y*y = 2.5e9 overflows Int (wraps silently under
    // non-ANSI eval) — the operator must widen first, not rely on callers
    val df = Seq(("g", 0, 50000), ("g", 1, 50001), ("g", 2, 50002))
      .toDF("g", "x", "y") // IntegerType columns
    val (_, s, i, r) = Regression.groupOls(df, "g", "x", "y")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map { case (g, n, sl, ic, r2) => g -> ((n, sl, ic, r2)) }.toMap.apply("g")
    assert(s === Some(1.0) && i === Some(50000.0) && r === Some(1.0))
  }

  test("bit-identical across partitionings (integer moments)") {
    val rows = (1L to 500L).map(i => ("g", i % 37, (i * 13) % 101))
    val a = Regression.groupOls(rows.toDF("g", "x", "y").repartition(1), "g", "x", "y")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])].head()
    val b = Regression.groupOls(rows.toDF("g", "x", "y").repartition(19), "g", "x", "y")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])].head()
    assert(a === b)
  }

  test("theilSen: median pairwise slope shrugs off the outlier that bends OLS") {
    // y = x on days 1..3, then a blown-up day 4: pairwise slopes are
    // [1, 1, 1, 33, 49, 97] → lower median (rank 3 of 6) = 1.0
    val pts = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 3L), ("g", 4L, 100L))
      .toDF("grp", "x", "y")
    val ts = Regression.theilSenSlope(pts, "grp", "x", "y")
      .as[(String, Long, Double)].head()
    assert(ts === (("g", 6L, 1.0)))
    val ols = Regression.groupOls(pts, "grp", "x", "y")
      .select("slope").as[Option[Double]].head().get
    assert(ols > 20.0, s"OLS should be dragged by the outlier, got $ols")
    // clean linear series: exact slope at any partitioning
    val lin = (1L to 30L).map(i => ("h", i, 7L * i + 3L)).toDF("grp", "x", "y")
    val got = Regression.theilSenSlope(lin.repartition(7), "grp", "x", "y")
      .as[(String, Long, Double)].head()
    assert(got === (("h", 435L, 7.0)))
  }

  private def gd(rows: Seq[(Long, Long, Int)], lr: Double) =
    Regression.logregGdStep(rows.toDF("b", "x", "y"),
      Seq("bias" -> col("b"), "x" -> col("x")), col("y"), lr)
      .as[(String, Long, Double, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap

  test("logreg step: gradient at w=0 matches the rational closed form") {
    // y=1 at x=10,20; y=0 at x=2,4. n=4
    val rows = Seq((1L, 10L, 1), (1L, 20L, 1), (1L, 2L, 0), (1L, 4L, 0))
    val lr = 0.001
    val r = gd(rows, lr)
    // grad0_x = (Σx − 2Σ_{y=1}x)/(2n) = (36 − 60)/8 = −3; bias: (4−4)/8 = 0
    val (n, g0x, w1x, _, l0, l1) = r("x")
    assert(n === 4L && g0x === -3.0 && w1x === lr * 24 / 8)
    assert(r("bias")._2 === 0.0 && r("bias")._3 === 0.0)
    assert(math.abs(l0 - math.log(2.0)) < 1e-15)
    // a descent step on a separable set must reduce the loss
    assert(l1 < l0)
    // hand-replay pass 2 for the x gradient
    val w = lr * 3.0
    val terms = rows.map { case (_, x, y) =>
      val z = 0.0 * 1 + w * x
      val p = math.exp(z) / (1 + math.exp(z))
      math.floor((p - y) * x * 1e9 + 0.5).toLong
    }
    assert(math.abs(r("x")._4 - terms.sum.toDouble / 1e9 / 4) < 1e-15)
  }

  test("logreg step: balanced label with symmetric x gives zero gradients") {
    val rows = Seq((1L, 5L, 1), (1L, 5L, 0), (1L, -5L, 1), (1L, -5L, 0))
    val r = gd(rows, 0.01)
    assert(r("x")._2 === 0.0 && r("x")._3 === 0.0)
    // w1 = 0 ⇒ loss1 = loss0 = ln 2 (up to the 1e-9 term quantization)
    assert(math.abs(r("x")._6 - math.log(2.0)) < 1e-9)
  }

  test("logreg step: nulls drop listwise; bit-identical across partitionings") {
    val rows = (1 to 200).map(i => (1L, (i * 13 % 41).toLong, i % 2))
    def run(parts: Int) =
      Regression.logregGdStep(rows.toDF("b", "x", "y").repartition(parts),
        Seq("bias" -> col("b"), "x" -> col("x")), col("y"), 1e-4)
        .collect().map(_.toSeq.map {
          case d: Double => java.lang.Double.doubleToLongBits(d)
          case v => v
        }).sortBy(_.mkString("|"))
    assert(run(1) === run(13))
    val withNull = rows.map { case (b, x, y) => (b, Some(x), y) } :+ ((1L, Option.empty[Long], 1))
    val n = Regression.logregGdStep(withNull.toDF("b", "x", "y"),
      Seq("bias" -> col("b"), "x" -> col("x")), col("y"), 1e-4)
      .select("n").as[Long].head()
    assert(n === 200L)
  }

  private def cuped(rows: Seq[(String, Long, Long)]) =
    Regression.cuped(rows.toDF("arm", "x", "y"), "arm", "y", "x")
      .collect().map { r =>
        r.getString(0) -> (r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Double]),
          Option(r.get(5)).map(_.asInstanceOf[Double]),
          Option(r.get(8)).map(_.asInstanceOf[Double]))
      }.toMap

  test("cuped: hand-computed pooled theta, adjusted means, var reduction") {
    val rows = Seq(("A", 10L, 100L), ("A", 20L, 120L), ("A", 30L, 160L),
      ("B", 20L, 90L), ("B", 30L, 140L), ("B", 40L, 160L))
    val out = cuped(rows)
    val (nA, myA, adjA, thA, vrA) = out("A")
    val (nB, _, adjB, thB, _) = out("B")
    assert(nA === 3L && nB === 3L)
    assert(thA === thB)
    assert(math.abs(thA.get - 27.0 / 11.0) < 1e-15)
    assert(math.abs(myA.get - 380.0 / 3.0) < 1e-12)
    assert(math.abs(adjA.get - 138.93939393939394) < 1e-12)
    assert(math.abs(adjB.get - 117.72727272727272) < 1e-12)
    assert(vrA.get > 0.93 && vrA.get < 0.94)
  }

  test("cuped: adjustment preserves the pooled mean (unbiasedness identity)") {
    val rows = Seq(("A", 10L, 100L), ("A", 20L, 120L), ("A", 30L, 160L),
      ("B", 20L, 90L), ("B", 30L, 140L), ("B", 40L, 160L))
    val out = cuped(rows)
    val pooledAdj = out.map { case (_, (n, _, adj, _, _)) => n * adj.get }.sum / 6.0
    assert(math.abs(pooledAdj - 770.0 / 6.0) < 1e-12)
  }

  test("cuped: constant covariate yields null theta and null adjusted stats") {
    val rows = Seq(("A", 5L, 10L), ("A", 5L, 20L), ("B", 5L, 30L))
    val out = cuped(rows)
    assert(out("A")._4.isEmpty && out("A")._3.isEmpty && out("A")._5.isEmpty)
  }

  test("cuped: bit determinism under repartitioning, listwise null drops") {
    val rng = new scala.util.Random(11)
    val rows = (1 to 500).map { i =>
      val x = rng.nextInt(1000).toLong
      (if (i % 2 == 0) "A" else "B", x, x * 2 + rng.nextInt(100))
    }
    val df = rows.toDF("arm", "x", "y")
    def bits(parts: Int) = Regression.cuped(df.repartition(parts), "arm", "y", "x")
      .collect().map(_.toSeq.map {
        case d: Double => java.lang.Double.doubleToLongBits(d)
        case v => v
      }).sortBy(_.mkString("|")).toSeq
    assert(bits(1) === bits(17))
    val withNull = rows.map { case (a, x, y) => (a, Some(x), y) } :+
      (("A", Option.empty[Long], 7L))
    val n = Regression.cuped(withNull.toDF("arm", "x", "y"), "arm", "y", "x")
      .agg(org.apache.spark.sql.functions.sum("n")).as[Long].head()
    assert(n === 500L)
  }

  test("covariateBalance: hand SMDs, balanced flag, degenerate variance") {
    val rows = Seq(
      (true, 10L, 1L), (true, 20L, 2L), (true, 30L, 3L),
      (false, 10L, 5L), (false, 30L, 7L))
    val out = Regression.covariateBalance(rows.toDF("a", "x1", "x2"),
        col("a"), Seq("x1" -> col("x1"), "x2" -> col("x2")))
      .collect().map(r => r.getString(0) -> r).toMap
    val r1 = out("x1"); val r2 = out("x2")
    assert(r1.getLong(1) === 3L && r1.getLong(2) === 2L)
    assert(r1.getDouble(3) === 20.0 && r1.getDouble(4) === 20.0)
    assert(r1.getDouble(7) === 0.0 && r1.getBoolean(8))
    assert(math.abs(r2.getDouble(7) - (-4.381780460041329)) < 1e-12)
    assert(!r2.getBoolean(8))
    // constant covariate in both arms: pooled variance 0 -> null smd
    val const = Regression.covariateBalance(
      Seq((true, 5L), (false, 5L)).toDF("a", "x"), col("a"),
      Seq("x" -> col("x"))).collect().head
    assert(const.isNullAt(7) && const.isNullAt(8))
  }

  test("covariateBalance: listwise nulls share one n; bit determinism") {
    val rows = Seq(
      (true, Some(1L), Some(2L)), (true, None, Some(3L)),
      (false, Some(4L), Some(5L)), (false, Some(6L), None))
    val out = Regression.covariateBalance(rows.toDF("a", "x1", "x2"),
        col("a"), Seq("x1" -> col("x1"), "x2" -> col("x2")))
      .collect()
    assert(out.forall(r => r.getLong(1) === 1L && r.getLong(2) === 1L))
    val rng = new scala.util.Random(17)
    val big = (1 to 400).map(i => (i % 2 == 0, rng.nextInt(100).toLong,
      rng.nextInt(100).toLong)).toDF("a", "x1", "x2")
    def bits(p: Int) = Regression.covariateBalance(big.repartition(p),
        col("a"), Seq("x1" -> col("x1"), "x2" -> col("x2")))
      .collect().map(_.toSeq.map {
        case d: Double => java.lang.Double.doubleToLongBits(d)
        case v => v
      }).sortBy(_.mkString("|")).toSeq
    assert(bits(1) === bits(13))
  }

  test("effectSizes: hand-computed d, g, glass on a two-arm fixture") {
    // A = {2,4,6}: mean 4, ssd 8; B = {1,2,3}: mean 2, ssd 2
    val rows = Seq(("t", true, 2L), ("t", true, 4L), ("t", true, 6L),
      ("t", false, 1L), ("t", false, 2L), ("t", false, 3L))
      .toDF("g", "a", "v")
    val r = Regression.effectSizes(rows, "g", col("a"), "v").collect().head
    assert(r.getLong(1) === 3L && r.getLong(2) === 3L)
    assert(r.getDouble(3) === 2.0) // mean diff
    val sPool = math.sqrt((8.0 + 2.0) / 4.0)
    assert(math.abs(r.getDouble(4) - 2.0 / sPool) < 1e-12)
    val j = 1.0 - 3.0 / (4.0 * 6 - 9.0)
    assert(math.abs(r.getDouble(5) - j * (2.0 / sPool)) < 1e-12)
    assert(math.abs(r.getDouble(6) - 2.0 / 1.0) < 1e-12) // s_B = 1
  }

  test("effectSizes: degenerate arms give NULLs; scale equivariance of d") {
    // constant pooled deviation -> null d/g; constant B arm -> null glass
    val const = Seq(("t", true, 5L), ("t", true, 5L),
      ("t", false, 3L), ("t", false, 3L)).toDF("g", "a", "v")
    val rc = Regression.effectSizes(const, "g", col("a"), "v").collect().head
    assert(rc.isNullAt(4) && rc.isNullAt(5) && rc.isNullAt(6))
    // d is invariant to scaling the value unit (cents vs 10×cents)
    val rng = new scala.util.Random(19)
    val base = (1 to 300).map(i => ("t", i % 2 == 0,
      (rng.nextInt(50) + (if (i % 2 == 0) 10 else 0)).toLong))
    val d1 = Regression.effectSizes(base.toDF("g", "a", "v"), "g", col("a"), "v")
      .collect().head.getDouble(4)
    val d10 = Regression.effectSizes(base.map { case (g, a, v) => (g, a, v * 10) }
      .toDF("g", "a", "v"), "g", col("a"), "v").collect().head.getDouble(4)
    assert(math.abs(d1 - d10) < 1e-12)
    assert(d1 > 0.5, "shifted arm must register a solid effect")
  }

  test("diffInDiff: hand 2x2 cells, effect, Welch SE; thin cells NULL") {
    import org.apache.spark.sql.functions.col
    // T pre [10,12]→11, T post [20,24]→22; C pre [10,14]→12,
    // C post [13,17]→15: DiD = (22−11) − (15−12) = 8.
    // Cell variance terms s²/n: 1, 4, 4, 4 → SE = √13, t = 8/√13
    val rows = Seq(
      (true, false, 10L), (true, false, 12L),
      (true, true, 20L), (true, true, 24L),
      (false, false, 10L), (false, false, 14L),
      (false, true, 13L), (false, true, 17L)).toDF("t", "p", "v")
    val r = Regression.diffInDiff(rows, col("t"), col("p"), "v")
      .collect().head
    assert((0 to 3).map(r.getLong) === Seq(2L, 2L, 2L, 2L))
    assert(r.getDouble(4) === 11.0 && r.getDouble(5) === 22.0)
    assert(r.getDouble(6) === 12.0 && r.getDouble(7) === 15.0)
    assert(math.abs(r.getDouble(8) - 8.0) < 1e-12)
    assert(math.abs(r.getDouble(9) - math.sqrt(13.0)) < 1e-12)
    assert(math.abs(r.getDouble(10) - 8.0 / math.sqrt(13.0)) < 1e-12)
    // a single-observation cell cannot estimate its variance → NULLs
    val thin = Seq((true, false, 10L), (true, true, 20L),
      (false, false, 10L), (false, true, 12L)).toDF("t", "p", "v")
    val rt = Regression.diffInDiff(thin, col("t"), col("p"), "v")
      .collect().head
    assert(rt.isNullAt(8) && rt.isNullAt(9) && rt.isNullAt(10))
  }
}

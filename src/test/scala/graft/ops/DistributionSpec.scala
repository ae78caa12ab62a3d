package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DistributionSpec extends SparkSpec {
  import spark.implicits._

  // segment A: x,x,x,y — segment B: x,z
  // global: x=4/6, y=1/6, z=1/6
  private lazy val rows = Seq(
    ("A", "x"), ("A", "x"), ("A", "x"), ("A", "y"),
    ("B", "x"), ("B", "z")).toDF("seg", "cat")

  private def drift = Distribution.categoricalDrift(rows, "seg", "cat")
    .collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap

  test("entropy / KL / TVD match hand-computed values (absent categories included in TVD)") {
    val (nA, cA, hA, klA, tvA) = drift("A")
    assert(nA === 4L && cA === 2L)
    val pA = Seq(0.75, 0.25); val qA = Seq(4.0 / 6, 1.0 / 6)
    assert(math.abs(hA - -pA.map(p => p * math.log(p)).sum) < 1e-9)
    assert(math.abs(klA - pA.zip(qA).map { case (p, q) => p * math.log(p / q) }.sum) < 1e-9)
    // TVD folds in the absent category z exactly: (|.75-4/6| + |.25-1/6| + 1/6)/2 = 1/6
    assert(math.abs(tvA - 1.0 / 6) < 1e-9)
  }

  test("a segment identical to the global mix has zero KL and TVD") {
    val uniform = Seq(
      ("A", "x"), ("A", "y"), ("B", "x"), ("B", "y")).toDF("seg", "cat")
    val d = Distribution.categoricalDrift(uniform, "seg", "cat")
      .collect().map(r => r.getString(0) -> ((r.getDouble(4), r.getDouble(5)))).toMap
    for ((_, (kl, tvd)) <- d) {
      assert(math.abs(kl) < 1e-12 && math.abs(tvd) < 1e-12)
    }
  }

  test("single-category segment: zero entropy; null segments/categories dropped") {
    val data = Seq(
      (Some("A"), Some("x")), (Some("A"), Some("x")),
      (None, Some("x")), (Some("B"), None), (Some("B"), Some("y")))
      .toDF("seg", "cat")
    val d = Distribution.categoricalDrift(data, "seg", "cat")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    assert(d("A") === ((2L, 0.0)))  // two x rows, entropy exactly -1·ln(1) = 0
    assert(d("B")._1 === 1L)        // the null-category row is gone
  }

  test("partitioning-independent up to float-rounding grain") {
    val big = (1 to 500).map(i => (s"s${i % 7}", s"c${i % 11}"))
    def run(parts: Int) = Distribution
      .categoricalDrift(big.toDF("seg", "cat").repartition(parts), "seg", "cat")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), math.round(r.getDouble(3) * 1e9),
          math.round(r.getDouble(4) * 1e9), math.round(r.getDouble(5) * 1e9)))).toMap
    assert(run(1) === run(17))
  }
}

class KsDriftSpec extends SparkSpec {
  import spark.implicits._

  test("KS of a segment vs global matches the brute-force ECDF max") {
    val rows = Seq(("A", 1L), ("A", 1L), ("A", 2L), ("A", 5L),
      ("B", 2L), ("B", 3L), ("B", 3L), ("B", 9L))
    val got = Distribution.ksDrift(rows.toDF("seg", "v"), "seg", "v")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val all = rows.map(_._2).sorted
    def ecdf(xs: Seq[Long])(v: Long) = xs.count(_ <= v).toDouble / xs.size
    for (seg <- Seq("A", "B")) {
      val sv = rows.filter(_._1 == seg).map(_._2)
      val brute = all.distinct.map(v => math.abs(ecdf(sv)(v) - ecdf(all)(v))).max
      assert(got(seg)._1 === sv.size.toLong)
      assert(math.abs(got(seg)._2 - brute) < 1e-12, s"seg $seg")
    }
  }

  test("a segment that IS the global distribution drifts by zero; nulls dropped") {
    val rows = Seq((Some("A"), Some(1L)), (Some("A"), Some(2L)),
      (Some("B"), Some(1L)), (Some("B"), Some(2L)),
      (None, Some(7L)), (Some("A"), None)).toDF("seg", "v")
    val got = Distribution.ksDrift(rows, "seg", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got.values.forall(d => math.abs(d) < 1e-12))
  }

  test("disjoint segments: KS grows with separation; partitioning-invariant") {
    val rows = ((1 to 40).map(i => ("lo", i.toLong)) ++
      (1 to 40).map(i => ("hi", i + 100L)))
    def run(parts: Int) = Distribution
      .ksDrift(rows.toDF("seg", "v").repartition(parts), "seg", "v")
      .collect().map(r => r.getString(0) -> math.round(r.getDouble(2) * 1e9)).toMap
    // each segment is half the mass and fully on one side: D = 0.5 exactly
    assert(run(1)("lo") === math.round(0.5e9) && run(1)("hi") === math.round(0.5e9))
    assert(run(1) === run(13))
  }
}

class PsiDriftSpec extends SparkSpec {
  import spark.implicits._

  test("PSI matches the smoothed hand computation (empty segment bins included)") {
    // boundaries 10, 20 → 3 bins; A sits in bin 0+1, B entirely in bin 2
    val rows = Seq(("A", 1L), ("A", 5L), ("A", 15L), ("B", 25L), ("B", 30L))
    val got = Distribution.psiDrift(rows.toDF("seg", "v"), "seg", "v", Seq(10.0, 20.0))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def psi(cs: Seq[Long], gs: Seq[Long]): Double = {
      val n = cs.sum.toDouble; val g = gs.sum.toDouble; val b = cs.size
      cs.zip(gs).map { case (c, gc) =>
        val p = (c + 0.5) / (n + 0.5 * b); val q = (gc + 0.5) / (g + 0.5 * b)
        (p - q) * math.log(p / q)
      }.sum
    }
    assert(got("A")._1 === 3L)
    assert(math.abs(got("A")._2 - psi(Seq(2, 1, 0), Seq(2, 1, 2))) < 1e-12)
    assert(math.abs(got("B")._2 - psi(Seq(0, 0, 2), Seq(2, 1, 2))) < 1e-12)
  }

  test("segment matching the global mix has near-zero PSI; invariant to partitioning") {
    val rows = (1 to 300).map(i => (s"s${i % 3}", (i % 30).toLong))
    def run(parts: Int) = Distribution
      .psiDrift(rows.toDF("seg", "v").repartition(parts), "seg", "v",
        Seq(10.0, 20.0))
      .collect().map(r => r.getString(0) -> math.round(r.getDouble(2) * 1e9)).toMap
    // every segment has the identical value multiset → PSI ≈ 0 (only the
    // ½-count smoothing perturbs it, identically per segment)
    assert(run(1).values.toSet.size === 1)
    assert(run(1) === run(7))
  }
}

class MutualInfoSpec extends SparkSpec {
  import spark.implicits._

  private def mi(rows: Seq[(String, String)]): (Long, Double, Double, Double, Double) = {
    val r = Distribution.mutualInformation(rows.toDF("x", "y"), "x", "y").collect().head
    (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
  }

  test("independent columns: mi = 0; identical columns: mi = entropy") {
    val indep = for (x <- Seq("a", "b"); y <- Seq("u", "v")) yield (x, y)
    val (_, _, _, _, mInd) = mi(indep)
    assert(math.abs(mInd) < 1e-12)
    val ident = Seq(("a", "a"), ("a", "a"), ("b", "b"), ("c", "c"))
    val (n, hx, hy, hxy, m) = mi(ident)
    assert(n === 4L)
    assert(math.abs(m - hx) < 1e-12 && math.abs(hx - hy) < 1e-12 &&
      math.abs(hxy - hx) < 1e-12)
  }

  test("hand-computed MI on a skewed joint; nulls dropped") {
    val rows = Seq(("a", "u"), ("a", "u"), ("a", "v"), ("b", "v"))
    val (n, hx, hy, hxy, m) = mi(rows)
    assert(n === 4L)
    def h(ps: Seq[Double]) = -ps.map(p => p * math.log(p)).sum
    assert(math.abs(hx - h(Seq(0.75, 0.25))) < 1e-12)
    assert(math.abs(hy - h(Seq(0.5, 0.5))) < 1e-12)
    assert(math.abs(hxy - h(Seq(0.5, 0.25, 0.25))) < 1e-12)
    assert(math.abs(m - (hx + hy - hxy)) < 1e-12)
    val withNulls = Seq((Some("a"), Some("u")), (None, Some("u")), (Some("a"), None))
    val r = Distribution.mutualInformation(withNulls.toDF("x", "y"), "x", "y")
      .collect().head
    assert(r.getLong(0) === 1L)
  }
}

class WeightedMedianSpec extends SparkSpec {
  import spark.implicits._

  private def wm(rows: Seq[(String, Long, Long)]): Map[String, (Long, Long)] =
    Aggregates.weightedMedian(rows.toDF("g", "v", "w"), "g", "v", "w")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("weight mass pulls the median to the heavy value") {
    // weights 1,1,10 on values 1,2,3: half of 12 is first reached at 3
    assert(wm(Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 10L)))("g") === ((3L, 12L)))
  }

  test("even split takes the LOWER median") {
    assert(wm(Seq(("g", 1L, 1L), ("g", 2L, 1L)))("g") === ((1L, 2L)))
  }

  test("tied values collapse before the cumulative window") {
    assert(wm(Seq(("g", 5L, 1L), ("g", 5L, 1L), ("g", 5L, 1L), ("g", 7L, 2L)))("g") === ((5L, 5L)))
  }

  test("zero / negative / null weights are dropped (never become a median)") {
    val df = Seq(
      (Some("g"), Some(100L), Some(0L)), (Some("g"), Some(200L), Some(-3L)),
      (Some("g"), Some(1L), Some(1L)), (Some("g"), None, Some(9L)),
      (Some("g"), Some(2L), Option.empty[Long])).toDF("g", "v", "w")
    val got = Aggregates.weightedMedian(df, "g", "v", "w")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("g") === ((1L, 1L)))
  }

  test("groups independent; partitioning-invariant (integer arithmetic)") {
    val rows = (1L to 300L).map(i => (s"g${i % 3}", i % 23, i % 7 + 1))
    def run(parts: Int) =
      Aggregates.weightedMedian(rows.toDF("g", "v", "w").repartition(parts), "g", "v", "w")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(1) === run(13))
    // cross-check one group by brute force
    val g0 = rows.filter(_._1 == "g0").groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq.sortBy(_._1)
    val tot = g0.map(_._2).sum
    val brute = g0.scanLeft((0L, 0L)) { case ((_, cw), (v, w)) => (v, cw + w) }
      .drop(1).find { case (_, cw) => cw * 2 >= tot }.get._1
    assert(run(1).collect { case ("g0", m, _) => m }.head === brute)
  }
}

class ChiSquareSpec extends SparkSpec {
  import spark.implicits._

  private def chi(rows: Seq[(String, String)]): (Long, Long, Double, Option[Double]) = {
    val r = Distribution.chiSquare(rows.toDF("x", "y"), "x", "y").collect().head
    (r.getLong(0), r.getLong(1), r.getDouble(2),
      if (r.isNullAt(3)) None else Some(r.getDouble(3)))
  }

  test("independent columns give chi2 = 0; perfect association gives V = 1") {
    val indep = for (x <- Seq("a", "b"); y <- Seq("u", "v"); _ <- 1 to 3) yield (x, y)
    val (n, dof, c0, _) = chi(indep)
    assert(n === 12L && dof === 1L && math.abs(c0) < 1e-9)
    // x determines y on a 2x2: chi2 = n, V = 1
    val assoc = Seq.fill(5)(("a", "u")) ++ Seq.fill(7)(("b", "v"))
    val (n2, _, c2, v2) = chi(assoc)
    assert(math.abs(c2 - n2) < 1e-9 && math.abs(v2.get - 1.0) < 1e-12)
  }

  test("matches the brute-force full-grid computation (absent cells folded exactly)") {
    // 3x3 with several absent cells
    val rows = Seq(("a", "u"), ("a", "u"), ("a", "v"), ("b", "v"), ("b", "w"),
      ("c", "u"), ("c", "w"), ("c", "w"), ("c", "w"))
    val (n, dof, got, _) = chi(rows)
    val xs = rows.map(_._1).distinct; val ys = rows.map(_._2).distinct
    val brute = (for (x <- xs; y <- ys) yield {
      val o = rows.count(r => r._1 == x && r._2 == y).toDouble
      val e = rows.count(_._1 == x).toDouble * rows.count(_._2 == y) / rows.size
      (o - e) * (o - e) / e
    }).sum
    assert(n === 9L && dof === 4L)
    assert(math.abs(got - brute) < 1e-9)
  }

  test("single-category column: dof 0, null V; nulls dropped from counts") {
    val rows = Seq((Some("a"), Some("u")), (Some("a"), Some("v")),
      (None, Some("u")), (Some("a"), None)).toDF("x", "y")
    val r = Distribution.chiSquare(rows, "x", "y").collect().head
    assert(r.getLong(0) === 2L && r.getLong(1) === 0L && r.isNullAt(3))
  }
}

class GiniSpec extends SparkSpec {
  import spark.implicits._

  private def gini(rows: Seq[(String, Long)]): Map[String, (Long, Option[Double])] =
    Aggregates.giniConcentration(rows.toDF("g", "v"), "g", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap

  test("equal values → 0; one row owns all mass → (n-1)/n; zero mass → null") {
    val got = gini(Seq(("eq", 5L), ("eq", 5L), ("eq", 5L), ("eq", 5L),
      ("one", 0L), ("one", 0L), ("one", 0L), ("one", 9L),
      ("zero", 0L), ("zero", 0L)))
    assert(got("eq") === ((4L, Some(0.0))))
    assert(math.abs(got("one")._2.get - 3.0 / 4) < 1e-12)
    assert(got("zero") === ((2L, None)))
  }

  test("matches the mean-absolute-difference identity on arbitrary data (ties included)") {
    val vs = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L, 5L, 3L)
    val got = gini(vs.map(("g", _)))("g")._2.get
    val n = vs.size; val mass = vs.sum.toDouble
    val mad = (for (a <- vs; b <- vs) yield math.abs(a - b)).sum.toDouble
    assert(math.abs(got - mad / (2 * n * mass)) < 1e-12)
  }

  test("negative values and null groups are dropped; partitioning-invariant") {
    val rows = Seq((Some("g"), Some(10L)), (Some("g"), Some(-3L)),
      (None, Some(7L)), (Some("g"), None), (Some("g"), Some(20L)))
    val got = Aggregates.giniConcentration(rows.toDF("g", "v"), "g", "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("g" -> 2L))
    val big = (1 to 400).map(i => (s"g${i % 3}", (i * 13 % 97).toLong))
    def run(parts: Int) = Aggregates
      .giniConcentration(big.toDF("g", "v").repartition(parts), "g", "v")
      .collect().map(r => r.getString(0) ->
        java.lang.Double.doubleToLongBits(r.getDouble(2))).toMap
    assert(run(1) === run(11))
  }
}

class GroupedQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private val ps = Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75", 1.0 -> "p100")

  test("matches the sequential lower-quantile definition, ties included") {
    val rows = Seq(("g", 1L), ("g", 1L), ("g", 2L), ("g", 3L), ("g", 3L),
      ("g", 3L), ("g", 7L), ("h", 10L))
    val got = Aggregates.groupedQuantiles(rows.toDF("g", "v"), "g", "v", ps)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    def brute(vs: Seq[Long], p: Double): Long = {
      val sorted = vs.sorted; sorted(math.ceil(p * vs.size).toInt - 1)
    }
    val gvs = rows.filter(_._1 == "g").map(_._2)
    assert(got("g") === ((7L, brute(gvs, 0.25), brute(gvs, 0.5),
      brute(gvs, 0.75), brute(gvs, 1.0))))
    assert(got("h") === ((1L, 10L, 10L, 10L, 10L)))   // singleton: all quantiles = the value
  }

  test("groups are independent and results partitioning-invariant (integer semantics)") {
    val rows = (1 to 500).map(i => (s"g${i % 4}", (i * 31 % 211).toLong))
    def run(parts: Int) = Aggregates
      .groupedQuantiles(rows.toDF("g", "v").repartition(parts), "g", "v", ps)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(run(1) === run(13))
    // cross-check one group against the sequential definition
    val g0 = rows.filter(_._1 == "g0").map(_._2).sorted
    val p50 = g0(math.ceil(0.5 * g0.size).toInt - 1)
    assert(run(1).collect { case ("g0", _, m, _) => m }.head === p50)
  }
}

class GroupedQuantilesContSpec extends SparkSpec {
  import spark.implicits._

  private val ps = Seq(0.0 -> "p0", 0.25 -> "p25", 0.5 -> "p50", 0.95 -> "p95", 1.0 -> "p100")

  private def brute(vs: Seq[Long], p: Double): Double = {
    val s = vs.sorted
    val h = p * (s.size - 1)
    val lo = math.floor(h).toInt; val hi = math.ceil(h).toInt
    s(lo) + (h - lo) * (s(hi) - s(lo))
  }

  test("matches the sequential linear-interpolation definition, ties included") {
    val rows = Seq(("g", 1L), ("g", 1L), ("g", 2L), ("g", 3L), ("g", 3L),
      ("g", 3L), ("g", 7L), ("h", 10L))
    val got = Aggregates.groupedQuantilesCont(rows.toDF("g", "v"), "g", "v", ps)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), (2 to 6).map(r.getDouble)))).toMap
    val gvs = rows.filter(_._1 == "g").map(_._2)
    assert(got("g")._1 === 7L)
    got("g")._2.zip(ps).foreach { case (v, (p, name)) =>
      assert(v === brute(gvs, p), s"quantile $name")
    }
    assert(got("h")._2.forall(_ === 10.0)) // singleton: every quantile = the value
  }

  test("weighted form over a collapsed table ≡ unweighted over the expansion") {
    val collapsed = Seq(("g", 1L, 3L), ("g", 5L, 1L), ("g", 9L, 2L), ("h", 4L, 5L))
    val expanded = collapsed.flatMap { case (g, v, w) => Seq.fill(w.toInt)((g, v)) }
    val a = Aggregates.groupedQuantilesContWeighted(
        collapsed.toDF("g", "v", "w"), "g", "v", "w", ps)
      .collect().map(r => r.getString(0) -> (2 to 6).map(r.getDouble)).toMap
    expanded.groupBy(_._1).foreach { case (g, rs) =>
      a(g).zip(ps).foreach { case (v, (p, _)) =>
        assert(v === brute(rs.map(_._2), p), s"group $g p=$p")
      }
    }
  }

  test("partitioning-invariant; null values and non-positive weights dropped") {
    val rows = (1 to 400).map(i => (s"g${i % 3}", (i * 37 % 97).toLong))
    def run(parts: Int) = Aggregates
      .groupedQuantilesCont(rows.toDF("g", "v").repartition(parts), "g", "v", ps)
      .collect().map(r => (r.getString(0), (2 to 6).map(r.getDouble))).toSet
    assert(run(1) === run(17))
    val withBad = Seq(("g", Some(1L), 2L), ("g", None, 5L), ("g", Some(3L), 0L),
      ("g", Some(9L), 1L))
    val got = Aggregates.groupedQuantilesContWeighted(
        withBad.toDF("g", "v", "w"), "g", "v", "w", Seq(0.5 -> "p50"))
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(got === Array((3L, 1.0))) // n=3 (weights 2+1), median of {1,1,9}
  }
}

class LiftCellsSpec extends SparkSpec {
  import spark.implicits._

  test("lift matches o·n/(rowTot·colTot); independence gives lift 1; absent cells absent") {
    val indep = for (x <- Seq("a", "b"); y <- Seq("u", "v"); _ <- 1 to 2) yield (x, y)
    val flat = Distribution.liftCells(indep.toDF("x", "y"), "x", "y").collect()
    assert(flat.length === 4 && flat.forall(r => math.abs(r.getDouble(4) - 1.0) < 1e-12))
    val rows = Seq(("a", "u"), ("a", "u"), ("a", "v"), ("b", "v"))
    val m = Distribution.liftCells(rows.toDF("x", "y"), "x", "y")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(m(("a", "u")) === ((2L, 1.5, 4.0 / 3)))   // e = 3·2/4, lift = 2·4/(3·2)
    assert(!m.contains(("b", "u")) && m.size === 3)  // absent cell not built
  }
}

class AbTestSpec extends SparkSpec {
  import spark.implicits._

  test("counts, rates and z match the closed form; null arm/label rows excluded") {
    // arm A: 3/6 convert; arm B: 1/4 convert
    val df = (Seq.fill(3)((true, true)) ++ Seq.fill(3)((true, false)) ++
      Seq.fill(1)((false, true)) ++ Seq.fill(3)((false, false)))
      .toDF("a", "y")
    val r = Distribution.abTest(df, col("a"), col("y")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) === ((6L, 4L, 3L, 1L)))
    val (pa, pb, pool) = (0.5, 0.25, 0.4)
    val z = (pa - pb) / math.sqrt(pool * (1 - pool) * (1.0 / 6 + 1.0 / 4))
    assert(math.abs(r.getDouble(4) - pa) < 1e-12 && math.abs(r.getDouble(5) - pb) < 1e-12)
    assert(math.abs(r.getDouble(6) - (pa - pb)) < 1e-12)
    assert(math.abs(r.getDouble(7) - z) < 1e-12)
    val withNulls = df.union(Seq((true, true)).toDF("a", "y")
      .select(lit(null).cast("boolean").as("a"), col("y")))
    val r2 = Distribution.abTest(withNulls, col("a"), col("y")).collect().head
    assert(r2.getLong(0) === 6L && r2.getLong(1) === 4L)
  }

  test("degenerate pools (all-positive or one empty arm) yield null z, not NaN") {
    val allPos = Seq((true, true), (false, true)).toDF("a", "y")
    assert(Distribution.abTest(allPos, col("a"), col("y")).collect().head.isNullAt(7))
    val oneArm = Seq((true, true), (true, false)).toDF("a", "y")
    assert(Distribution.abTest(oneArm, col("a"), col("y")).collect().head.isNullAt(7))
  }
}

class AnovaFSpec extends SparkSpec {
  import spark.implicits._

  private def anova(rows: Seq[(String, Long)]): (Long, Long, Option[Double], Option[Double]) =
    Distribution.anovaF(rows.toDF("g", "v"), "g", "v")
      .as[(Long, Long, Option[Double], Option[Double])].collect().head

  test("matches the hand-computed F on a textbook case") {
    // groups: {1,2,3}, {4,5,6}: SSB = 13.5, SSW = 4, F = (13.5/1)/(4/4) = 13.5
    val (k, n, f, eta2) = anova(Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 4L), ("b", 5L), ("b", 6L)))
    assert(k === 2L && n === 6L)
    assert(math.abs(f.get - 13.5) < 1e-9)
    assert(math.abs(eta2.get - 13.5 / 17.5) < 1e-9)
  }

  test("identical group means give F = 0; zero within-variance gives null F") {
    val (_, _, f0, eta0) = anova(Seq(("a", 1L), ("a", 3L), ("b", 1L), ("b", 3L)))
    assert(math.abs(f0.get) < 1e-9 && math.abs(eta0.get) < 1e-9)
    val (_, _, fc, _) = anova(Seq(("a", 2L), ("a", 2L), ("b", 5L), ("b", 5L)))
    assert(fc.isEmpty) // ssw = 0: the guard refuses the infinite F
  }

  test("nulls dropped; partitioning-invariant (integer moments)") {
    val withNulls = Seq((Some("a"), Some(1L)), (None, Some(9L)), (Some("a"), None),
      (Some("a"), Some(3L)), (Some("b"), Some(4L)), (Some("b"), Some(8L)))
      .toDF("g", "v")
    val r = Distribution.anovaF(withNulls, "g", "v")
      .as[(Long, Long, Option[Double], Option[Double])].collect().head
    assert(r._1 === 2L && r._2 === 4L)
    val rows = (1 to 300).map(i => (s"g${i % 5}", (i * 37 % 101).toLong))
    // the k-term ratio sum re-associates across partitionings (documented);
    // compare at a grain far above the ~1e-13 noise, like callers' qround
    def run(parts: Int) = {
      val r2 = Distribution.anovaF(rows.toDF("g", "v").repartition(parts), "g", "v")
        .as[(Long, Long, Option[Double], Option[Double])].collect().head
      (r2._1, r2._2, r2._3.map(f => math.round(f * 1e9)), r2._4.map(f => math.round(f * 1e9)))
    }
    assert(run(1) === run(13))
  }

  // ---- jsDivergence ----

  test("JS: identical distributions → 0; disjoint supports → ln 2; symmetric") {
    val same = Seq(("x", true), ("x", false), ("y", true), ("y", false))
      .toDF("c", "a")
    val r0 = Distribution.jsDivergence(same, "c", col("a")).collect().head
    assert(math.abs(r0.getDouble(3)) < 1e-15 && math.abs(r0.getDouble(4)) < 1e-15)
    // disjoint: A only sees x, B only y → JS = ln 2, normalized 1
    val disj = Seq(("x", true), ("x", true), ("y", false)).toDF("c", "a")
    val r1 = Distribution.jsDivergence(disj, "c", col("a")).collect().head
    assert(math.abs(r1.getDouble(3) - math.log(2.0)) < 1e-12)
    assert(math.abs(r1.getDouble(4) - 1.0) < 1e-12)
    // symmetry: swapping the sample labels leaves js unchanged
    val mixed = Seq(("x", true), ("x", true), ("y", true), ("x", false),
      ("y", false), ("y", false)).toDF("c", "a")
    val f = Distribution.jsDivergence(mixed, "c", col("a")).collect().head.getDouble(3)
    val b = Distribution.jsDivergence(mixed, "c", !col("a")).collect().head.getDouble(3)
    assert(math.abs(f - b) < 1e-15 && f > 0)
  }

  test("JS matches the hand formula on a 2-category split") {
    // A: 3x 1y (p = .75/.25); B: 1x 3y (q = .25/.75); m = .5/.5
    val df = (Seq.fill(3)(("x", true)) ++ Seq(("y", true)) ++
      Seq(("x", false)) ++ Seq.fill(3)(("y", false))).toDF("c", "a")
    val r = Distribution.jsDivergence(df, "c", col("a")).collect().head
    val expect = 0.75 / 2 * math.log(0.75 / 0.5) + 0.25 / 2 * math.log(0.25 / 0.5) +
      0.25 / 2 * math.log(0.25 / 0.5) + 0.75 / 2 * math.log(0.75 / 0.5)
    assert(r.getLong(0) === 4L && r.getLong(1) === 4L && r.getLong(2) === 2L)
    assert(math.abs(r.getDouble(3) - expect) < 1e-12)
  }
}

class BhFdrSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def bh(ps: Seq[Double], alpha: Double)
      : Seq[(String, Long, Double, Boolean)] =
    Distribution.bhAdjust(
        ps.zipWithIndex.map { case (p, i) => (f"t$i%02d", p) }.toDF("test", "p"),
        "test", "p", alpha)
      .orderBy("rank")
      .select(col("test"), col("rank"), col("p_adj"), col("rejected"))
      .as[(String, Long, Double, Boolean)].collect().toSeq

  test("Benjamini-Hochberg 1995 worked example rejects exactly 4 of 15") {
    val ps = Seq(0.0001, 0.0004, 0.0019, 0.0095, 0.0201, 0.0278, 0.0298,
      0.0344, 0.0459, 0.3240, 0.4262, 0.5719, 0.6528, 0.7590, 1.0)
    val out = bh(ps, 0.05)
    assert(out.count(_._4) === 4)
    assert(out.take(4).forall(_._4))
    // adjusted p of rank 1 = min over j of p_j*15/j
    val expAdj1 = ps.zipWithIndex.map { case (p, i) => p * 15 / (i + 1) }.min
    assert(math.abs(out.head._3 - expAdj1) < 1e-15)
  }

  test("step-up property: a passing later rank rescues earlier failures") {
    // p1 = 0.02 > 1*.05/3 fails alone, but rank 3 passes, so ALL reject
    val out = bh(Seq(0.02, 0.03, 0.04), 0.05)
    assert(out.forall(_._4))
  }

  test("no rank passes: nothing rejected; tail min caps adjusted p at p_max") {
    val out = bh(Seq(0.5, 0.8, 0.9), 0.05)
    assert(out.forall(!_._4))
    // every tail min contains p_m·m/m = p_m, so adj = min(1.5, 1.2, .9) = .9
    assert(out.map(_._3) === Seq(0.9, 0.9, 0.9))
  }

  test("adjusted p is the running min from the right, monotone in rank") {
    val out = bh(Seq(0.001, 0.90, 0.10, 0.04, 0.30), 0.1)
    val adj = out.map(_._3)
    assert(adj === adj.sorted)
    // rank 2 (p=.04): min(.04*5/2, .10*5/3, .30*5/4, .90*5/5) = 0.1
    assert(math.abs(adj(1) - 0.1) < 1e-15)
  }

  test("proportionZByGroup: hand z and logistic p, degenerate tests null") {
    val rows =
      Seq.fill(40)(("t1", true, true)) ++ Seq.fill(60)(("t1", true, false)) ++
      Seq.fill(20)(("t1", false, true)) ++ Seq.fill(80)(("t1", false, false)) ++
      Seq.fill(10)(("t2", true, true)) ++ Seq.fill(10)(("t2", false, true))
    val out = Distribution.proportionZByGroup(rows.toDF("t", "arm", "y"),
        "t", col("arm"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    val r1 = out("t1")
    val pooled = 60.0 / 200
    val z = (0.4 - 0.2) / math.sqrt(pooled * (1 - pooled) * (1 / 100.0 + 1 / 100.0))
    assert(math.abs(r1.getDouble(5) - z) < 1e-12)
    val p = math.floor(2.0 / (1 + math.exp(1.702 * z)) * 1e9 + 0.5) / 1e9
    assert(r1.getDouble(6) === p)
    // t2: pooled rate 1 -> no variance -> null z and p
    assert(out("t2").isNullAt(5) && out("t2").isNullAt(6))
  }

  test("infoGain: perfect feature captures H(Y); constant feature gains 0") {
    import org.apache.spark.sql.functions._
    // y balanced binary -> H(Y) = ln 2; 'same' mirrors y exactly;
    // 'const' is uninformative (and has H(X) = 0 -> null gain ratio)
    val df = (1 to 100).map { i =>
      val y = i % 2
      (s"v$y", "k", y)
    }.toDF("same", "const", "y")
    val got = Distribution.infoGain(df,
        Seq("same" -> col("same"), "const" -> col("const")), col("y") === 1)
      .collect().map(r => r.getString(0) -> r).toMap
    val ln2 = math.log(2.0)
    val same = got("same")
    assert(same.getLong(1) === 100L)
    assert(math.abs(same.getDouble(2) - ln2) < 1e-12)      // h_y
    assert(math.abs(same.getDouble(4) - 0.0) < 1e-12)      // h_y_given_x
    assert(math.abs(same.getDouble(5) - ln2) < 1e-12)      // info_gain
    assert(math.abs(same.getDouble(6) - 1.0) < 1e-12)      // gain_ratio
    val const = got("const")
    assert(math.abs(const.getDouble(5) - 0.0) < 1e-12)
    assert(const.isNullAt(6)) // H(X) = 0 -> ratio undefined
  }

  test("infoGain: listwise exclusion shares one n and one H(Y)") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (Some("a"), Some("x"), Some(1)), (Some("b"), Some("x"), Some(0)),
      (None, Some("x"), Some(1)), (Some("a"), None, Some(0)),
      (Some("b"), Some("y"), None)).toDF("f1", "f2", "y")
    val got = Distribution.infoGain(df,
        Seq("f1" -> col("f1"), "f2" -> col("f2")), col("y") === 1)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got("f1")._1 === 2L && got("f2")._1 === 2L)
    assert(got("f1")._2 === got("f2")._2) // shared H(Y)
  }

  test("cochranArmitage: hand example, sign, and degenerate NULLs") {
    import org.apache.spark.sql.functions._
    // rising rates over scores 0/1/2: n_i = 10 each, r_i = 1, 5, 9
    val rows = (for {
      (s, r) <- Seq((0L, 1), (1L, 5), (2L, 9))
      i <- 1 to 10
    } yield ("t", s, i <= r)).toDF("g", "s", "y")
    val out = Distribution.cochranArmitage(rows, "g", col("s"), col("y"))
      .collect().head
    assert(out.getLong(1) === 30L && out.getLong(2) === 15L)
    // hand: pbar=.5, ssr=23, ssn=30, ss2n=50 -> T=8, Var=.25*(50-30)=5
    val z = out.getDouble(3)
    assert(math.abs(z - 8.0 / math.sqrt(5.0)) < 1e-12)
    // reversed scores flip the sign exactly
    val rev = Distribution.cochranArmitage(rows, "g", lit(2L) - col("s"),
      col("y")).collect().head.getDouble(3)
    assert(java.lang.Double.doubleToLongBits(rev) ===
      java.lang.Double.doubleToLongBits(-z))
    // constant outcome and constant score both give NULL z
    val cy = Seq(("t", 0L, true), ("t", 1L, true)).toDF("g", "s", "y")
    assert(Distribution.cochranArmitage(cy, "g", col("s"), col("y"))
      .collect().head.isNullAt(3))
    val cs = Seq(("t", 1L, true), ("t", 1L, false)).toDF("g", "s", "y")
    assert(Distribution.cochranArmitage(cs, "g", col("s"), col("y"))
      .collect().head.isNullAt(3))
  }

  test("cochranArmitage beats chi-square's dilution on a clean monotone trend") {
    import org.apache.spark.sql.functions._
    // monotone trend across 8 ordered scores: rate 30% -> 72%
    val rows = (for {
      s <- 0L to 7L
      i <- 1 to 50
    } yield ("t", s, i <= 15 + 3 * s)).toDF("g", "s", "y")
    val z = Distribution.cochranArmitage(rows, "g", col("s"), col("y"))
      .collect().head.getDouble(3)
    assert(z > 2.0, s"clean trend must ring loudly, z = $z")
    def bits(p: Int) = Distribution
      .cochranArmitage(rows.repartition(p), "g", col("s"), col("y"))
      .collect().map(_.toSeq.map {
        case d: Double => java.lang.Double.doubleToLongBits(d)
        case v => v
      }).toSeq
    assert(bits(1) === bits(7))
  }

  test("mdeAudit: hand formula, 1/sqrt(n) scaling, degenerate NULLs") {
    import org.apache.spark.sql.functions.col
    // 100 per arm, pooled rate 0.2
    val rows = (1 to 200).map(i => ("t", i % 2 == 0, i <= 40))
      .toDF("g", "a", "y")
    val r = Distribution.mdeAudit(rows, "g", col("a"), col("y"))
      .collect().head
    assert(r.getLong(1) === 100L && r.getLong(2) === 100L)
    assert(r.getDouble(3) === 0.2)
    val expect = (1.959963984540054 + 0.8416212335729143) *
      math.sqrt(0.2 * 0.8 * (1.0 / 100 + 1.0 / 100))
    assert(math.abs(r.getDouble(4) - expect) < 1e-12)
    assert(math.abs(r.getDouble(5) - expect / 0.2) < 1e-12)
    // 4x the data halves the MDE
    val big = (1 to 800).map(i => ("t", i % 2 == 0, i <= 160))
      .toDF("g", "a", "y")
    val rb = Distribution.mdeAudit(big, "g", col("a"), col("y"))
      .collect().head
    assert(math.abs(rb.getDouble(4) - expect / 2) < 1e-12)
    // all-negative outcome: nothing to detect against -> NULL
    val dead = (1 to 50).map(i => ("t", i % 2 == 0, false)).toDF("g", "a", "y")
    val rd = Distribution.mdeAudit(dead, "g", col("a"), col("y"))
      .collect().head
    assert(rd.isNullAt(4) && rd.isNullAt(5))
  }

  test("byAdjust: harmonic factor, adjusted p, and BH-vs-BY divergence") {
    val pv = Seq(("t1", 0.001), ("t2", 0.01), ("t3", 0.05), ("t4", 0.8))
      .toDF("test", "p")
    val by = Distribution.byAdjust(pv, "test", "p", alpha = 0.1)
      .select(col("test"), col("rank"), col("cm"), col("p_adj"), col("rejected"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))).toMap
    // grid-exact harmonic: (1e12 + 5e11 + 333333333333 + 25e10)/1e12
    val cm = (1000000000000L + 500000000000L + 333333333333L +
      250000000000L).toDouble / 1e12
    assert(by.values.forall(v => math.abs(v._2 - cm) < 1e-15))
    // p_adj(1) = min_j p_j·m·cm/j = 0.001·4·cm
    assert(math.abs(by("t1")._3 - 0.001 * (4 * cm)) < 1e-12)
    // BY rejects {t1, t2} while BH at the same alpha also takes t3
    assert(by("t1")._4 && by("t2")._4 && !by("t3")._4 && !by("t4")._4)
    val bh = Distribution.bhAdjust(pv, "test", "p", alpha = 0.1)
      .select(col("test"), col("rejected"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(bh("t3"), "BH must reject t3 where BY's harmonic bar holds it")
  }

  test("wilsonCI: hand interval, boundary rates stay inside [0, 1]") {
    // n = 10, pos = 3, z = 1.96 → (0.10779, 0.60323)
    val rows = (1 to 10).map(i => ("g", i <= 3)).toDF("g", "y")
    val r = Distribution.wilsonCI(rows, "g", col("y"), z = 1.96)
      .collect().head
    assert(r.getLong(1) === 10L && r.getLong(2) === 3L)
    assert(math.abs(r.getDouble(3) - 0.3) < 1e-12)
    assert(math.abs(r.getDouble(4) - 0.10778928748621183) < 1e-12)
    assert(math.abs(r.getDouble(5) - 0.6032267800204347) < 1e-12)
    // 0-for-n and n-for-n: Wald collapses to zero width, Wilson must not
    val edge = ((1 to 5).map(_ => ("lo", false)) ++
      (1 to 5).map(_ => ("hi", true))).toDF("g", "y")
    val e = Distribution.wilsonCI(edge, "g", col("y"), 1.96)
      .collect().map(x => x.getString(0) -> ((x.getDouble(4), x.getDouble(5))))
      .toMap
    // the closed form lands an ulp off exact 0/1 at the edges; qround
    // at the query layer snaps it — assert the IEEE-tolerance contract
    assert(math.abs(e("lo")._1) < 1e-12 && e("lo")._2 > 0.3 && e("lo")._2 < 0.6)
    assert(math.abs(e("hi")._2 - 1.0) < 1e-12 &&
      e("hi")._1 > 0.4 && e("hi")._1 < 0.7)
  }

  test("orWoolfCI: hand interval, zero cell NULLs the inference") {
    // a=10 b=5 c=4 d=20: OR = 10, half = 1.96·√0.6
    val rows = (Seq.fill(10)((true, true)) ++ Seq.fill(5)((true, false)) ++
      Seq.fill(4)((false, true)) ++ Seq.fill(20)((false, false)))
      .map { case (e, y) => ("s", e, y) }.toDF("s", "e", "y")
    val r = Distribution.orWoolfCI(rows, "s", col("e"), col("y"), 1.96)
      .collect().head
    assert((1 to 4).map(r.getLong) === Seq(10L, 5L, 4L, 20L))
    val half = 1.96 * math.sqrt(1.0 / 10 + 1.0 / 5 + 1.0 / 4 + 1.0 / 20)
    assert(math.abs(r.getDouble(5) - 10.0) < 1e-9)
    assert(math.abs(r.getDouble(6) - math.exp(math.log(10.0) - half)) < 1e-9)
    assert(math.abs(r.getDouble(7) - math.exp(math.log(10.0) + half)) < 1e-9)
    val zero = (Seq.fill(3)((true, true)) ++ Seq.fill(4)((false, true)) ++
      Seq.fill(5)((false, false)))
      .map { case (e, y) => ("s", e, y) }.toDF("s", "e", "y")
    val rz = Distribution.orWoolfCI(zero, "s", col("e"), col("y"), 1.96)
      .collect().head
    assert(rz.isNullAt(5) && rz.isNullAt(6) && rz.isNullAt(7))
  }

  test("groupEntropy: uniform mix J=1, monoculture H=0, hand mix") {
    val rows = (Seq.fill(4)(("a", "x")) ++
      Seq(("b", "x"), ("b", "y")) ++
      (Seq.fill(3)(("c", "x")) :+ ("c", "y"))).toDF("g", "cat")
    val out = Distribution.groupEntropy(rows, "g", "cat")
      .collect().map(r => r.getString(0) -> r).toMap
    // a: one category → H = 0, evenness vacuous (NULL)
    assert(out("a").getLong(2) === 1L && out("a").getDouble(3) === 0.0)
    assert(out("a").isNullAt(4))
    // b: perfect 50/50 → H = ln 2, J = 1
    assert(math.abs(out("b").getDouble(3) - math.log(2.0)) < 1e-9)
    assert(math.abs(out("b").getDouble(4) - 1.0) < 1e-9)
    // c: 3/1 split → H = −.75 ln .75 − .25 ln .25
    val hc = -0.75 * math.log(0.75) - 0.25 * math.log(0.25)
    assert(math.abs(out("c").getDouble(3) - hc) < 1e-9)
    assert(out("c").getDouble(4) < 1.0)
  }

  test("hellingerDrift: identical segments ~0, disjoint segments large, bounded") {
    // A and B share one distribution → H near 0 (smoothing keeps it >0)
    val same = ((1 to 50).map(i => ("A", (i % 10).toLong)) ++
      (1 to 50).map(i => ("B", (i % 10).toLong))).toDF("s", "v")
    val hSame = Distribution.hellingerDrift(same, "s", "v", Seq(5.0))
      .collect().map(_.getDouble(3))
    assert(hSame.forall(h => h >= 0 && h < 0.02), hSame.mkString(","))
    // disjoint mass across the boundary → both segments drift hard
    val disj = ((1 to 50).map(i => ("A", (i % 4).toLong)) ++
      (1 to 50).map(i => ("B", 6L + i % 4))).toDF("s", "v")
    val hD = Distribution.hellingerDrift(disj, "s", "v", Seq(5.0))
      .collect().map(_.getDouble(3))
    assert(hD.forall(h => h > 0.3 && h <= 1.0), hD.mkString(","))
  }

  test("stratifiedAssociation: Simpson reversal detected, MH OR pooled") {
    // both strata favor exposure (+0.1 rd each) while the pooled rd is
    // negative — the textbook paradox shape
    val s1 = (1 to 10).map(i => ("s1", true, i <= 9)) ++
      (1 to 100).map(i => ("s1", false, i <= 80))
    val s2 = (1 to 100).map(i => ("s2", true, i <= 20)) ++
      (1 to 10).map(i => ("s2", false, i <= 1))
    val rows = (s1 ++ s2).toDF("s", "e", "y")
    val out = Distribution.stratifiedAssociation(rows, "s", col("e"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    val r1 = out("s1"); val r2 = out("s2")
    assert(math.abs(r1.getDouble(6) - 0.1) < 1e-12)
    assert(math.abs(r2.getDouble(6) - 0.1) < 1e-12)
    assert(r1.getBoolean(8) && r2.getBoolean(8), "both strata reversed")
    assert(r1.getDouble(9) < 0, "pooled rd negative")
    // MH OR: s1 ad/n = 180/110? no — s1: a=9 b=1 c=80 d=20 → 9·20/110;
    // s2: a=20 b=80 c=1 d=9 → 20·9/110; den: 80/110 each → OR = 2.25
    assert(math.abs(r1.getDouble(10) - 2.25) < 1e-6)
  }

  test("cvmDrift + wassersteinDrift: hand ECDF gaps on the shared grid") {
    import spark.implicits._
    // A = {0, 2}, B = {2}; global = {0, 2, 2}
    // A: gap at v=0 is 1/2 − 1/3 = 1/6 (gn=1), 0 at v=2
    //    → cvm = (1/36)/3; w1 = (1/6)·(2−0) = 1/3
    // B: gap at v=0 is 0 − 1/3 → cvm = (1/9)/3; w1 = (1/3)·2 = 2/3
    val rows = Seq(("A", 0L), ("A", 2L), ("B", 2L)).toDF("seg", "v")
    val cvm = Distribution.cvmDrift(rows, "seg", "v").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(cvm("A") - 1.0 / 108) < 1e-6)
    assert(math.abs(cvm("B") - 1.0 / 27) < 1e-6)
    val w1 = Distribution.wassersteinDrift(rows, "seg", "v").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(w1("A") - 1.0 / 3) < 1e-6)
    assert(math.abs(w1("B") - 2.0 / 3) < 1e-6)
    // identical segment ⇒ both distances 0 (self vs corpus of itself)
    val same = Seq(("X", 1L), ("X", 5L)).toDF("seg", "v")
    assert(Distribution.cvmDrift(same, "seg", "v").collect().head.getDouble(2) === 0.0)
    assert(Distribution.wassersteinDrift(same, "seg", "v").collect().head.getDouble(2) === 0.0)
  }
}

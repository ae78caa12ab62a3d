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

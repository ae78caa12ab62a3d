package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RankTestsSpec extends SparkSpec {
  import spark.implicits._

  private def mw(rows: Seq[(String, Boolean, Long)])
      : Map[String, (Long, Long, Option[Double], Option[Double])] =
    RankTests.mannWhitney(rows.toDF("g", "a", "v"), "g", col("a"), "v")
      .collect().map { r =>
        r.getString(0) -> ((r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Double])))
      }.toMap

  test("textbook no-tie example") {
    // A = {1,2,3}, B = {4,5,6}: R1 = 6, U1 = 0, cles = 0,
    // z = -4.5 / sqrt(9*7/12)
    val (n1, n2, cles, z) = mw(Seq(("g", true, 1L), ("g", true, 2L),
      ("g", true, 3L), ("g", false, 4L), ("g", false, 5L),
      ("g", false, 6L)))("g")
    assert(n1 === 3L && n2 === 3L)
    assert(cles === Some(0.0))
    assert(math.abs(z.get - (-4.5 / math.sqrt(5.25))) < 1e-12)
  }

  test("midrank ties and the tie-corrected variance") {
    // A = {1,2,2}, B = {2,3}: pooled ranks of the 2s midrank to 3 each,
    // R1 = 1+3+3 = 7, U1 = 1, tie term t=3 -> 24,
    // var = 6/12 * (6 - 24/20) = 2.4
    val (n1, n2, cles, z) = mw(Seq(("g", true, 1L), ("g", true, 2L),
      ("g", true, 2L), ("g", false, 2L), ("g", false, 3L)))("g")
    assert(n1 === 3L && n2 === 2L)
    assert(math.abs(cles.get - 1.0 / 6) < 1e-15)
    assert(math.abs(z.get - (1.0 - 3.0) / math.sqrt(2.4)) < 1e-12)
  }

  test("cles matches the pair-counting definition on a random workload") {
    val rng = new scala.util.Random(7)
    val rows = (1 to 400).map(i =>
      ("g", i % 3 != 0, (rng.nextInt(40) + (if (i % 3 != 0) 3 else 0)).toLong))
    val (n1, n2, cles, z) = mw(rows)("g")
    val as = rows.filter(_._2).map(_._3)
    val bs = rows.filterNot(_._2).map(_._3)
    assert(n1 === as.size.toLong && n2 === bs.size.toLong)
    // U1 = #(a>b) + 0.5*#(a=b), doubled to stay integral
    val u2 = as.iterator.map(a =>
      2L * bs.count(a > _) + bs.count(a == _)).sum
    assert(math.abs(cles.get - u2.toDouble / (2.0 * n1 * n2)) < 1e-12)
    assert(z.get > 0, "A was shifted up; z must be positive")
  }

  test("degenerate cases: empty arm and all-tied pool") {
    val m = mw(Seq(("e", true, 1L), ("e", true, 2L),
      ("t", true, 5L), ("t", false, 5L), ("t", false, 5L)))
    assert(m("e") === ((2L, 0L, None, None)))
    val (_, _, cles, z) = m("t")
    assert(cles === Some(0.5) && z === None, "all-tied pool has sigma=0")
  }

  test("mann-whitney is bit-deterministic under repartitioning") {
    val rng = new scala.util.Random(11)
    val rows = (1 to 500).map(i => (s"g${i % 2}", rng.nextBoolean(), rng.nextInt(30).toLong))
    def bits(p: Int) = RankTests
      .mannWhitney(rows.toDF("g", "a", "v").repartition(p), "g", col("a"), "v")
      .collect().map(_.toSeq.map {
        case d: Double => java.lang.Double.doubleToLongBits(d)
        case v => v
      }).sortBy(_.mkString("|")).toSeq
    assert(bits(1) === bits(7))
  }

  private def bf(rows: Seq[(String, Long)]): (Long, Long, Option[Double]) = {
    val r = RankTests.brownForsythe(rows.toDF("g", "v"), "g", "v").collect()(0)
    (r.getLong(0), r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))
  }

  test("brown-forsythe hand example (spread differs, means agree)") {
    // g1 = {1,5,9}: med 5, z = {4,0,4}; g2 = {4,5,6}: med 5, z = {1,0,1}
    // ssb = 6, ssw = 34/3, F = 6 / ((34/3)/4)
    val (k, n, f) = bf(Seq(("g1", 1L), ("g1", 5L), ("g1", 9L),
      ("g2", 4L), ("g2", 5L), ("g2", 6L)))
    assert(k === 2L && n === 6L)
    assert(math.abs(f.get - 6.0 / ((34.0 / 3) / 4)) < 1e-12)
  }

  test("even group sizes center on the LOWER median") {
    // g1 = {1,2,3,4}: lower med 2, z = {1,0,1,2}
    // g2 = {10,20,30,40}: lower med 20, z = {10,0,10,20}
    val (k, n, f) = bf(Seq(("g1", 1L), ("g1", 2L), ("g1", 3L), ("g1", 4L),
      ("g2", 10L), ("g2", 20L), ("g2", 30L), ("g2", 40L)))
    assert(k === 2L && n === 8L)
    val (s1, q1) = (4.0, 6.0)   // sums of z, z^2 in g1
    val (s2, q2) = (40.0, 600.0)
    val ratio = s1 * s1 / 4 + s2 * s2 / 4
    val ssb = ratio - (s1 + s2) * (s1 + s2) / 8
    val ssw = q1 + q2 - ratio
    assert(math.abs(f.get - (ssb / 1) / (ssw / 6)) < 1e-12)
  }

  test("identical spreads give F ~ 0; constant groups give NULL F") {
    val (_, _, f0) = bf(Seq(("a", 1L), ("a", 3L), ("b", 11L), ("b", 13L)))
    assert(math.abs(f0.get) < 1e-12, "same |dev| everywhere -> ssb = 0")
    val (_, _, fc) = bf(Seq(("a", 5L), ("a", 5L), ("b", 7L), ("b", 7L)))
    assert(fc === None, "all deviations 0 -> ssw = 0 -> NULL")
  }

  private def ad(rows: Seq[(String, Long)]): (Long, Long, Option[Double], Option[Double]) = {
    val r = RankTests.andersonDarlingK(rows.toDF("s", "v"), "s", "v")
      .collect().head
    (r.getLong(0), r.getLong(1),
      Option(r.get(2)).map(_.asInstanceOf[Double]),
      Option(r.get(3)).map(_.asInstanceOf[Double]))
  }

  test("anderson-darling matches the exact-fraction Scholz-Stephens value") {
    // independently computed with exact rational arithmetic from the
    // A2akN formula: samples {1,2,2,5,7}, {2,3,5,5,9}, {1,4,4,6}
    val rows = Seq("a" -> 1L, "a" -> 2L, "a" -> 2L, "a" -> 5L, "a" -> 7L,
      "b" -> 2L, "b" -> 3L, "b" -> 5L, "b" -> 5L, "b" -> 9L,
      "c" -> 1L, "c" -> 4L, "c" -> 4L, "c" -> 6L)
    val (k, n, a2, a2n) = ad(rows)
    assert(k === 3L && n === 14L)
    assert(math.abs(a2.get - 0.9538907926363916) < 1e-9)
    assert(math.abs(a2n.get - 0.9538907926363916 / 2) < 1e-9)
  }

  test("anderson-darling: identical samples score low, shifted tails ring") {
    val rng = new scala.util.Random(61)
    val same = (1 to 600).map(i => (s"g${i % 3}", rng.nextInt(50).toLong))
    val (_, _, sameA2, sameNorm) = ad(same)
    // under H0, E[A2] = k-1: the normalized value sits near 1
    assert(sameNorm.get < 3.0, s"null case should be small: ${sameNorm.get}")
    val shifted = same.map { case (g, v) =>
      (g, if (g == "g0" && v > 40) v + 60 else v) // tail-only drift
    }
    val (_, _, driftA2, _) = ad(shifted)
    assert(driftA2.get > sameA2.get * 2,
      s"tail drift must ring: ${sameA2.get} -> ${driftA2.get}")
    // degenerate: one distinct value -> NULL
    val (_, _, one, _) = ad(Seq("a" -> 5L, "b" -> 5L, "a" -> 5L))
    assert(one === None)
  }

  test("anderson-darling is bit-deterministic under repartitioning") {
    val rng = new scala.util.Random(67)
    val rows = (1 to 400).map(i => (s"g${i % 4}", rng.nextInt(30).toLong))
    def bits(p: Int) = RankTests
      .andersonDarlingK(rows.toDF("s", "v").repartition(p), "s", "v")
      .collect().map(_.toSeq.map {
        case d: Double => java.lang.Double.doubleToLongBits(d)
        case v => v
      }).toSeq
    assert(bits(1) === bits(7))
  }

  test("kruskalWallis: textbook no-tie case, tie correction, degenerate NULL") {
    // A = {1,2}, B = {3,4}: ranks 1..4, R_A = 3, R_B = 7,
    // H = 12/(4·5)·(9/2 + 49/2) − 3·5 = 2.4; no ties ⇒ h_adj = h
    val rows = Seq(("A", 1L), ("A", 2L), ("B", 3L), ("B", 4L))
      .toDF("g", "v")
    val r = RankTests.kruskalWallis(rows, "g", "v").collect().head
    assert(r.getLong(0) === 2L && r.getLong(1) === 4L)
    assert(math.abs(r.getDouble(2) - 2.4) < 1e-9)
    assert(math.abs(r.getDouble(3) - 2.4) < 1e-9)
    // with ties the correction must raise H: {1,1,2} vs {2,3,3}
    val tied = Seq(("A", 1L), ("A", 1L), ("A", 2L),
      ("B", 2L), ("B", 3L), ("B", 3L)).toDF("g", "v")
    val t = RankTests.kruskalWallis(tied, "g", "v").collect().head
    assert(t.getDouble(3) > t.getDouble(2), "tie correction inflates H")
    // all values equal: correction 0 ⇒ NULL h_adj
    val const = Seq(("A", 5L), ("B", 5L), ("C", 5L)).toDF("g", "v")
    assert(RankTests.kruskalWallis(const, "g", "v").collect().head.isNullAt(3))
    // determinism under repartitioning
    val rng = new scala.util.Random(7)
    val big = (1 to 500).map(i =>
      (s"g${i % 4}", rng.nextInt(40).toLong)).toDF("g", "v")
    def bits(p: Int) = RankTests.kruskalWallis(big.repartition(p), "g", "v")
      .collect().map(_.toSeq.map {
        case d: Double => java.lang.Double.doubleToLongBits(d)
        case v => v
      }).toSeq
    assert(bits(1) === bits(9))
  }

  test("friedman: textbook complete-block example, incomplete blocks dropped") {
    // 3 treatments × 4 blocks, no ties; classic hand computation:
    // within-block ranks (1,2,3): T1 always last (rank 1), T3 always
    // first (rank 3) → R1=4, R2=8, R3=12; Q = 12/(4·3·4)·Σ(Rj−8)² = 8
    val rows = Seq(
      (1L, "t1", 1L), (1L, "t2", 5L), (1L, "t3", 9L),
      (2L, "t1", 2L), (2L, "t2", 6L), (2L, "t3", 8L),
      (3L, "t1", 3L), (3L, "t2", 4L), (3L, "t3", 7L),
      (4L, "t1", 1L), (4L, "t2", 2L), (4L, "t3", 3L),
      // block 5 misses t3 — must be dropped and counted
      (5L, "t1", 9L), (5L, "t2", 1L))
      .toDF("b", "j", "v")
    val r = RankTests.friedman(rows, "b", "j", "v").collect().head
    assert(r.getLong(0) === 3L && r.getLong(1) === 4L && r.getLong(2) === 1L)
    assert(math.abs(r.getDouble(3) - 8.0) < 1e-12)
    assert(math.abs(r.getDouble(4) - 8.0) < 1e-12) // no ties → q_adj = q
  }

  test("friedman: within-block ties use midranks and the tie correction") {
    // 2 blocks × 3 treatments, block 1 fully tied, block 2 strict:
    // block1 doubled midranks all 4 (2r̄=4); block2 ranks 1,2,3.
    // R2_j (doubled): t1=4+2=6, t2=4+4=8, t3=4+6=10; b(k+1)=8 → SS=8
    // Q = 3·8/(2·3·4) = 1; ties: block1 t=3 → tt = 24; corr = 1−24/48=.5
    val rows = Seq(
      (1L, "t1", 5L), (1L, "t2", 5L), (1L, "t3", 5L),
      (2L, "t1", 1L), (2L, "t2", 2L), (2L, "t3", 3L)).toDF("b", "j", "v")
    val r = RankTests.friedman(rows, "b", "j", "v").collect().head
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(4) - 2.0) < 1e-12)
    // everything tied everywhere → correction 0 → NULL q_adj
    val flat = Seq((1L, "t1", 5L), (1L, "t2", 5L), (2L, "t1", 7L),
      (2L, "t2", 7L)).toDF("b", "j", "v")
    val fr = RankTests.friedman(flat, "b", "j", "v").collect().head
    assert(fr.getDouble(3) === 0.0 && fr.isNullAt(4))
  }

  test("pageTrend: perfect ordered trend hits max L; reversed trend mirrors z") {
    // 3 blocks × 3 ordered treatments, values rise with the order in
    // every block: L = b·Σ j² = 42 (the max), μ = 36, σ = √6, z = √6
    val up = for (b <- 1L to 3L; j <- 1L to 3L) yield (b, j, 10 * j + b)
    val r = RankTests.pageTrend(up.toDF("b", "j", "v"), "b", "j", "v")
      .collect().head
    assert(r.getLong(0) === 3L && r.getLong(1) === 3L && r.getLong(2) === 0L)
    assert(math.abs(r.getDouble(3) - 42.0) < 1e-12)
    assert(math.abs(r.getDouble(4) - math.sqrt(6.0)) < 1e-12)
    // reversed order: L = b·Σ j·(k+1−j) = 3·10 = 30, z = −√6
    val down = for (b <- 1L to 3L; j <- 1L to 3L) yield (b, j, -10 * j + b * 100)
    val d = RankTests.pageTrend(down.toDF("b", "j", "v"), "b", "j", "v")
      .collect().head
    assert(math.abs(d.getDouble(3) - 30.0) < 1e-12)
    assert(math.abs(d.getDouble(4) + math.sqrt(6.0)) < 1e-12)
    // all-tied blocks: σ > 0 but ranks all equal → L = μ → z = 0
    val flat = for (b <- 1L to 2L; j <- 1L to 3L) yield (b, j, 7L)
    val f = RankTests.pageTrend(flat.toDF("b", "j", "v"), "b", "j", "v")
      .collect().head
    assert(math.abs(f.getDouble(4)) < 1e-12)
  }

  test("jonckheereTerpstra: no-tie and tied hand examples, variance exact") {
    // groups 1:{1,2}, 2:{3,4}: every cross pair ascends → J = 4;
    // E = (16−8)/4 = 2; var = 120/72 = 5/3 (no ties, n_g−2 = 0 terms)
    val up = Seq((1L, 1L), (1L, 2L), (2L, 3L), (2L, 4L)).toDF("g", "v")
    val r = RankTests.jonckheereTerpstra(up, "g", "v").collect().head
    assert(r.getLong(0) === 2L && r.getLong(1) === 4L)
    assert(math.abs(r.getDouble(2) - 4.0) < 1e-12)
    assert(math.abs(r.getDouble(3) - 2.0 / math.sqrt(5.0 / 3)) < 1e-12)
    // ties split: 1:{1,1}, 2:{1,2} → J* = 0.5+0.5+1+1 = 3; full H&W
    // variance: term1 = 54/72, term2 = 0 (n_g = 2), term3 = 24/96 → 1.0
    // z = (3 − 2)/1 = 1
    val tied = Seq((1L, 1L), (1L, 1L), (2L, 1L), (2L, 2L)).toDF("g", "v")
    val t = RankTests.jonckheereTerpstra(tied, "g", "v").collect().head
    assert(math.abs(t.getDouble(2) - 3.0) < 1e-12)
    assert(math.abs(t.getDouble(3) - 1.0) < 1e-12)
    // single group: no pairs, no variance → NULL z
    val one = Seq((1L, 1L), (1L, 2L)).toDF("g", "v")
    val o = RankTests.jonckheereTerpstra(one, "g", "v").collect().head
    assert(o.getDouble(2) === 0.0 && o.isNullAt(3))
  }

  test("jonckheereTerpstra rejects sparse/huge order labels (taxonomy contract)") {
    // raw-timestamp-style labels span >> 1024: the x(k-1) donor fan-out
    // would explode by the label SPAN — the require must fire up front
    val sparse = Seq((1L, 1L), (1000000L, 2L)).toDF("g", "v")
    val ex = intercept[IllegalArgumentException] {
      RankTests.jonckheereTerpstra(sparse, "g", "v").collect()
    }
    assert(ex.getMessage.contains("small-taxonomy contract"))
  }

  test("cochranQ: textbook 3-treatment example and the degenerate denominator") {
    // 4 subjects × 3 binary treatments (Conover-style):
    // rows: s1=(1,1,0) s2=(1,0,0) s3=(1,1,1) s4=(0,0,0)
    // C = (3,2,1), N=6, ΣC²=14, ΣR²=4+1+9+0=14
    // Q = (k−1)(kΣC²−N²)/(kN−ΣR²) = 2·(42−36)/(18−14) = 3
    val rows = Seq(
      ("s1", "a", true), ("s1", "b", true), ("s1", "c", false),
      ("s2", "a", true), ("s2", "b", false), ("s2", "c", false),
      ("s3", "a", true), ("s3", "b", true), ("s3", "c", true),
      ("s4", "a", false), ("s4", "b", false), ("s4", "c", false))
      .toDF("i", "j", "y")
    val r = RankTests.cochranQ(rows, "i", "j", col("y")).collect().head
    assert(r.getLong(0) === 3L && r.getLong(1) === 4L && r.getLong(2) === 6L)
    assert(math.abs(r.getDouble(3) - 3.0) < 1e-12)
    // all-1 rows only: kN = ΣR² → NULL
    val allOne = Seq(("s1", "a", true), ("s1", "b", true),
      ("s2", "a", true), ("s2", "b", true)).toDF("i", "j", "y")
    val d = RankTests.cochranQ(allOne, "i", "j", col("y")).collect().head
    assert(d.isNullAt(3))
  }
}

class MannKendallSpec extends SparkSpec {
  import spark.implicits._

  test("monotone series: S = C(n,2), continuity-corrected z, exact Sen slope") {
    // x = 2t over t=1..6: every pair concordant → S = 15; slopes all 2.0
    val rows = (1L to 6L).map(t => ("g", t, 2 * t)).toDF("g", "t", "v")
    val r = graft.ops.Changepoint.mannKendall(rows, "g", "t", "v")
      .collect().head
    assert(r.getLong(1) === 6L && r.getLong(2) === 15L)
    // varS = 6·5·17/18 = 28.333…; z = 14/sqrt(varS)
    val z = 14.0 / math.sqrt(6.0 * 5 * 17 / 18.0)
    assert(math.abs(r.getDouble(3) - z) < 1e-9)
    assert(math.abs(r.getDouble(4) - 2.0) < 1e-9)
  }

  test("tie correction, zero-S series, and the lower-median Sen convention") {
    // constant series: S = 0, all values tied → varS = 0 → NULL z
    val flat = (1L to 5L).map(t => ("g", t, 7L)).toDF("g", "t", "v")
    val f = graft.ops.Changepoint.mannKendall(flat, "g", "t", "v")
      .collect().head
    assert(f.getLong(2) === 0L && f.isNullAt(3))
    assert(f.getDouble(4) === 0.0) // every pairwise slope is 0
    // v = (1, 1, 2): pairs (1,2):0 (1,3):+1 (2,3):+1 → S = 2
    // ties: one pair tied (t=2: 2·1·9=18); varS = (3·2·11 − 18)/18 = 8/3
    // slopes: 0, 0.5, 1 → lower median (m=3 → idx 2) = 0.5
    val t3 = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 2L)).toDF("g", "t", "v")
    val r = graft.ops.Changepoint.mannKendall(t3, "g", "t", "v")
      .collect().head
    assert(r.getLong(2) === 2L)
    assert(math.abs(r.getDouble(3) - 1.0 / math.sqrt(8.0 / 3)) < 1e-9)
    assert(math.abs(r.getDouble(4) - 0.5) < 1e-9)
  }
}

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
}

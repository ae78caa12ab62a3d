package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MlEvalSpec extends SparkSpec {
  import spark.implicits._

  // (group, score, label)
  private def auc(rows: Seq[(String, Double, Boolean)]): Map[String, Option[Double]] =
    MlEval.groupAuc(rows.toDF("g", "s", "y"), "g", "s", col("y"))
      .select($"g", $"auc").as[(String, Option[Double])].collect().toMap

  /** Brute-force AUC: fraction of (pos, neg) pairs ranked correctly,
    * ties counting half.
    */
  private def bruteAuc(rows: Seq[(Double, Boolean)]): Double = {
    val pos = rows.filter(_._2).map(_._1); val neg = rows.filterNot(_._2).map(_._1)
    val wins = for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0
    wins.sum / (pos.size * neg.size)
  }

  test("perfect, inverted, and random separation") {
    val r = auc(Seq(
      ("perfect", 1.0, false), ("perfect", 2.0, false), ("perfect", 3.0, true), ("perfect", 4.0, true),
      ("inverted", 4.0, false), ("inverted", 3.0, false), ("inverted", 1.0, true), ("inverted", 2.0, true),
      ("coin", 1.0, true), ("coin", 1.0, false)))
    assert(r("perfect") === Some(1.0))
    assert(r("inverted") === Some(0.0))
    assert(r("coin") === Some(0.5)) // all-tie: average rank gives exactly 1/2
  }

  test("matches brute-force pair counting with heavy ties") {
    val rows = (1 to 60).map(i =>
      (i % 5 / 1.0, (i * 7 % 13) < 6)) // 5 distinct scores, mixed labels
    val expect = bruteAuc(rows)
    val got = auc(rows.map { case (s, y) => ("g", s, y) })("g").get
    assert(math.abs(got - expect) < 1e-12, s"$got vs $expect")
  }

  test("single-class groups yield null AUC but real counts") {
    val out = MlEval.groupAuc(
      Seq(("allpos", 1.0, true), ("allpos", 2.0, true), ("ok", 1.0, true), ("ok", 2.0, false))
        .toDF("g", "s", "y"), "g", "s", col("y"))
      .as[(String, Option[Double], Long, Long)].collect()
      .map { case (g, a, p, n) => g -> ((a, p, n)) }.toMap
    assert(out("allpos") === ((None, 2L, 0L)))
    assert(out("ok")._1.isDefined)
  }

  test("AUC is partitioning-independent (order-free rank sums)") {
    val rows = (1 to 300).map(i => ("g", (i % 23).toDouble, i % 3 == 0))
    val a = MlEval.groupAuc(rows.toDF("g", "s", "y").repartition(1), "g", "s", col("y"))
      .select($"auc").as[Double].head()
    val b = MlEval.groupAuc(rows.toDF("g", "s", "y").repartition(17), "g", "s", col("y"))
      .select($"auc").as[Double].head()
    assert(a === b)
  }

  test("confusion stats: hand-computed counts and metrics") {
    val df = Seq(
      // (g, pred, label): tp=2 fp=1 tn=1 fn=1
      ("g", true, true), ("g", true, true), ("g", true, false),
      ("g", false, false), ("g", false, true)).toDF("g", "yh", "y")
    val r = MlEval.confusionStats(df, "g", col("yh"), col("y"))
      .as[(String, Long, Long, Long, Long, Option[Double], Option[Double], Option[Double])]
      .head()
    assert(r === (("g", 2L, 1L, 1L, 1L,
      Some(2.0 / 3), Some(2.0 / 3), Some(4.0 / 6))))
  }

  test("zero denominators give null metrics, not division errors") {
    val df = Seq(("nopred", false, true), ("nolabel", false, false)).toDF("g", "yh", "y")
    val r = MlEval.confusionStats(df, "g", col("yh"), col("y"))
      .select($"g", $"precision", $"recall", $"f1")
      .as[(String, Option[Double], Option[Double], Option[Double])].collect()
      .map { case (g, p, r2, f) => g -> ((p, r2, f)) }.toMap
    assert(r("nopred") === ((None, Some(0.0), Some(0.0))))   // fn>0: recall 0
    assert(r("nolabel") === ((None, None, None)))
  }

  test("cohen's kappa matches the hand computation (Cohen 1960 worked example shape)") {
    // contingency: a=x,b=x:20  a=x,b=y:5  a=y,b=x:10  a=y,b=y:15 → n=50
    // po = 35/50 = 0.7; pe = (25·30 + 25·20)/50² = 1250/2500 = 0.5
    // kappa = (0.7 − 0.5)/0.5 = 0.4
    val rows = Seq.fill(20)(("x", "x")) ++ Seq.fill(5)(("x", "y")) ++
      Seq.fill(10)(("y", "x")) ++ Seq.fill(15)(("y", "y"))
    val r = MlEval.cohenKappa(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Double, Double, Option[Double])].collect().head
    assert(r._1 === 50L && r._2 === 35L)
    assert(math.abs(r._3 - 0.7) < 1e-12 && math.abs(r._4 - 0.5) < 1e-12)
    assert(math.abs(r._5.get - 0.4) < 1e-12)
  }

  test("kappa: perfect agreement → 1, disjoint label sets → pe 0 + kappa 0, constant both sides → null") {
    val perfect = MlEval.cohenKappa(
      Seq(("a", "a"), ("b", "b"), ("c", "c")).toDF("x", "y"), "x", "y")
      .as[(Long, Long, Double, Double, Option[Double])].collect().head
    assert(perfect._5.get === 1.0)
    // disjoint: no label appears in both margins → pe = 0, po = 0, κ = 0
    val disjoint = MlEval.cohenKappa(
      Seq(("a", "b"), ("a", "b")).toDF("x", "y"), "x", "y")
      .as[(Long, Long, Double, Double, Option[Double])].collect().head
    assert(disjoint._4 === 0.0 && disjoint._5.get === 0.0)
    // both sides constant on the same label: pe = 1 → null, not NaN
    val const = MlEval.cohenKappa(
      Seq(("a", "a"), ("a", "a")).toDF("x", "y"), "x", "y")
      .as[(Long, Long, Double, Double, Option[Double])].collect().head
    assert(const._5.isEmpty)
  }
}

class CalibrationSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("bins, means and positive rates match the hand computation") {
    // scale 1000, 10 bins → bin = score_fp / 100
    val df = Seq((50L, 0), (150L, 1), (151L, 0), (999L, 1), (999L, 1))
      .toDF("sc", "y")
    val got = MlEval.calibrationBins(df, col("sc"), col("y"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.keySet === Set(0L, 1L, 9L))
    assert(got(0L) === ((1L, 0.05, 0.0, -0.05)))
    val (n1, mp1, fp1, _) = got(1L)
    assert(n1 === 2L && math.abs(mp1 - 0.1505) < 1e-12 && fp1 === 0.5)
    assert(got(9L)._1 === 2L && got(9L)._3 === 1.0)
  }

  test("out-of-range scores clamp to edge bins; null score or label dropped") {
    val df = Seq((Some(-5L), Some(1)), (Some(1200L), Some(0)),
      (None, Some(1)), (Some(500L), None)).toDF("sc", "y")
    val got = MlEval.calibrationBins(df, col("sc"), col("y"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 1L, 9L -> 1L))
  }

  test("a perfectly calibrated scorer has zero gap in every bin") {
    // bin b: half the rows positive at score 500 → gap 0 at mean_pred 0.5
    val df = Seq((500L, 1), (500L, 0), (500L, 1), (500L, 0)).toDF("sc", "y")
    val r = MlEval.calibrationBins(df, col("sc"), col("y")).collect().head
    assert(r.getLong(0) === 5L && math.abs(r.getDouble(4)) < 1e-12)
  }

  // ---- conformalReport ----

  test("conformal: qhat is the ceil((n+1)(1-a))-th smallest residual; coverage counted") {
    // calibration residuals 1..9 (n=9), alpha=0.1 → rank ceil(10*0.9)=9 → qhat=9
    val cal = (1L to 9L).toDF("r")
    val test9 = Seq(5L, 9L, 10L, 3L).toDF("r")
    val row = MlEval.conformalReport(cal, test9, "r", 0.1).collect().head
    assert(row.getLong(0) === 9L && row.getLong(1) === 9L)
    assert(row.getLong(2) === 4L && row.getLong(3) === 3L) // 10 > qhat
    assert(math.abs(row.getDouble(4) - 0.75) < 1e-12)
    // alpha=0.5 → rank ceil(10*0.5)=5 → qhat=5
    val r2 = MlEval.conformalReport(cal, test9, "r", 0.5).collect().head
    assert(r2.getLong(1) === 5L)
    // ties: duplicated residuals count with multiplicity
    val r3 = MlEval.conformalReport(Seq(1L, 1L, 1L, 9L).toDF("r"), test9, "r", 0.5)
      .collect().head
    // n=4, rank ceil(5*0.5)=3 → third smallest = 1
    assert(r3.getLong(1) === 1L)
  }

  test("conformal: infinite interval (rank beyond n) reports null qhat, full coverage") {
    val row = MlEval.conformalReport(Seq(2L).toDF("r"), Seq(100L).toDF("r"), "r", 0.1)
      .collect().head
    // n=1, rank ceil(2*0.9)=2 > 1 → no finite qhat
    assert(row.isNullAt(1) && row.getLong(3) === 1L && row.getDouble(4) === 1.0)
  }

  // ---- retrievalMetrics ----

  private def rmetrics(ranked: Seq[(Long, Long, Long)], gold: Seq[(Long, Long)], k: Int)
      : Map[Long, (Long, Option[Double], Double, Option[Double], Option[Double], Option[Double])] =
    MlEval.retrievalMetrics(ranked.toDF("qid", "doc", "rnk"),
        gold.toDF("qid", "doc"), "qid", "doc", "rnk", k)
      .as[(Long, Long, Option[Double], Double, Option[Double], Option[Double], Option[Double])]
      .collect().map(t => t._1 -> ((t._2, t._3, t._4, t._5, t._6, t._7))).toMap

  private def log2d(x: Double): Double = math.log(x) / math.log(2.0)

  test("retrieval metrics match hand computation (MRR, P@k, R@k, nDCG@k)") {
    // q1 ranked 10,11,12,13; gold {11,13}; k=3 → one hit inside the cut
    val r = rmetrics(
      Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L), (1L, 13L, 4L)),
      Seq((1L, 11L), (1L, 13L)), k = 3)(1L)
    val dcg = 1.0 / log2d(3.0)                     // hit at rank 2
    val idcg = 1.0 / log2d(2.0) + 1.0 / log2d(3.0) // ideal: ranks 1, 2
    assert(r._1 === 2L)
    assert(r._2 === Some(0.5))
    assert(math.abs(r._3 - 1.0 / 3) < 1e-12)
    assert(math.abs(r._4.get - 0.5) < 1e-12)
    assert(math.abs(r._5.get - dcg / idcg) < 1e-12)
    // AP@3: one hit at rank 2 → (cum 1 / rank 2) / min(n_rel 2, k 3)
    assert(math.abs(r._6.get - 0.25) < 1e-12)
  }

  test("zero-gold query reports n_rel 0 and null rr/recall/ndcg/ap") {
    val r = rmetrics(Seq((2L, 20L, 1L), (2L, 21L, 2L)), Seq.empty, k = 2)(2L)
    assert(r === ((0L, None, 0.0, None, None, None)))
  }

  test("gold doc the ranker never returned still counts in recall and idcg") {
    // gold {30, 99}; 99 absent from the ranked list
    val r = rmetrics(Seq((3L, 30L, 1L), (3L, 31L, 2L)),
      Seq((3L, 30L), (3L, 99L)), k = 2)(3L)
    val idcg = 1.0 / log2d(2.0) + 1.0 / log2d(3.0) // min(n_rel=2, k)=2 terms
    assert(r._1 === 2L && r._2 === Some(1.0))
    assert(math.abs(r._3 - 0.5) < 1e-12 && math.abs(r._4.get - 0.5) < 1e-12)
    assert(math.abs(r._5.get - 1.0 / idcg) < 1e-12)
    // AP@2: hit at rank 1 → (1/1) / min(n_rel 2, k 2) = 0.5 — the
    // never-returned gold doc deflates AP exactly like recall
    assert(math.abs(r._6.get - 0.5) < 1e-12)
  }

  test("gold-only query (ranker returned nothing) reports recall 0, not a missing row") {
    // q5 has gold but zero ranked rows; q6 is a normal query in the same call
    val m = rmetrics(Seq((6L, 60L, 1L)), Seq((5L, 50L), (5L, 51L), (6L, 60L)), k = 2)
    val r5 = m(5L)
    assert(r5._1 === 2L)                 // n_rel from gold
    assert(r5._2 === None)               // no first hit → null rr
    assert(r5._3 === 0.0)                // p@k = 0
    assert(r5._4 === Some(0.0))          // recall 0, NOT dropped
    assert(r5._5 === Some(0.0))          // ndcg 0 (idcg > 0, dcg 0)
    assert(r5._6 === Some(0.0))          // ap 0 (n_rel > 0, no hits)
    assert(m(6L)._4 === Some(1.0))       // the normal query is unaffected
    assert(m(6L)._6 === Some(1.0))       // single gold at rank 1 → AP 1
  }

  test("idcg truncates at k when the gold set is larger") {
    // n_rel=3 > k=2: ideal DCG uses only 2 terms; both top-2 are hits
    val r = rmetrics(Seq((4L, 1L, 1L), (4L, 2L, 2L)),
      Seq((4L, 1L), (4L, 2L), (4L, 3L)), k = 2)(4L)
    assert(math.abs(r._5.get - 1.0) < 1e-12) // dcg == idcg
    assert(math.abs(r._4.get - 2.0 / 3) < 1e-12)
    // AP@2 with the min(n_rel, k) normalizer: (1/1 + 2/2) / 2 = 1.0 —
    // a ranking that front-loads every findable doc scores perfect
    assert(math.abs(r._6.get - 1.0) < 1e-12)
  }

  private def brier(rows: Seq[(Long, Int)]) =
    MlEval.brierDecompose(rows.toDF("sc", "y"), col("sc"), col("y"))
      .as[(Long, Long, Double, Double, Double, Double)].collect().head

  test("brier: perfect confident forecasts score zero everywhere") {
    val rows = Seq((1000L, 1), (1000L, 1), (0L, 0), (0L, 0))
    val (n, pos, bs, rel, res, unc) = brier(rows)
    assert(n === 4L && pos === 2L && bs === 0.0 && rel === 0.0)
    assert(unc === 0.25 && math.abs(res - 0.25) < 1e-9)
  }

  test("brier: murphy identity holds when forecasts are constant per bin") {
    // bin 2 (sc=250): 3 rows, 1 positive; bin 7 (sc=750): 4 rows, 3 pos
    val rows = Seq.fill(1)((250L, 1)) ++ Seq.fill(2)((250L, 0)) ++
      Seq.fill(3)((750L, 1)) ++ Seq.fill(1)((750L, 0))
    val (n, pos, bs, rel, res, unc) = brier(rows)
    assert(n === 7L && pos === 4L)
    // exact BS: ((250-1000)² + 2·250² + 3·(750-1000)² + 750²) / 1e6 / 7
    val exact = (750.0 * 750 + 2 * 250 * 250 + 3 * 250 * 250 + 750.0 * 750) / 1e6 / 7
    assert(math.abs(bs - exact) < 1e-12)
    assert(math.abs(bs - (rel - res + unc)) < 1e-8) // 1e-9 term quantization
  }

  test("brier: an uninformative constant forecast has zero resolution") {
    val rows = Seq((500L, 1), (500L, 0), (500L, 1), (500L, 0))
    val (_, _, bs, rel, res, unc) = brier(rows)
    assert(res === 0.0 && unc === 0.25 && math.abs(bs - 0.25) < 1e-12)
    assert(math.abs(rel - 0.0) < 1e-9)
  }

  test("brier: bit-identical across partitionings") {
    val rows = (1 to 500).map(i => (((i * 37) % 1001).toLong, i % 3 min 1))
    def run(parts: Int) =
      MlEval.brierDecompose(rows.toDF("sc", "y").repartition(parts),
        col("sc"), col("y"))
        .collect().map(_.toSeq.map {
          case d: Double => java.lang.Double.doubleToLongBits(d)
          case v => v
        })
    assert(run(1) === run(13))
  }
}

class TemperatureScanSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  // cells on a scale-10 grid: p(cell) = (cell + .5)/10
  private def scan(rows: Seq[(Long, Long)], grid: Seq[Double]) =
    MlEval.temperatureScan(rows.toDF("cell", "y"), col("cell"), col("y"),
        scale = 10L, grid = grid)
      .orderBy("t")
      .as[(Double, Long, Double, Boolean)].collect().toSeq

  test("perfectly calibrated cells pick T = 1") {
    // cell 7 (p=.75): 3 of 4 positive; cell 2 (p=.25): 1 of 4 positive
    val rows = Seq.fill(3)((7L, 1L)) ++ Seq((7L, 0L)) ++
      Seq((2L, 1L)) ++ Seq.fill(3)((2L, 0L))
    val out = scan(rows, Seq(0.5, 1.0, 2.0))
    assert(out.filter(_._4).map(_._1) === Seq(1.0))
    assert(out.forall(_._2 === 8L))
  }

  test("all-positive confident cells drive T to the grid floor") {
    // z > 0 everywhere and every label 1: smaller T sharpens toward 1
    val rows = Seq.fill(5)((8L, 1L)) ++ Seq.fill(5)((9L, 1L))
    val out = scan(rows, Seq(0.5, 1.0, 2.0, 4.0))
    assert(out.filter(_._4).map(_._1) === Seq(0.5))
  }

  test("nll replays the quantized per-cell recurrence exactly") {
    val rows = Seq((7L, 1L), (7L, 0L), (2L, 1L))
    val out = scan(rows, Seq(2.0))
    val cells = Seq((7L, 1L, 1L), (7L, 0L, 1L), (2L, 1L, 1L))
    val lq = cells.map { case (c, y, cnt) =>
      val p = (c + 0.5) / 10.0
      val zt = math.log(p / (1 - p)) / 2.0
      math.floor((math.log(1.0 + math.exp(zt)) - y * zt) * 1e9 + 0.5).toLong * cnt
    }.sum
    assert(out.head._3 === lq.toDouble / 1e9 / 3)
  }

  test("bit determinism under repartitioning") {
    val rng = new scala.util.Random(9)
    val rows = (1 to 400).map(_ => (rng.nextInt(10).toLong, rng.nextInt(2).toLong))
    val df = rows.toDF("cell", "y")
    def bits(p: Int) = MlEval.temperatureScan(df.repartition(p), col("cell"),
        col("y"), 10L, Seq(0.5, 1.0, 2.0))
      .orderBy("t").collect().map(_.toSeq.map {
        case d: Double => java.lang.Double.doubleToLongBits(d)
        case v => v
      }).toSeq
    assert(bits(1) === bits(13))
  }

  test("bestF1: exhaustive threshold scan on a hand fixture") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // scores desc: 9(+) 7(+) 5(-) 3(+) 1(-): F1 at t=9: 2/(1+0+3)=.5;
    // t=7: 4/(2+0+3)=.8; t=5: 4/6; t=3: 6/7; t=1: 6/8 -> best t=3
    val rows = Seq((9L, 1), (7L, 1), (5L, 0), (3L, 1), (1L, 0))
      .map { case (s, y) => ("g", s, y) }.toDF("g", "s", "y")
    val r = MlEval.bestF1(rows, "g", "s", col("y") === 1).collect().head
    assert(r.getLong(1) === 3L, s"threshold ${r.getLong(1)}")
    assert(r.getLong(2) === 3L && r.getLong(3) === 1L && r.getLong(4) === 0L)
    assert(math.abs(r.getDouble(6) - 6.0 / 7) < 1e-12)
    // all-negative group: F1 undefined -> NULL, threshold still emitted
    val neg = Seq(("n", 4L, 0), ("n", 2L, 0)).toDF("g", "s", "y")
    assert(MlEval.bestF1(neg, "g", "s", col("y") === 1)
      .collect().head.isNullAt(6))
  }

  test("gainsTable: tied scores are indivisible; lift algebra exact") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // 10 rows, scores 10..1, positives at the top 3 scores
    val rows = (1 to 10).map(i => ("g", (11 - i).toLong, if (i <= 3) 1 else 0))
      .toDF("g", "s", "y")
    val out = MlEval.gainsTable(rows, "g", "s", col("y") === 1)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(out.size === 10)
    assert(out(1L) === ((1L, 1L, 1.0 / 3, (1.0 / 3) / 0.1)))
    assert(out(3L)._2 === 3L && math.abs(out(3L)._3 - 1.0) < 1e-15)
    assert(out(10L) === ((10L, 3L, 1.0, 1.0)))
    // a tie straddling the first decile: 5 rows share the top score
    val tied = ((1 to 5).map(i => ("t", 9L, 1)) ++
      (6 to 10).map(i => ("t", 1L, 0))).toDF("g", "s", "y")
    val t1 = MlEval.gainsTable(tied, "g", "s", col("y") === 1)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(t1(1L) === 5L, "indivisible tie overshoots the nominal decile")
  }

  test("krippendorff: hand coincidence algebra and perfect agreement") {
    import spark.implicits._
    // raters: (a,a) x3, (b,b) x2, (a,b) x1 -> n=6, agree=5, po=5/6;
    // pooled counts: a: 3+3+1=7, b: 2+2+1=5; D_e = 1 - (42+20)/(12*11)
    val rows = Seq(("a", "a"), ("a", "a"), ("a", "a"), ("b", "b"),
      ("b", "b"), ("a", "b")).toDF("r1", "r2")
    val r = MlEval.krippendorffAlpha(rows, "r1", "r2").collect().head
    assert(r.getLong(0) === 6L && r.getLong(1) === 5L)
    val dO = 1.0 - 5.0 / 6
    val dE = 1.0 - (7.0 * 6 + 5.0 * 4) / (12.0 * 11)
    assert(math.abs(r.getDouble(2) - dO) < 1e-15)
    assert(math.abs(r.getDouble(3) - dE) < 1e-15)
    assert(math.abs(r.getDouble(4) - (1.0 - dO / dE)) < 1e-12)
    // perfect agreement -> alpha = 1
    val perfect = Seq(("x", "x"), ("y", "y"), ("x", "x")).toDF("r1", "r2")
    assert(MlEval.krippendorffAlpha(perfect, "r1", "r2")
      .collect().head.getDouble(4) === 1.0)
    // single pooled category: D_e = 0 -> NULL alpha (vacuous agreement)
    val vac = Seq(("x", "x"), ("x", "x")).toDF("r1", "r2")
    assert(MlEval.krippendorffAlpha(vac, "r1", "r2")
      .collect().head.isNullAt(4))
  }

  test("krippendorff diverges from kappa exactly on shared-bias marginals") {
    import spark.implicits._
    // both raters overwhelmingly answer "a": kappa's per-rater expected
    // agreement is high (rewarding the shared bias); alpha's pooled
    // chance term reads the same data more harshly on the rare class
    val rows = (Seq.fill(90)(("a", "a")) ++ Seq.fill(5)(("a", "b")) ++
      Seq.fill(5)(("b", "a"))).toDF("r1", "r2")
    val kappa = MlEval.cohenKappa(rows, "r1", "r2").collect().head.getDouble(4)
    val alpha = MlEval.krippendorffAlpha(rows, "r1", "r2")
      .collect().head.getDouble(4)
    assert(math.abs(kappa - alpha) > 1e-4,
      s"the coefficients must not coincide here: k=$kappa a=$alpha")
    assert(alpha < 0.1 && kappa < 0.1, "neither should credit the bias")
  }

  test("mcnemar: hand cells, continuity correction, vacuous NULL") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // y true everywhere; A right on 1..7 (b: A right & B wrong on 4),
    // B right on {1,2,3,8}: b = 4 (4,5,6,7), c = 1 (8), both_right = 3,
    // both_wrong = 2 (9, 10). χ² = (|4−1|−1)²/5 = 0.8
    val rows = (1 to 10).map(i => (i <= 7, i <= 3 || i == 8, true))
      .toDF("pa", "pb", "y")
    val r = MlEval.mcnemar(rows, col("pa"), col("pb"), col("y"))
      .collect().head
    assert(r.getLong(0) === 10L && r.getLong(1) === 3L)
    assert(r.getLong(2) === 4L && r.getLong(3) === 1L && r.getLong(4) === 2L)
    assert(math.abs(r.getDouble(5) - 0.8) < 1e-12)
    assert(math.abs(r.getDouble(6) - 0.35824173037661916) < 1e-12)
    // perfect agreement: b = c = 0 ⇒ NULL χ²/p
    val agree = (1 to 5).map(i => (i <= 3, i <= 3, true)).toDF("pa", "pb", "y")
    val ra = MlEval.mcnemar(agree, col("pa"), col("pb"), col("y"))
      .collect().head
    assert(ra.isNullAt(5) && ra.isNullAt(6))
  }

  test("matthewsCorr: hand value, perfect/inverted/degenerate cases") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // tp=2 fp=1 tn=3 fn=1: mcc = (6−1)/(√3·√3·√4·√4) = 5/12
    val rows = Seq(
      ("g", true, true), ("g", true, true), ("g", true, false),
      ("g", false, false), ("g", false, false), ("g", false, false),
      ("g", false, true)).toDF("g", "pred", "y")
    val r = MlEval.matthewsCorr(rows, "g", col("pred"), col("y"))
      .collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
      ((2L, 1L, 3L, 1L)))
    assert(math.abs(r.getDouble(5) - 5.0 / 12) < 1e-12)
    // perfect predictor ⇒ 1; inverted ⇒ −1; constant predictor ⇒ NULL
    val perf = Seq(("g", true, true), ("g", false, false)).toDF("g", "pred", "y")
    assert(MlEval.matthewsCorr(perf, "g", col("pred"), col("y"))
      .collect().head.getDouble(5) === 1.0)
    val inv = Seq(("g", false, true), ("g", true, false)).toDF("g", "pred", "y")
    assert(MlEval.matthewsCorr(inv, "g", col("pred"), col("y"))
      .collect().head.getDouble(5) === -1.0)
    val const = Seq(("g", true, true), ("g", true, false)).toDF("g", "pred", "y")
    assert(MlEval.matthewsCorr(const, "g", col("pred"), col("y"))
      .collect().head.isNullAt(5))
  }
}

package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-03-01 $h%02d:$m%02d:00")

  // user 1: touches t1(view 08:00) t2(click 09:00) t3(view 10:00),
  //   conversion c1 at 12:00 -> all three qualify (3-day lookback)
  // user 2: one touch t4(click 07:00), conversion c2 at 08:00
  // user 3: touch t5 outside the lookback (5 days earlier), conv c3
  private val conversions = Seq(
    (1L, ts(12), 101L), (2L, ts(8), 102L),
    (3L, Timestamp.valueOf("2024-03-06 00:00:00"), 103L))
  private val touches = Seq(
    (1L, ts(8), 11L, "view"), (1L, ts(9), 12L, "click"), (1L, ts(10), 13L, "view"),
    (2L, ts(7), 14L, "click"),
    (3L, Timestamp.valueOf("2024-03-01 00:00:00"), 15L, "view"))

  private def run(model: String) =
    Attribution.multiTouch(
      conversions.toDF("user_id", "ts", "event_id"),
      touches.toDF("user_id", "ts", "event_id", "channel"),
      "user_id", "ts", "event_id", "ts", "event_id", "channel",
      lookbackDays = 3, model = model)
      .as[(Long, Long, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap

  test("linear: every qualifying touch gets 1/n; out-of-window touches excluded") {
    val r = run("linear")
    assert(r.keySet === Set(101L -> 11L, 101L -> 12L, 101L -> 13L, 102L -> 14L))
    assert(r(101L -> 11L)._4 === 1.0 / 3)
    assert(r(101L -> 13L)._4 === 1.0 / 3)
    assert(r(102L -> 14L)._4 === 1.0) // single touch gets full credit
    // conversion 103's only touch is 5 days old -> emits nothing
    assert(!r.keySet.exists(_._1 == 103L))
  }

  test("ushape: first/last 0.4, middles split 0.2; n=1 -> 1.0") {
    val r = run("ushape")
    assert(r(101L -> 11L) === (("view", 1L, 3L, 0.4)))
    assert(r(101L -> 12L) === (("click", 2L, 3L, 0.2))) // 0.2/(3-2)
    assert(r(101L -> 13L) === (("view", 3L, 3L, 0.4)))
    assert(r(102L -> 14L) === (("click", 1L, 1L, 1.0)))
  }

  test("ushape n=2 splits 0.5/0.5; simultaneous touches order by touch id") {
    val conv = Seq((9L, ts(12), 201L)).toDF("user_id", "ts", "event_id")
    val tch = Seq((9L, ts(10), 22L, "b"), (9L, ts(10), 21L, "a"))
      .toDF("user_id", "ts", "event_id", "channel")
    val r = Attribution.multiTouch(conv, tch, "user_id", "ts", "event_id",
        "ts", "event_id", "channel", 3, "ushape")
      .as[(Long, Long, String, Long, Long, Double)].collect()
      .map(r => r._2 -> ((r._4, r._6))).toMap
    assert(r(21L) === ((1L, 0.5)) && r(22L) === ((2L, 0.5)))
  }

  test("channel rollup totals and conversion reach") {
    val out = Attribution.channelCredit(
      Attribution.multiTouch(
        conversions.toDF("user_id", "ts", "event_id"),
        touches.toDF("user_id", "ts", "event_id", "channel"),
        "user_id", "ts", "event_id", "ts", "event_id", "channel", 3, "linear"))
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("view") === ((2L, 1L, 2.0 / 3)))
    assert(out("click")._1 === 2L && out("click")._2 === 2L)
    assert(math.abs(out("click")._3 - (1.0 / 3 + 1.0)) < 1e-12)
  }

  test("credit conservation: every conversion's credits sum to 1 under both models") {
    // pseudo-random activity: 40 users, interleaved touches and conversions
    val convs = (0 until 60).map(i =>
      ((i % 40).toLong, ts(8 + i % 12, i % 60), 1000L + i))
    val tchs = (0 until 300).map(i =>
      ((i % 40).toLong, ts(i % 20, (i * 7) % 60), 2000L + i,
        if (i % 3 == 0) "view" else "click"))
    Seq("linear", "ushape").foreach { model =>
      val per = Attribution.multiTouch(
        convs.toDF("user_id", "ts", "event_id"),
        tchs.toDF("user_id", "ts", "event_id", "channel"),
        "user_id", "ts", "event_id", "ts", "event_id", "channel", 3, model)
        .groupBy("conv_id")
        .agg(org.apache.spark.sql.functions.sum("credit").as("s"))
        .collect().map(_.getDouble(1))
      assert(per.nonEmpty)
      per.foreach(s => assert(math.abs(s - 1.0) < 1e-9,
        s"$model credits sum to $s, not 1"))
    }
  }

  test("unknown model throws; results partitioning-invariant") {
    intercept[IllegalArgumentException] {
      Attribution.multiTouch(
        conversions.toDF("user_id", "ts", "event_id"),
        touches.toDF("user_id", "ts", "event_id", "channel"),
        "user_id", "ts", "event_id", "ts", "event_id", "channel", 3, "nope")
    }
    def runParts(p: Int) = Attribution.multiTouch(
        conversions.toDF("user_id", "ts", "event_id").repartition(p),
        touches.toDF("user_id", "ts", "event_id", "channel").repartition(p),
        "user_id", "ts", "event_id", "ts", "event_id", "channel", 3, "ushape")
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(runParts(1) === runParts(9))
  }

  test("conv_id repeated across entities stays two separate conversions") {
    // both users carry conv_id 900 — the credit windows must partition by
    // (entity, conv_id), not conv_id alone, or the four touches would
    // merge into one 4-touch conversion with wrong pos/n/credit
    val convs = Seq((1L, ts(12), 900L), (2L, ts(12), 900L))
    val tchs = Seq(
      (1L, ts(8), 11L, "view"), (1L, ts(9), 12L, "click"),
      (2L, ts(8), 21L, "view"), (2L, ts(9), 22L, "click"))
    val out = Attribution.multiTouch(
        convs.toDF("user_id", "ts", "event_id"),
        tchs.toDF("user_id", "ts", "event_id", "channel"),
        "user_id", "ts", "event_id", "ts", "event_id", "channel", 3, "linear")
      .as[(Long, Long, String, Long, Long, Double)].collect()
    assert(out.length === 4)
    assert(out.forall(_._5 === 2L), "each conversion sees exactly its own 2 touches")
    assert(out.forall(_._6 === 0.5))
    assert(out.filter(_._4 == 1L).map(_._2).sorted.toSeq === Seq(11L, 21L))
  }

  test("transitionSurprise: the rare-path journey scores highest") {
    // 20 users walk a->b->c; one bot walks c->a->b backwards-ish paths
    val common = (1L to 20L).flatMap(u => Seq(
      (u, u * 100 + 1, 1L, "a"), (u, u * 100 + 2, 2L, "b"), (u, u * 100 + 3, 3L, "c")))
    val bot = Seq((99L, 9901L, 1L, "c"), (99L, 9902L, 2L, "a"), (99L, 9903L, 3L, "b"))
    val df = (common ++ bot).toDF("user_id", "ts", "event_id", "et")
    val out = Attribution.transitionSurprise(df, "user_id", "ts", "event_id", "et")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.size === 21 && out.forall(_._2._1 === 2L))
    val botScore = out(99L)._2
    assert((1L to 20L).forall(u => out(u)._2 < botScore),
      "the off-pattern journey must dominate every common one")
    // hand model: counts (a,b)=21 (20 common + bot), (b,c)=20, (c,a)=1;
    // from-totals a=21, b=20, c=1; V = |{a,b,c}| = 3; add-one smoothing:
    // P(b|a) = 22/24, P(c|b) = 21/23
    val lpAB = -math.log(22.0 / (21 + 3))
    val lpBC = -math.log(21.0 / (20 + 3))
    val expect = ((math.floor(lpAB * 1e12 + 0.5).toLong +
      math.floor(lpBC * 1e12 + 0.5).toLong).toDouble / 2) / 1e12
    assert(math.abs(out(1L)._2 - expect) < 1e-12)
  }

  test("transitionSurprise: single-event entities emit no row; determinism") {
    val rows = Seq((1L, 10L, 1L, "a"), (1L, 11L, 2L, "b"),
      (2L, 20L, 1L, "a")) // user 2 has no transition
    val out = Attribution.transitionSurprise(rows.toDF("u", "ts", "id", "et"),
      "u", "ts", "id", "et").collect()
    assert(out.map(_.getLong(0)).toSet === Set(1L))
    val rng = new scala.util.Random(53)
    val big = (1 to 600).map(i => ((i % 40).toLong, i.toLong, i.toLong,
      s"t${rng.nextInt(4)}"))
    def bits(p: Int) = Attribution.transitionSurprise(
        big.toDF("u", "ts", "id", "et").repartition(p), "u", "ts", "id", "et")
      .collect().map(_.toSeq.map {
        case d: Double => java.lang.Double.doubleToLongBits(d)
        case v => v
      }).sortBy(_.mkString("|")).toSeq
    assert(bits(1) === bits(7))
  }

  test("transitionEntropy: deterministic chain is fully predictable") {
    // every user walks a->b->c: H(next|cur) = 0, H(next) = ln 2
    val rows = (1L to 30L).flatMap(u => Seq(
      (u, u * 10 + 1, 1L, "a"), (u, u * 10 + 2, 2L, "b"), (u, u * 10 + 3, 3L, "c")))
    val r = Attribution.transitionEntropy(rows.toDF("u", "ts", "id", "et"),
      "u", "ts", "id", "et").collect().head
    assert(r.getLong(0) === 60L && r.getLong(1) === 3L)
    assert(r.getDouble(2) === 0.0, "deterministic chain has zero rate")
    assert(math.abs(r.getDouble(3) - math.log(2.0)) < 1e-9)
    assert(r.getDouble(4) === 1.0)
  }

  test("transitionEntropy: memoryless stream buys nothing from the past") {
    val rng = new scala.util.Random(73)
    val path = (1L to 4000L).map(i => (1L, i, i, s"t${rng.nextInt(4)}"))
    val r = Attribution.transitionEntropy(path.toDF("u", "ts", "id", "et"),
      "u", "ts", "id", "et").collect().head
    assert(math.abs(r.getDouble(3) - math.log(4.0)) < 0.01,
      "marginal entropy near ln 4")
    assert(math.abs(r.getDouble(4)) < 0.01,
      s"iid stream predictability ~ 0: ${r.getDouble(4)}")
  }

  test("markovRemovalEffects: hand-solvable 2-channel chain") {
    // u1: a → conv; u2: a → b → (no conv); u3: b → conv
    // P: START→{a:2/3, b:1/3}; a→{CONV:1/2, b:1/2}; b→{CONV:1/2, NULL:1/2}
    // v(b)=1/2, v(a)=3/4, base=2/3; remove a → 1/6 (RE 3/4); remove b →
    // 1/3 (RE 1/2); shares 0.6 / 0.4
    val rows = Seq(
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "purchase"),
      (2L, 1L, 3L, "a"), (2L, 2L, 4L, "b"),
      (3L, 1L, 5L, "b"), (3L, 2L, 6L, "purchase"))
      .toDF("u", "ts", "id", "et")
    val out = Attribution.markovRemovalEffects(rows, "u", "ts", "id", "et",
        convType = "purchase", iters = 24)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet === Set("a", "b"))
    val eps = 1e-9
    assert(math.abs(out("a").getDouble(1) - 2.0 / 3) < eps) // p_base
    assert(math.abs(out("a").getDouble(2) - 1.0 / 6) < eps)
    assert(math.abs(out("a").getDouble(3) - 0.75) < eps)
    assert(math.abs(out("b").getDouble(2) - 1.0 / 3) < eps)
    assert(math.abs(out("b").getDouble(3) - 0.5) < eps)
    assert(math.abs(out("a").getDouble(4) - 0.6) < eps)
    assert(math.abs(out("b").getDouble(4) - 0.4) < eps)
  }

  test("markovRemovalEffects: truncation at first conversion; determinism") {
    // events after the first conversion must not leak into the chain:
    // u1 converts at step 2, the trailing 'z' is ignored entirely
    val rows = Seq(
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "purchase"), (1L, 3L, 3L, "z"),
      (2L, 1L, 4L, "a"))
      .toDF("u", "ts", "id", "et")
    val out = Attribution.markovRemovalEffects(rows, "u", "ts", "id", "et",
        "purchase", iters = 8)
      .collect().map(r => r.getString(0)).toSet
    assert(out === Set("a"), s"'z' must not appear as a channel: $out")
    // determinism under repartitioning
    val rng = new scala.util.Random(83)
    val types = Vector("a", "b", "c", "purchase")
    val big = (1 to 600).map(i => ((i % 40).toLong, (i / 40).toLong,
      i.toLong, types(rng.nextInt(4)))).toDF("u", "ts", "id", "et")
    def bits(p: Int) = Attribution.markovRemovalEffects(
        big.repartition(p), "u", "ts", "id", "et", "purchase", 24)
      .collect().map(_.toSeq.map {
        case d: Double => java.lang.Double.doubleToLongBits(d)
        case v => v
      }).sortBy(_.mkString("|")).toSeq
    assert(bits(1) === bits(7))
  }
}

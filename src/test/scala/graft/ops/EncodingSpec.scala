package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EncodingSpec extends SparkSpec {
  import spark.implicits._

  test("LOO target encoding matches the hand formula; own label excluded") {
    // cat a: labels 1,1,0 (S=2,n=3); cat b: 0,0 (S=0,n=2); global mean 2/5
    val df = Seq(("r1", "a", 1), ("r2", "a", 1), ("r3", "a", 0),
      ("r4", "b", 0), ("r5", "b", 0)).toDF("id", "cat", "y")
    val m = 10.0; val gm = 2.0 / 5
    val got = Encoding.looTargetEncode(df, "cat", col("y"), m)
      .select("id", "te")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    def loo(s: Long, n: Long, y: Long) = (s - y + m * gm) / (n - 1 + m)
    assert(math.abs(got("r1") - loo(2, 3, 1)) < 1e-12)
    assert(math.abs(got("r3") - loo(2, 3, 0)) < 1e-12)
    assert(math.abs(got("r4") - loo(0, 2, 0)) < 1e-12)
    // leak check: two rows of the same category with different labels get
    // DIFFERENT encodings (the own label moved out of the numerator)
    assert(got("r1") !== got("r3"))
  }

  test("singleton category shrinks to the global mean; null category/label → null te") {
    val df = Seq((Some("solo"), Some(1)), (Some("x"), Some(0)), (Some("x"), Some(1)),
      (None, Some(1)), (Some("x"), None)).toDF("cat", "y")
    val rows = Encoding.looTargetEncode(df, "cat", col("y"), m = 10.0).collect()
    val gm = 2.0 / 3 // labeled rows: 1,0,1
    val solo = rows.find(r => !r.isNullAt(0) && r.getString(0) == "solo").get
    assert(math.abs(solo.getDouble(2) - (1 - 1 + 10.0 * gm) / (1 - 1 + 10.0)) < 1e-12)
    assert(rows.filter(r => r.isNullAt(0) || r.isNullAt(1)).forall(_.isNullAt(2)))
  }

  test("group winsorize: boundaries, clip counts and clipped mean match brute force") {
    val vs = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 100L)
    val got = Encoding.groupWinsorize(vs.map(("g", _)).toDF("g", "v"), "g", "v", 0.2, 0.8)
      .collect().head
    // lower quantiles: p20 → ceil(0.2·10)=2nd value = 2; p80 → 8th = 8
    assert(got.getLong(1) === 10L && got.getLong(4) === 2L && got.getLong(5) === 8L)
    val clipped = vs.map(v => math.max(2L, math.min(8L, v)))
    assert(got.getLong(2) === 1L && got.getLong(3) === 2L) // 1 below, 9&100 above
    assert(math.abs(got.getDouble(6) - clipped.sum.toDouble / 10) < 1e-12)
  }

  test("hash features: fixed dim, stateless, signed sums match a scala replay") {
    val rows = Seq((1L, Some("en"), Some("web")), (2L, Some("de"), None),
      (3L, None, Some("web")), (4L, Some("en"), Some("web")))
    val got = Encoding.hashFeatures(
        rows.toDF("id", "lang", "source"), "id", Seq("lang", "source"), dim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def h(t: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val expected = rows.flatMap { case (id, l, s) =>
      l.map(v => id -> s"lang=$v").toSeq ++ s.map(v => id -> s"source=$v")
    }.groupBy { case (id, t) => (id, h(t) % 8) }
      .map { case (k, ts) =>
        k -> ts.map { case (_, t) => if ((h(t) / 8) % 2 == 0) 1L else -1L }.sum
      }
    assert(got === expected)
    // buckets stay inside [0, dim); docs 1 and 4 (identical features) get
    // identical sparse vectors — the stateless-encoder contract
    assert(got.keys.forall { case (_, b) => b >= 0 && b < 8 })
    val v1 = got.collect { case ((1L, b), x) => b -> x }
    val v4 = got.collect { case ((4L, b), x) => b -> x }
    assert(v1 === v4 && v1.nonEmpty)
  }

  test("winsorize groups are independent and deterministic across partitionings") {
    val rows = (1 to 300).map(i => (s"g${i % 3}", (i * 17 % 251).toLong))
    def run(parts: Int) = Encoding
      .groupWinsorize(rows.toDF("g", "v").repartition(parts), "g", "v", 0.1, 0.9)
      .collect().map(r => (r.getString(0), r.getLong(4), r.getLong(5),
        java.lang.Double.doubleToLongBits(r.getDouble(6)))).toSet
    assert(run(1) === run(13))
  }

  private def woe(rows: Seq[(Long, Int)], bins: Int = 2)
      : Map[Long, (Long, Long, Long, Double, Double, Double)] =
    Encoding.woeIv(rows.toDF("v", "y"), col("v"), col("y"), bins)
      .as[(Long, Long, Long, Long, Double, Double, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap

  test("woe/iv: proportional bins give exactly zero WoE and IV") {
    // bins split [0,9] at 5; each bin has 2 pos + 2 neg → perfectly flat
    val rows = Seq((0L, 1), (1L, 1), (2L, 0), (3L, 0),
      (5L, 1), (6L, 1), (7L, 0), (8L, 0))
    val r = woe(rows)
    assert(r(0L) === ((4L, 2L, 2L, 0.0, 0.0, 0.0)))
    assert(r(1L) === ((4L, 2L, 2L, 0.0, 0.0, 0.0)))
  }

  test("woe/iv: hand-computed two-bin separation") {
    // v in 0..9, bins=2 → bin = v*2 div 10: bin0 = {0..4}, bin1 = {5..9}
    // bin0: 3 pos 1 neg; bin1: 1 pos 3 neg; totals 4/4
    val rows = Seq((0L, 1), (1L, 1), (2L, 1), (3L, 0),
      (5L, 1), (7L, 0), (8L, 0), (9L, 0))
    val r = woe(rows)
    val w0 = math.log((3.5 * 4) / (1.5 * 4))
    val exp0 = (3.0 / 4 - 1.0 / 4) * w0
    val (n0, p0, ng0, woe0, t0, iv) = r(0L)
    assert((n0, p0, ng0) === ((4L, 3L, 1L)))
    assert(math.abs(woe0 - w0) < 1e-15)
    assert(math.abs(t0 - exp0) < 1e-9) // 1e-9 fixed-point term
    // symmetric bins → iv = 2·term0; total carried on every row
    assert(math.abs(iv - 2 * math.floor(exp0 * 1e9 + 0.5) / 1e9) < 1e-15)
    assert(r(1L)._6 === iv)
  }

  test("woe/iv: extreme values clamp into the last bin; nulls dropped") {
    val rows = Seq((Some(0L), Some(1)), (Some(99L), Some(0)),
      (Some(100L), Some(0)), (None, Some(1)), (Some(50L), None))
    val r = Encoding.woeIv(rows.toDF("v", "y"), col("v"), col("y"), bins = 10)
      .as[(Long, Long, Long, Long, Double, Double, Double)]
      .collect().map(t => t._1 -> t._2).toMap
    assert(r === Map(0L -> 1L, 9L -> 2L)) // 99 and 100 share the top bin
  }

  test("woe/iv: bit-identical across partitionings") {
    val rows = (1 to 400).map(i => ((i * 31 % 197).toLong, i % 3 min 1))
    def run(parts: Int) =
      Encoding.woeIv(rows.toDF("v", "y").repartition(parts), col("v"), col("y"), 8)
        .collect().map(_.toSeq.map {
          case d: Double => java.lang.Double.doubleToLongBits(d)
          case x => x
        }).sortBy(_.mkString("|"))
    assert(run(1) === run(13))
  }
}

package graft.llm

import graft.SparkSpec

class TextClassifySpec extends SparkSpec {
  import spark.implicits._

  private def grid(x: Double): Long = math.floor(x * 1e12 + 0.5).toLong

  test("hand-computed scores, add-one smoothing, OOV mass") {
    val train = Seq((0L, "x x y", "a"), (1L, "y z", "b"))
      .toDF("doc_id", "text", "lang")
    // T_a=3, T_b=2, V=3; priors 1/2 each
    val test_ = Seq((2L, "x y", "a")).toDF("doc_id", "text", "lang")
    val r = TextClassify.naiveBayes(train, test_, "doc_id", "text", "lang")
      .collect()(0)
    val sA = (grid(math.log(0.5)) + grid(math.log(3.0 / 6)) +
      grid(math.log(2.0 / 6))).toDouble / 1e12
    val sB = (grid(math.log(0.5)) + grid(math.log(1.0 / 5)) +
      grid(math.log(2.0 / 5))).toDouble / 1e12
    assert(sA > sB)
    assert(r.getString(2) === "a" && r.getBoolean(3))
    assert(r.getDouble(4) === sA)
    // an OOV term shifts both labels by their unseen mass, argmax holds
    val test2 = Seq((3L, "x y qqq", "b")).toDF("doc_id", "text", "lang")
    val r2 = TextClassify.naiveBayes(train, test2, "doc_id", "text", "lang")
      .collect()(0)
    assert(r2.getString(2) === "a" && !r2.getBoolean(3))
    assert(r2.getDouble(4) ===
      (grid(math.log(0.5)) + grid(math.log(3.0 / 6)) +
        grid(math.log(2.0 / 6)) + grid(math.log(1.0 / 6))).toDouble / 1e12)
  }

  test("exact score tie breaks to the ascending label") {
    // symmetric corpus: both labels give any test doc identical scores
    val train = Seq((0L, "x", "b"), (1L, "x", "a")).toDF("doc_id", "text", "lang")
    val test_ = Seq((2L, "x x", "b")).toDF("doc_id", "text", "lang")
    val r = TextClassify.naiveBayes(train, test_, "doc_id", "text", "lang")
      .collect()(0)
    assert(r.getString(2) === "a", "tie must resolve to the smaller label")
  }

  test("separable corpus classifies the held-out half correctly") {
    val rng = new scala.util.Random(5)
    val vocabA = Seq("alpha", "apple", "arrow", "axis")
    val vocabB = Seq("beta", "bread", "brick", "bloom")
    val docs = (0L until 120L).map { i =>
      val v = if (i % 2 == 0) { if (i % 4 == 0) vocabA else vocabB }
      else { if (i % 4 == 1) vocabA else vocabB }
      val lab = if (v eq vocabA) "a" else "b"
      (i, Seq.fill(6)(v(rng.nextInt(4))).mkString(" "), lab)
    }.toDF("doc_id", "text", "lang")
    val out = TextClassify.naiveBayes(
      docs.filter($"doc_id" % 2 === 0), docs.filter($"doc_id" % 2 === 1),
      "doc_id", "text", "lang")
    assert(out.count() === 60)
    assert(out.filter(!$"correct").count() === 0,
      "disjoint vocabularies must classify perfectly")
  }

  test("labelNoise: the planted mislabel surfaces with the largest margin") {
    // 20 clean docs per label with disjoint vocab; doc 999 carries pure
    // "a" text but a "b" label — the corpus evidence must out-vote it
    val docs = ((0L until 20L).map(i => (i, "apple arrow axis", "a")) ++
      (20L until 40L).map(i => (i, "bread brick bloom", "b")) :+
      ((999L, "apple arrow axis", "b"))).toDF("doc_id", "text", "lang")
    val out = TextClassify.labelNoise(docs, "doc_id", "text", "lang")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getDouble(3)))).toMap
    assert(out.contains(999L), "the planted mislabel must be flagged")
    val (actual, pred, margin) = out(999L)
    assert(actual === "b" && pred === "a" && margin > 0)
    assert(out.size === 1, s"clean docs must not be flagged: ${out.keySet}")
  }

  test("labelNoise margin is the exact grid difference of the two scores") {
    val docs = (Seq((1L, "x x", "a"), (2L, "y y", "b"), (3L, "x x", "b")))
      .toDF("doc_id", "text", "lang")
    val out = TextClassify.labelNoise(docs, "doc_id", "text", "lang")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // model: T_a=2 (x,a)=2; T_b=4 (y,b)=2 (x,b)=2; V=2; priors 1/3, 2/3
    // doc 3 "x x" under a: ln(1/3)+2·ln(3/4); under b: ln(2/3)+2·ln(3/6)
    def g(v: Double) = math.floor(v * 1e12 + 0.5).toLong
    val sA = g(math.log(1.0 / 3)) + 2 * g(math.log(3.0 / 4))
    val sB = g(math.log(2.0 / 3)) + 2 * g(math.log(3.0 / 6))
    if (sA > sB) {
      assert(out.contains(3L))
      assert(out(3L) === (sA - sB).toDouble / 1e12)
    } else assert(!out.contains(3L))
  }

  test("bit determinism under repartitioning") {
    val rng = new scala.util.Random(23)
    val words = Seq("u", "v", "w", "x", "y", "z")
    val docs = (0L until 80L).map { i =>
      (i, Seq.fill(5)(words(rng.nextInt(6))).mkString(" "),
        if (rng.nextBoolean()) "a" else "b")
    }.toDF("doc_id", "text", "lang")
    def run(p: Int) = TextClassify.naiveBayes(
        docs.filter($"doc_id" % 2 === 0).repartition(p),
        docs.filter($"doc_id" % 2 === 1).repartition(p),
        "doc_id", "text", "lang")
      .collect().map(_.toSeq.map {
        case d: Double => java.lang.Double.doubleToLongBits(d)
        case v => v
      }).sortBy(_.mkString("|")).toSeq
    assert(run(1) === run(7))
  }
}

class TermChi2Spec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("termChi2: 2x2 presence cells, hand chi2, marginals guard, presence not tf") {
    // 4 docs, 2 per label; "p" appears ONLY in positives (twice in doc 1
    // - presence must count it once), "q" in everything, "r" only in one
    // negative
    val docs = Seq(
      (1L, "en", "p p q"), (2L, "en", "p q"),
      (3L, "de", "q r"), (4L, "de", "q")).toDF("doc_id", "lang", "text")
    val got = TextClassify.termChi2(docs, "doc_id", "text",
        col("lang") === "en", k = 10)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          Option(r.get(5)).map(_.asInstanceOf[Double])))).toMap
    // p: a=2 b=0 c=0 d=2 -> chi2 = 4*(4-0)^2/(2*2*2*2) = 4
    assert(got("p") === ((2L, 0L, 0L, 2L, Some(4.0))))
    // q: present everywhere -> c+d marginal (absent count) is 0 -> NULL
    assert(got("q")._1 === 2L && got("q")._5.isEmpty)
    // r: a=0 b=1 c=2 d=1 -> chi2 = 4*(0-2)^2/(1*3*2*2) = 16/12
    val rChi = math.floor(4.0 * 4.0 / 12.0 * 1e6 + 0.5) / 1e6
    assert(got("r") === ((0L, 1L, 2L, 1L, Some(rChi))))
  }
}

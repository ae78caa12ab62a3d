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

package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def score(docs: Seq[(Long, String)], terms: Seq[String])
      : Map[(String, Long), (Long, Double)] =
    Retrieval.bm25(docs.toDF("doc_id", "text"), "doc_id", "text",
        terms.toDF("term"))
      .as[(String, Long, Long, Double)].collect()
      .map { case (t, d, tf, s) => (t, d) -> (tf, s) }.toMap

  test("hand-computed score for a single match") {
    // N=2, avgdl=2.5; tf(x,d1)=2, df=1, dl=3:
    // idf = ln(1 + 1.5/1.5) = ln 2
    // score = ln2 · 2·2.2 / (2 + 1.2·(0.25 + 0.75·3/2.5))
    val r = score(Seq((1L, "x x y"), (2L, "y z")), Seq("x"))
    assert(r.keySet === Set(("x", 1L)))
    val (tf, s) = r(("x", 1L))
    val expect = math.log(2.0) * (2 * 2.2) / (2 + 1.2 * (0.25 + 0.75 * 3 / 2.5))
    assert(tf === 2L && math.abs(s - expect) < 1e-12)
  }

  test("terms absent from the corpus produce no rows; only tf>0 docs appear") {
    val r = score(Seq((1L, "x y"), (2L, "y z")), Seq("q", "z"))
    assert(r.keySet === Set(("z", 2L)))
  }

  test("rarer terms outscore common ones at equal tf and length") {
    // "rare" df=1, "common" df=3, same tf=1 in doc 1, same dl
    val docs = Seq((1L, "rare common pad"), (2L, "common filler pad"),
      (3L, "common other pad"))
    val r = score(docs, Seq("rare", "common"))
    assert(r(("rare", 1L))._2 > r(("common", 1L))._2)
  }

  test("longer documents are penalized at equal tf") {
    val docs = Seq((1L, "t a"), (2L, "t a a a a a a a"))
    val r = score(docs, Seq("t"))
    assert(r(("t", 1L))._2 > r(("t", 2L))._2)
  }

  test("higher tf raises the score sublinearly (saturation)") {
    val docs = Seq((1L, "t t t t"), (2L, "t x y z"))
    val r = score(docs, Seq("t"))
    val s1 = r(("t", 1L))._2; val s2 = r(("t", 2L))._2
    assert(s1 > s2)           // more occurrences help...
    assert(s1 < 4 * s2)       // ...but less than linearly (k1 saturation)
  }

  test("the query-term side is broadcast, not shuffled") {
    val docs = (1L to 50L).map(i => (i, s"w${i % 9} w${i % 4} filler"))
    val plan = Retrieval.bm25(docs.toDF("doc_id", "text"), "doc_id", "text",
      Seq("w1", "w2").toDF("term")).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("partitioning-independent") {
    val docs = (1L to 60L).map(i => (i, s"w${i % 9} w${i % 4} w${i % 9}"))
    val terms = Seq("w1", "w3").toDF("term")
    val a = Retrieval.bm25(docs.toDF("doc_id", "text").repartition(1),
      "doc_id", "text", terms).as[(String, Long, Long, Double)].collect().toSet
    val b = Retrieval.bm25(docs.toDF("doc_id", "text").repartition(11),
      "doc_id", "text", terms).as[(String, Long, Long, Double)].collect().toSet
    assert(a === b)
  }
}

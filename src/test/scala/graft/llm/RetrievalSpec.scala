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

  test("bm25FromTf on a shared tokenization is bit-identical to bm25 on the corpus") {
    val docs = Seq((1L, "x x y pad pad"), (2L, "y z pad"), (3L, "z z z x"),
      (4L, "lone"))
    val terms = Seq("x", "z").toDF("term")
    val direct = Retrieval.bm25(docs.toDF("doc_id", "text"), "doc_id", "text", terms)
      .as[(String, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val tfAll = docs.toDF("doc_id", "text")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    val shared = Retrieval.bm25FromTf(tfAll, terms)
      .as[(String, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(shared === direct)
  }

  test("bm25FromTf docs-table form counts zero-token docs in N and avgdl") {
    val docs = Seq((1L, Some("x x")), (2L, Some("x y")), (3L, None))
      .toDF("doc_id", "text")
    val tfAll = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    val terms = Seq("x").toDF("term")
    val got = Retrieval.bm25FromTf(tfAll, terms, docs, "doc_id", 1.2, 0.75)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._2 -> r._4).toMap
    // N=3 (null-text doc counts), avgdl=(2+2+0)/3: doc1 tf=2 df=2 dl=2
    val idf = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    val expect1 = idf * (2 * 2.2) / (2 + 1.2 * (0.25 + 0.75 * 2 / (4.0 / 3)))
    assert(math.abs(got(1L) - expect1) < 1e-12)
    // the tf-only form diverges here (N=2, avgdl=2) — the documented gap
    val tfOnly = Retrieval.bm25FromTf(tfAll, terms)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._2 -> r._4).toMap
    assert(math.abs(tfOnly(1L) - got(1L)) > 1e-6)
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

class RrfFusionSpec extends SparkSpec {
  import spark.implicits._

  private def fuse(runs: Seq[(String, Seq[(Long, Double)])]): Map[Long, (Long, Double)] =
    Retrieval.rrfFuse(
        runs.map { case (n, rs) => n -> rs.toDF("doc_id", "score") },
        "doc_id", "score")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

  test("matches the hand-computed reciprocal-rank sum across two runs") {
    val lex = Seq(1L -> 9.0, 2L -> 5.0, 3L -> 1.0)         // ranks 1, 2, 3
    val dense = Seq(2L -> 0.9, 4L -> 0.8, 1L -> 0.1)       // ranks 1, 2, 3
    val out = fuse(Seq("lex" -> lex, "dense" -> dense))
    assert(out(2L) === ((2L, 1.0 / 62 + 1.0 / 61)))
    assert(out(1L) === ((2L, 1.0 / 61 + 1.0 / 63)))
    assert(out(4L) === ((1L, 1.0 / 62)))                   // missing from lex: no term
    assert(out(3L) === ((1L, 1.0 / 63)))
    // the doc present near the top of both runs wins the fused ranking
    assert(out(2L)._2 > out(1L)._2 && out(1L)._2 > out(4L)._2)
  }

  test("rank basis rounds at 1e-6 with doc-id tie-break (stable under float noise)") {
    val noisy = Seq(5L -> 1.0000001, 3L -> 1.0000004, 9L -> 0.5)
    val out = fuse(Seq("only" -> noisy))
    // 1.0000001 and 1.0000004 collapse to the same rounded key → doc asc:
    // doc 3 gets rank 1, doc 5 rank 2
    assert(out(3L)._2 === 1.0 / 61 && out(5L)._2 === 1.0 / 62 && out(9L)._2 === 1.0 / 63)
  }

  test("single run degrades to 1/(k+rank); partitioning-invariant") {
    val run = (1L to 40L).map(i => i -> (100.0 - i))
    val a = fuse(Seq("r" -> run))
    val b = Retrieval.rrfFuse(
        Seq("r" -> run.toDF("doc_id", "score").repartition(7)), "doc_id", "score")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(a === b)
    assert(a(1L)._2 === 1.0 / 61 && a(40L)._2 === 1.0 / 100)
  }
}

class MmrSpec extends graft.SparkSpec {
  import spark.implicits._

  private val cand = Seq(
    ("q", 1L, 0.9), ("q", 2L, 0.85), ("q", 3L, 0.8), ("q", 4L, 0.3))
  private val sims = Seq(
    ("q", 1L, 2L, 0.95), ("q", 1L, 3L, 0.1), ("q", 1L, 4L, 0.2),
    ("q", 2L, 3L, 0.1), ("q", 2L, 4L, 0.2), ("q", 3L, 4L, 0.05))
  private def simDf = (sims ++ sims.map { case (q, a, b, s) => (q, b, a, s) })
    .toDF("query_id", "a_id", "b_id", "sim")

  private def run(lambda: Double, k: Int) =
    Retrieval.mmrSelect(cand.toDF("query_id", "cand_id", "rel"), simDf, lambda, k)
      .orderBy("query_id", "round")
      .as[(String, Int, Long, Double)].collect().toSeq

  test("hand example: diversity pushes the near-dup below a weaker candidate") {
    val out = run(0.7, 3)
    // r1: argmax .7·rel = cand 1 (.63)
    // r2: 2 -> .7·.85 − .3·.95 = .31; 3 -> .53; 4 -> .15  => cand 3
    // r3: 2 -> .31 (maxsim .95); 4 -> .15 (maxsim .2)     => cand 2
    assert(out.map(_._3) === Seq(1L, 3L, 2L))
    assert(math.abs(out(0)._4 - 0.7 * 0.9) < 1e-15)
    assert(math.abs(out(1)._4 - (0.7 * 0.8 - (1.0 - 0.7) * 0.1)) < 1e-15)
    assert(math.abs(out(2)._4 - (0.7 * 0.85 - (1.0 - 0.7) * 0.95)) < 1e-15)
  }

  test("lambda = 1 degenerates to pure relevance order") {
    assert(run(1.0, 4).map(_._3) === Seq(1L, 2L, 3L, 4L))
  }

  test("k beyond the candidate set emits nothing extra; ties break on id") {
    assert(run(0.7, 6).map(_._3).size === 4)
    val tied = Retrieval.mmrSelect(
      Seq(("q", 9L, 0.5), ("q", 7L, 0.5)).toDF("query_id", "cand_id", "rel"),
      Seq.empty[(String, Long, Long, Double)].toDF("query_id", "a_id", "b_id", "sim"),
      1.0, 2).orderBy("round").as[(String, Int, Long, Double)].collect()
    assert(tied.map(_._3).toSeq === Seq(7L, 9L))
  }

  test("queries are independent") {
    val c2 = cand ++ Seq(("r", 10L, 0.2), ("r", 11L, 0.9))
    val out = Retrieval.mmrSelect(c2.toDF("query_id", "cand_id", "rel"),
        simDf, 0.7, 1)
      .as[(String, Int, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(out("q") === 1L && out("r") === 11L)
  }
}

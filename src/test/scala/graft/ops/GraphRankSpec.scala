package graft.ops

import graft.SparkSpec

class GraphRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    GraphRank.pageRankFixedPoint(edges.toDF("src", "dst"), iters)
      .as[(Long, Long)].collect().toMap

  /** Symmetrize a directed edge list. */
  private def sym(e: Seq[(Long, Long)]): Seq[(Long, Long)] =
    e ++ e.map { case (a, b) => (b, a) }

  test("symmetric two-node graph: equal ranks, mass conserved up to truncation") {
    val r = ranks(Seq((1L, 2L), (2L, 1L)), iters = 5)
    assert(r(1L) === r(2L))
    // total scale 1e12, per-node init 5e11; each round keeps
    // (15+85)/100 of it minus integer-division dust
    val total = r.values.sum
    assert(total <= 1000000000000L && total > 990000000000L, s"total=$total")
  }

  test("star graph: the hub outranks every leaf") {
    val star = sym((2L to 9L).map(l => (1L, l)))
    val r = ranks(star, iters = 5)
    assert((2L to 9L).forall(l => r(1L) > r(l)), r.toString)
    // all leaves are symmetric — identical rank
    assert((2L to 9L).map(r).toSet.size === 1)
  }

  test("iterations = 0 returns the uniform init") {
    val r = ranks(Seq((1L, 2L), (2L, 3L), (3L, 1L)), iters = 0)
    assert(r.values.toSet === Set(1000000000000L / 3))
  }

  test("dangling nodes leak mass but keep the teleport floor") {
    // 1→2, 2 has no out-edges
    val r = ranks(Seq((1L, 2L)), iters = 3)
    val init = 1000000000000L / 2
    val teleport = 15L * init / 100L
    assert(r(1L) === teleport) // nothing flows into 1 after round 1
    assert(r(2L) >= teleport)
  }

  test("result is partitioning-independent and run-deterministic") {
    val edges = sym(for (i <- 1L to 30L; j <- Seq(i % 7 + 100L)) yield (i, j))
    val a = GraphRank.pageRankFixedPoint(edges.toDF("src", "dst").repartition(1), 4)
      .as[(Long, Long)].collect().toMap
    val b = GraphRank.pageRankFixedPoint(edges.toDF("src", "dst").repartition(13), 4)
      .as[(Long, Long)].collect().toMap
    assert(a === b)
  }
}

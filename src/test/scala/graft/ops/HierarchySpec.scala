package graft.ops

import graft.SparkSpec

class HierarchySpec extends SparkSpec {
  import spark.implicits._

  private def resolve(edges: Seq[(Long, Option[Long])], maxIters: Int = 40)
      : Map[Long, (Long, Long)] =
    Hierarchy.resolveRoots(edges.toDF("node", "parent"), "node", "parent", maxIters)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap

  test("forest with chain, star, and singleton resolves roots and depths") {
    // 1 (root) ← 2 ← 3 ← 4 (chain); 10 (root) ← 11,12,13 (star); 99 alone
    val got = resolve(Seq(
      (1L, None), (2L, Some(1L)), (3L, Some(2L)), (4L, Some(3L)),
      (10L, None), (11L, Some(10L)), (12L, Some(10L)), (13L, Some(10L)),
      (99L, None)))
    assert(got(1L) === ((1L, 0L)) && got(4L) === ((1L, 3L)))
    assert(got(11L) === ((10L, 1L)) && got(13L) === ((10L, 1L)))
    assert(got(99L) === ((99L, 0L)))
  }

  test("a 33-deep chain resolves exactly (doubling, not depth-sequential)") {
    val chain = (0L until 33L).map(i =>
      (i, if (i == 0) None else Some(i - 1)))
    val got = resolve(chain)
    assert(got(32L) === ((0L, 32L)))
    assert((0L until 33L).forall(i => got(i) === ((0L, i))))
  }

  test("a parent that is not itself a node acts as an implicit root") {
    // 5's parent 100 has no row: 5 and its subtree resolve to root 100
    val got = resolve(Seq((5L, Some(100L)), (6L, Some(5L))))
    assert(got(5L) === ((100L, 1L)))
    assert(got(6L) === ((100L, 2L)))
  }

  test("a cycle throws instead of looping forever") {
    val ex = intercept[IllegalStateException] {
      resolve(Seq((1L, Some(2L)), (2L, Some(1L))), maxIters = 6)
    }
    assert(ex.getMessage.contains("cycle"))
  }

  test("ancestor closure: exactly the unique paths, self included at dist 0") {
    // 1 ← 2 ← 3 chain plus root 9
    val edges = Seq((1L, None), (2L, Some(1L)), (3L, Some(2L)), (9L, None))
    val got = Hierarchy.ancestorClosure(edges.toDF("node", "parent"), "node", "parent")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 1L, 0L), (2L, 2L, 0L), (3L, 3L, 0L), (9L, 9L, 0L),
      (2L, 1L, 1L), (3L, 2L, 1L), (3L, 1L, 2L)))
  }

  test("closure of a 20-chain closes in log rounds (fixpoint reached)") {
    val chain = (0L until 20L).map(i => (i, if (i == 0) None else Some(i - 1)))
    val got = Hierarchy.ancestorClosure(chain.toDF("node", "parent"), "node", "parent")
    assert(got.count() === (20L * 21) / 2) // Σ (depth+1) over the chain
  }

  test("subtree rollup totals descendants-or-self") {
    // 1 ← {2, 3}; 3 ← 4; metrics: node id as value
    val edges = Seq((1L, None), (2L, Some(1L)), (3L, Some(1L)), (4L, Some(3L)))
    val metrics = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L))
    val got = Hierarchy.subtreeRollup(edges.toDF("node", "parent"),
        metrics.toDF("node", "m"), "node", "parent", "m")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got(1L) === ((4L, 100L)))
    assert(got(3L) === ((2L, 70L)))
    assert(got(2L) === ((1L, 20L)) && got(4L) === ((1L, 40L)))
  }

  test("empty edges: resolveRoots and ancestorClosure return empty, no NPE") {
    import spark.implicits._
    val e = Seq.empty[(Long, Option[Long])].toDF("node", "parent")
    assert(Hierarchy.resolveRoots(e, "node", "parent").count() === 0)
    assert(Hierarchy.ancestorClosure(e, "node", "parent").count() === 0)
  }

  test("resolution is partitioning-independent") {
    val edges = (0L until 200L).map(i =>
      (i, if (i < 4) None else Some(i / 4)))
    val df = edges.toDF("node", "parent")
    val a = Hierarchy.resolveRoots(df, "node", "parent")
      .orderBy("node").collect().toSeq
    val b = Hierarchy.resolveRoots(df.repartition(7), "node", "parent")
      .orderBy("node").collect().toSeq
    assert(a === b)
  }
}

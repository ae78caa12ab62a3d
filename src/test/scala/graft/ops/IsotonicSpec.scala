package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IsotonicSpec extends SparkSpec {
  import spark.implicits._

  private def fit(rows: Seq[(Long, Long)]): Seq[(Long, Long, Long, Double)] =
    Isotonic.pavFit(rows.toDF("cell", "y"), col("cell"), col("y"))
      .orderBy("cell")
      .select("cell", "n", "sy", "fitted")
      .as[(Long, Long, Long, Double)].collect().toSeq

  /** Reference sequential PAV over (cell-ordered) weighted points. */
  private def pavSequential(pts: Seq[(Double, Double)]): Seq[Double] = {
    // blocks of (weight, mean)
    val blocks = scala.collection.mutable.ArrayBuffer.empty[(Double, Double, Int)]
    for (((w, m), _) <- pts.zipWithIndex) {
      blocks += ((w, m, 1))
      while (blocks.length >= 2 && blocks(blocks.length - 2)._2 >= blocks.last._2) {
        val (w2, m2, c2) = blocks.remove(blocks.length - 1)
        val (w1, m1, c1) = blocks.remove(blocks.length - 1)
        blocks += ((w1 + w2, (w1 * m1 + w2 * m2) / (w1 + w2), c1 + c2))
      }
    }
    blocks.toSeq.flatMap { case (_, m, c) => Seq.fill(c)(m) }
  }

  test("hand example: one violation pools the first two cells") {
    // cells 1,2,3 with y = 1, 0, 1 -> PAV pools (1,0) -> [0.5, 0.5, 1.0]
    val out = fit(Seq((1L, 1L), (2L, 0L), (3L, 1L)))
    assert(out.map(_._4) === Seq(0.5, 0.5, 1.0))
    assert(out.map(_._2) === Seq(1L, 1L, 1L))
  }

  test("already-monotone empirical rates pass through unchanged") {
    val rows = Seq((1L, 0L), (1L, 0L), (2L, 0L), (2L, 1L), (3L, 1L), (3L, 1L))
    val out = fit(rows)
    assert(out.map(_._4) === Seq(0.0, 0.5, 1.0))
  }

  test("fully decreasing input pools into one global mean") {
    val rows = Seq((1L, 1L), (1L, 1L), (2L, 1L), (2L, 0L), (3L, 0L), (3L, 0L))
    val out = fit(rows)
    assert(out.map(_._4) === Seq(0.5, 0.5, 0.5))
  }

  test("cell multiplicity acts as weight (pooled means are weighted)") {
    // cell 1: 3 rows mean 1.0; cell 2: 1 row mean 0.0
    // pooled: (3*1 + 1*0)/4 = 0.75 for both
    val rows = Seq((1L, 1L), (1L, 1L), (1L, 1L), (2L, 0L))
    val out = fit(rows)
    assert(out.map(_._4) === Seq(0.75, 0.75))
  }

  test("matches sequential PAV on a pseudo-random weighted workload") {
    val rng = new scala.util.Random(42)
    val rows = (1 to 400).map { _ =>
      val cell = rng.nextInt(25).toLong
      // upward-trending success probability + noise
      val y = if (rng.nextDouble() < 0.1 + 0.035 * cell) 1L else 0L
      (cell, y)
    }
    val out = fit(rows)
    val pts = out.map { case (_, n, sy, _) => (n.toDouble, sy.toDouble / n) }
    val expect = pavSequential(pts)
    out.map(_._4).zip(expect).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-12, s"got $got want $want")
    }
    // monotone by construction
    assert(out.map(_._4) === out.map(_._4).sorted)
  }

  test("bit determinism: result invariant under repartitioning") {
    val rng = new scala.util.Random(7)
    val rows = (1 to 300).map(_ => (rng.nextInt(12).toLong, rng.nextInt(2).toLong))
    val df = rows.toDF("cell", "y")
    val a = Isotonic.pavFit(df.repartition(1), col("cell"), col("y"))
      .orderBy("cell").collect().toSeq
    val b = Isotonic.pavFit(df.repartition(13), col("cell"), col("y"))
      .orderBy("cell").collect().toSeq
    assert(a === b)
  }

  test("null cells and labels are excluded") {
    val df = Seq((Some(1L), Some(1L)), (None, Some(0L)), (Some(2L), None),
      (Some(2L), Some(0L))).toDF("cell", "y")
    val out = Isotonic.pavFit(df, col("cell"), col("y"))
      .orderBy("cell").select("cell", "n").as[(Long, Long)].collect()
    assert(out.toSeq === Seq((1L, 1L), (2L, 1L)))
  }

  test("pavApply: broadcast map, unseen cells stay null") {
    val model = Isotonic.pavFit(
      Seq((1L, 0L), (1L, 1L), (2L, 1L)).toDF("cell", "y"),
      col("cell"), col("y"))
    val scoring = Seq((10L, 1L), (20L, 2L), (30L, 7L)).toDF("id", "cell")
    val out = Isotonic.pavApply(model, scoring, col("cell"))
      .select("id", "calibrated")
      .collect().map(r => r.getLong(0) ->
        Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(out(10L) === Some(0.5) && out(20L) === Some(1.0))
    assert(out(30L).isEmpty) // cell 7 never seen at fit time
    // the model rides a broadcast, never a shuffled join
    val plan = Isotonic.pavApply(model, scoring, col("cell"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      plan.take(600))
  }
}

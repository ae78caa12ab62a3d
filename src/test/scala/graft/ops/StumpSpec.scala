package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StumpSpec extends SparkSpec {
  import spark.implicits._

  private def stump(rows: Seq[(Long, Long, Boolean)])
      : Map[String, (Long, Long, Long, Double, Double)] =
    Stump.giniStump(rows.toDF("x1", "x2", "y"),
        Seq("x1" -> col("x1"), "x2" -> col("x2")), col("y"))
      .collect().map { r =>
        r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5)))
      }.toMap

  test("perfect separator gets the full parent impurity") {
    // x1 separates at 2 exactly; x2 is constant -> no valid split, no row
    val m = stump(Seq((1L, 9L, true), (2L, 9L, true),
      (3L, 9L, false), (4L, 9L, false)))
    val (n, np, thr, gain, parent) = m("x1")
    assert(n === 4L && np === 2L && thr === 2L)
    assert(parent === 0.5 && gain === 0.5)
    assert(!m.contains("x2"), "single-valued feature has no candidate split")
  }

  test("pure label: all gains zero, smallest threshold wins the tie") {
    val (_, np, thr, gain, parent) =
      stump(Seq((5L, 1L, true), (7L, 2L, true), (9L, 3L, true)))("x1")
    assert(np === 3L && parent === 0.0 && gain === 0.0)
    assert(thr === 5L, "tie on gain breaks to the smallest threshold")
  }

  test("matches brute-force threshold scan on a random workload") {
    val rng = new scala.util.Random(13)
    val rows = (1 to 300).map { _ =>
      val x = rng.nextInt(25).toLong
      (x, rng.nextInt(8).toLong, x + rng.nextInt(10) > 18)
    }
    val got = stump(rows)
    def gini(p: Long, n: Long): Double = {
      val pr = p.toDouble / n
      1.0 - pr * pr - (1.0 - pr) * (1.0 - pr)
    }
    for ((name, pick) <- Seq[(String, ((Long, Long, Boolean)) => Long)](
        "x1" -> (_._1), "x2" -> (_._2))) {
      val xs = rows.map(r => (pick(r), r._3))
      val n = xs.size.toLong
      val np = xs.count(_._2).toLong
      val best = xs.map(_._1).distinct.sorted.dropRight(1).map { v =>
        val left = xs.filter(_._1 <= v)
        val (nl, pl) = (left.size.toLong, left.count(_._2).toLong)
        val g = gini(np, n) -
          (nl.toDouble / n) * gini(pl, nl) -
          ((n - nl).toDouble / n) * gini(np - pl, n - nl)
        (math.floor(g * 1e12 + 0.5).toLong, v)
      }.sortBy { case (g, v) => (-g, v) }.head
      val (gn, gnp, thr, gain, _) = got(name)
      assert(gn === n && gnp === np)
      assert(thr === best._2, s"$name threshold")
      assert(math.floor(gain * 1e12 + 0.5).toLong === best._1, s"$name gain")
    }
  }

  test("listwise null handling and bit determinism under repartitioning") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rng = new scala.util.Random(17)
    val rows = (1 to 200).map(i => Row(
      if (i % 11 == 0) null else java.lang.Long.valueOf(rng.nextInt(20).toLong),
      java.lang.Long.valueOf(rng.nextInt(5).toLong),
      java.lang.Boolean.valueOf(i % 3 == 0)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows),
      StructType(Seq(StructField("x1", LongType, nullable = true),
        StructField("x2", LongType, nullable = true),
        StructField("y", BooleanType, nullable = true))))
    def run(p: Int) = Stump.giniStump(df.repartition(p),
        Seq("x1" -> col("x1"), "x2" -> col("x2")), col("y"))
      .collect().map(_.toSeq.map {
        case d: Double => java.lang.Double.doubleToLongBits(d)
        case v => v
      }).sortBy(_.mkString("|")).toSeq
    val a = run(1)
    assert(a === run(5))
    // null x1 rows dropped listwise: both features see the same n
    val ns = Stump.giniStump(df, Seq("x1" -> col("x1"), "x2" -> col("x2")),
      col("y")).select("n").distinct().collect()
    assert(ns.length === 1)
  }
}

package graft.ops

import graft.SparkSpec

class ChangepointSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential replay of the textbook recursion, scaled by n like the
    * operator: S'_i = max(0, S'_{i-1} + (n·x_i − Σx − ⌊n·κ⌋)).
    */
  private def brute(xs: Seq[Long], slack: Double, threshold: Double)
      : Seq[(Double, Boolean)] = {
    val n = xs.size; val s = xs.sum
    val nk = math.floor(n * slack).toLong; val nh = math.floor(n * threshold).toLong
    var acc = 0L
    xs.map { x =>
      acc = math.max(0L, acc + (x * n - s - nk))
      (acc.toDouble / n, acc > nh)
    }
  }

  private def run(xs: Seq[Long], slack: Double, threshold: Double, parts: Int = 4)
      : Seq[(Double, Boolean)] =
    Changepoint.cusum(
        xs.zipWithIndex.map { case (x, i) => ("g", i.toLong, x) }
          .toDF("g", "t", "v").repartition(parts), "g", "t", "v", slack, threshold)
      .orderBy("t").as[(String, Long, Long, Double, Boolean)]
      .collect().map(r => (r._4, r._5)).toSeq

  test("window scan identity ≡ the sequential max(0, ·) recursion") {
    val xs = Seq[Long](10, 12, 9, 11, 30, 32, 31, 8, 10, 29, 30)
    assert(run(xs, slack = 2.0, threshold = 8.0) === brute(xs, 2.0, 8.0))
  }

  test("a flat series never alarms; a sustained shift alarms and stays up") {
    val flat = Seq.fill(20)(100L)
    assert(run(flat, 1.0, 5.0).forall(r => r._1 == 0.0 && !r._2))
    val shifted = Seq.fill(10)(100L) ++ Seq.fill(10)(120L)
    val alarms = run(shifted, 5.0, 30.0).map(_._2)
    assert(!alarms.take(10).exists(identity)) // quiet before the shift
    assert(alarms.last)                       // latched well after it
    val first = alarms.indexOf(true)
    assert(first >= 10 && alarms.drop(first).forall(identity))
  }

  test("groups independent; partitioning-invariant (integer state)") {
    val rows = (for { g <- Seq("a", "b"); i <- 0 until 50 }
      yield (g, i.toLong, ((i * 37 % 23) + (if (g == "b" && i > 30) 40 else 0)).toLong))
    def go(parts: Int) = Changepoint.cusum(
        rows.toDF("g", "t", "v").repartition(parts), "g", "t", "v", 3.0, 20.0)
      .as[(String, Long, Long, Double, Boolean)].collect().toSet
    assert(go(1) === go(17))
    val bAlarms = go(1).filter(r => r._1 == "b" && r._5)
    assert(bAlarms.nonEmpty && bAlarms.forall(_._2 > 30))
    assert(!go(1).exists(r => r._1 == "a" && r._5))
  }
}

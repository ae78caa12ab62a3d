package graft.ops

import graft.SparkSpec

class CorrelationSpec extends SparkSpec {
  import spark.implicits._

  private def rho(rows: Seq[(String, Long, Long)])
      : Map[String, (Long, Option[Double])] =
    Correlation.groupSpearman(rows.toDF("g", "x", "y"), "g", "x", "y")
      .as[(String, Long, Option[Double])]
      .collect().map { case (g, n, r) => g -> ((n, r)) }.toMap

  test("any strictly monotone map gives rho = 1 exactly, even nonlinear") {
    val rows = (1L to 9L).map(x => ("g", x, x * x * x - 2 * x))
    val (n, r) = rho(rows)("g")
    assert(n === 9L && r === Some(1.0))
  }

  test("strictly decreasing gives rho = -1 exactly") {
    val (_, r) = rho((1L to 7L).map(x => ("g", x, 100 - x * x)))("g")
    assert(r === Some(-1.0))
  }

  test("tie blocks get average ranks (hand-computed)") {
    // x = [1,2,2,3] -> ranks [1, 2.5, 2.5, 4]; y = [10,30,20,40] -> [1,3,2,4]
    val rows = Seq(("g", 1L, 10L), ("g", 2L, 30L), ("g", 2L, 20L), ("g", 3L, 40L))
    val expected = 4.5 / math.sqrt(4.5 * 5.0)
    val (n, r) = rho(rows)("g")
    assert(n === 4L && math.abs(r.get - expected) < 1e-12)
  }

  test("constant column within a group yields null rho") {
    val (n, r) = rho(Seq(("g", 1L, 7L), ("g", 2L, 7L), ("g", 3L, 7L)))("g")
    assert(n === 3L && r.isEmpty)
    val (n2, r2) = rho(Seq(("h", 5L, 1L)))("h")
    assert(n2 === 1L && r2.isEmpty)
  }

  test("groups are independent and null coordinates are dropped") {
    val df = Seq(
      ("a", Some(1L), Some(3L)), ("a", Some(2L), Some(5L)), ("a", None, Some(9L)),
      ("b", Some(1L), Some(9L)), ("b", Some(2L), Some(4L)), ("b", Some(3L), None))
      .toDF("g", "x", "y")
    val out = Correlation.groupSpearman(df, "g", "x", "y")
      .as[(String, Long, Option[Double])].collect().map(t => t._1 -> t).toMap
    assert(out("a")._2 === 2L && out("a")._3 === Some(1.0))
    assert(out("b")._2 === 2L && out("b")._3 === Some(-1.0))
  }

  test("rho is invariant to input partitioning (order-free sums)") {
    val rows = (1L to 200L).map(i => ("g", i % 17, (i * 31) % 23))
    val one = Correlation.groupSpearman(
      rows.toDF("g", "x", "y").repartition(1), "g", "x", "y")
      .as[(String, Long, Option[Double])].collect().head
    val many = Correlation.groupSpearman(
      rows.toDF("g", "x", "y").repartition(13), "g", "x", "y")
      .as[(String, Long, Option[Double])].collect().head
    assert(one === many)
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq.fill(40)("hot") ++ Seq.fill(7)("warm") ++
    (1 to 25).map(i => s"cold$i")

  test("estimates never undercount; wide sketches are exact on this data") {
    val df = rows.toDF("k")
    val truth = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    // wide enough that collisions are unlikely: estimates exactly true
    val sk = CountMin.build(df, "k", depth = 4, width = 4096)
    val est = CountMin.estimate(sk, truth.keys.toSeq.toDF("k"), 4, 4096)
      .as[(String, Long)].collect().toMap
    assert(est === truth)
    // tiny sketch: still never BELOW truth (the one-sided guarantee)
    val sk2 = CountMin.build(df, "k", depth = 2, width = 4)
    val est2 = CountMin.estimate(sk2, truth.keys.toSeq.toDF("k"), 2, 4)
      .as[(String, Long)].collect().toMap
    assert(truth.forall { case (k, n) => est2(k) >= n })
  }

  test("cell mass: every sketch row sums to the total increment count") {
    val sk = CountMin.build(rows.toDF("k"), "k", depth = 3, width = 16)
    val perRow = sk.groupBy("row").agg(sum("c").as("m"))
      .as[(Int, Long)].collect().toMap
    assert(perRow === Map(0 -> rows.size.toLong, 1 -> rows.size.toLong,
      2 -> rows.size.toLong))
  }

  test("merge of two halves equals the sketch of the whole") {
    val (h1, h2) = rows.splitAt(30)
    val whole = CountMin.build(rows.toDF("k"), "k", 4, 64)
      .as[(Int, Long, Long)].collect().toSet
    val merged = CountMin.merge(
        CountMin.build(h1.toDF("k"), "k", 4, 64),
        CountMin.build(h2.toDF("k"), "k", 4, 64))
      .as[(Int, Long, Long)].collect().toSet
    assert(merged === whole)
  }

  test("deterministic across partitionings; unknown keys estimate small, not negative") {
    val a = CountMin.build(rows.toDF("k"), "k", 3, 32)
      .as[(Int, Long, Long)].collect().toSet
    val b = CountMin.build(rows.toDF("k").repartition(11), "k", 3, 32)
      .as[(Int, Long, Long)].collect().toSet
    assert(a === b)
    val est = CountMin.estimate(CountMin.build(rows.toDF("k"), "k", 4, 4096),
        Seq("never-seen").toDF("k"), 4, 4096)
      .as[(String, Long)].collect().toMap
    assert(est("never-seen") === 0L)
  }
}

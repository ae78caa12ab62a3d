package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KLL quantile-sketch tier: while total n ≤ k the sketch retains every
  * value (exact mode, no randomized compaction), so merge ≡ direct ≡
  * exact holds BIT-exactly and the tests can pin values; one larger
  * fixture exercises compaction and asserts the published rank-error
  * band the oracle queries gate on.
  */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private def estMap(df: org.apache.spark.sql.DataFrame): Map[(String, Double), Double] =
    df.select(col("g"), col("prob"), col("approx_q"))
      .as[(String, Double, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap

  test("exact mode: fine sketches roll up to exact quantiles (n <= k)") {
    // two cells per group, 50 values each — total 100 < k=200, so the
    // merged sketch holds every value and INCLUSIVE quantiles are exact
    val rows = (1 to 100).map(i => ("a", if (i <= 50) "c1" else "c2", i.toDouble)) ++
      (1 to 100).map(i => ("b", if (i % 2 == 0) "c1" else "c2", (i * 10).toDouble))
    val fine = QuantileSketch.fineSketches(
      rows.toDF("g", "cell", "v").repartition(5), Seq("g", "cell"), "v")
    assert(fine.count() === 4)
    val got = estMap(QuantileSketch.quantiles(
      QuantileSketch.rollup(fine, Seq("g")), Seq(0.5, 0.99, 1.0)))
    assert(got(("a", 0.5)) === 50.0)   // rank ceil(0.5*100)=50
    assert(got(("a", 0.99)) === 99.0)
    assert(got(("a", 1.0)) === 100.0)
    assert(got(("b", 0.5)) === 500.0)
    assert(got(("b", 1.0)) === 1000.0)
  }

  test("merged store+delta equals the direct sketch in exact mode") {
    val rows = (1 to 120).map(i => ("g1", s"d${i % 4}", i.toDouble))
    val fine = QuantileSketch.fineSketches(
      rows.toDF("g", "cell", "v"), Seq("g", "cell"), "v")
    val store = QuantileSketch.rollup(
      fine.filter(col("cell").isin("d0", "d2")), Seq("g"))
    val delta = QuantileSketch.rollup(
      fine.filter(col("cell").isin("d1", "d3")), Seq("g"))
    val merged = QuantileSketch.quantiles(
      QuantileSketch.mergeStores(store, delta, Seq("g")), Seq(0.25, 0.5, 0.75))
    val direct = QuantileSketch.quantiles(
      QuantileSketch.rollup(fine, Seq("g")), Seq(0.25, 0.5, 0.75))
    assert(estMap(merged) === estMap(direct))
    assert(merged.select("n").as[Long].collect().toSet === Set(120L))
  }

  test("mergeStores passes through one-sided keys") {
    val fine = QuantileSketch.fineSketches(
      (1 to 20).map(i => (if (i <= 10) "only_store" else "only_delta", i.toDouble))
        .toDF("g", "v"), Seq("g"), "v")
    val store = fine.filter(col("g") === "only_store")
    val delta = fine.filter(col("g") === "only_delta")
    val got = estMap(QuantileSketch.quantiles(
      QuantileSketch.mergeStores(store, delta, Seq("g")), Seq(1.0)))
    assert(got(("only_store", 1.0)) === 10.0)
    assert(got(("only_delta", 1.0)) === 20.0)
  }

  test("compaction mode honors the published rank-error band") {
    // 20k distinct values >> k=200 forces compaction; the estimate's
    // true rank must sit within the (doubled) published band — the
    // exact contract the oracle queries' within_bound flag states
    val n = 20000
    val fine = QuantileSketch.fineSketches(
      (1 to n).map(i => ("g", i.toDouble)).toDF("g", "v").repartition(8),
      Seq("g"), "v")
    val eps = QuantileSketch.normalizedRankError(200)
    val est = estMap(QuantileSketch.quantiles(fine, Seq(0.1, 0.5, 0.9)))
    Seq(0.1, 0.5, 0.9).foreach { p =>
      val v = est(("g", p))
      assert(math.abs(v / n - p) <= 2 * eps + 1.0 / n,
        s"p=$p estimate $v outside band")
    }
    assert(eps > 0 && eps < 0.05)
  }

  test("null values are filtered before sketching") {
    val df = Seq(("g", Some(1.0)), ("g", None), ("h", None)).toDF("g", "v")
    val fine = QuantileSketch.fineSketches(df, Seq("g"), "v")
    val rows = QuantileSketch.quantiles(fine, Seq(1.0))
      .select(col("g"), col("n"), col("approx_q"))
      .as[(String, Long, Option[Double])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(rows("g") === ((1L, Some(1.0))))
    assert(!rows.contains("h")) // an all-null cell never materializes
  }
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class HistogramQuantileSpec extends SparkSpec {
  import spark.implicits._

  test("batch: estimate within one bin width of the exact quantile") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val est = li.select(HistogramQuantile.quantile(col("l_quantity"), 0, 60, 120, 0.5).as("m"))
      .head().getDouble(0)
    val exact = li.selectExpr("percentile(l_quantity, 0.5)").head().getDouble(0)
    assert(math.abs(est - exact) <= 0.5 + 1e-9) // bin width 0.5
  }

  test("partitioning-independent (associative merge)") {
    val vals = (1 to 1000).map(_.toDouble).toDF("x")
    val a = vals.repartition(13).select(HistogramQuantile.quantile(col("x"), 0, 1000, 100, 0.9)).head().getDouble(0)
    val b = vals.coalesce(1).select(HistogramQuantile.quantile(col("x"), 0, 1000, 100, 0.9)).head().getDouble(0)
    assert(a === b)
  }

  test("NaN values are skipped, not counted as the lowest bin") {
    val vals = ((1 to 100).map(_.toDouble) ++ Seq(Double.NaN, Double.NaN)).toDF("x")
    val withNaN = vals.select(HistogramQuantile.quantile(col("x"), 0, 100, 100, 0.5)).head().getDouble(0)
    val clean = (1 to 100).map(_.toDouble).toDF("x")
      .select(HistogramQuantile.quantile(col("x"), 0, 100, 100, 0.5)).head().getDouble(0)
    assert(withNaN === clean)
    // all-NaN input → NaN (empty sketch), not bin-0 midpoint
    val allNaN = Seq(Double.NaN).toDF("x")
      .select(HistogramQuantile.quantile(col("x"), 0, 100, 100, 0.5)).head().getDouble(0)
    assert(allNaN.isNaN)
  }

  test("streaming: usable as a stateful aggregate per group") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Double)]
    val agg = in.toDF().toDF("k", "v")
      .groupBy("k")
      .agg(HistogramQuantile.quantile(col("v"), 0, 100, 50, 0.5).as("median_est"))
    val q = agg.writeStream.format("memory").queryName("hq").outputMode("complete").start()
    in.addData(("a", 10.0), ("a", 20.0), ("a", 30.0), ("b", 90.0))
    q.processAllAvailable()
    in.addData(("a", 40.0), ("a", 50.0))
    q.processAllAvailable()
    val out = spark.table("hq").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    q.stop()
    // median of a:{10,20,30,40,50} ≈ 30 (±1 bin), state carried across batches
    assert(math.abs(out("a") - 30.0) <= 2.0 + 1e-9)
    assert(math.abs(out("b") - 90.0) <= 2.0 + 1e-9)
  }
}

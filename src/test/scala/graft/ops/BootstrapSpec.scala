package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  test("cdf thresholds are the Poisson(1) CDF; weights replay in scala") {
    val t = Bootstrap.cdfThresholds
    assert(t.size === 8)
    assert(math.abs(t.head - math.exp(-1.0)) < 1e-15)
    assert(math.abs(t(1) - 2 * math.exp(-1.0)) < 1e-15)
    assert(t.last > 0.9999 && t.last < 1.0)
    assert(t === t.sorted)
  }

  test("weights are deterministic, Poisson-shaped, and mean ≈ 1") {
    val rows = (1L to 4000L).toDF("k")
    val w = rows.select(col("k"),
        Bootstrap.poissonWeight(col("k"), lit(0L)).as("w"))
      .as[(Long, Long)].collect().toMap
    // deterministic replay
    val w2 = rows.repartition(7).select(col("k"),
        Bootstrap.poissonWeight(col("k"), lit(0L)).as("w"))
      .as[(Long, Long)].collect().toMap
    assert(w === w2)
    val mean = w.values.sum.toDouble / w.size
    assert(math.abs(mean - 1.0) < 0.06, s"mean=$mean")   // CLT bound
    val p0 = w.values.count(_ == 0).toDouble / w.size
    assert(math.abs(p0 - math.exp(-1.0)) < 0.03, s"p0=$p0")
    // replicas are independent draws: replica 1 differs from replica 0
    val w1 = rows.select(col("k"),
        Bootstrap.poissonWeight(col("k"), lit(1L)).as("w"))
      .as[(Long, Long)].collect().toMap
    assert(w.exists { case (k, v) => w1(k) != v })
  }

  test("meanCI: interval brackets the estimate and covers the true mean on iid data") {
    val rng = new scala.util.Random(17)
    val rows = (1L to 2000L).map(k => ("g", k, 100L + rng.nextInt(41) - 20))
      .toDF("g", "k", "v")
    val r = Bootstrap.meanCI(rows, "g", "v", "k", b = 40).collect().head
    val est = r.getDouble(2); val lo = r.getDouble(3); val hi = r.getDouble(4)
    assert(r.getLong(1) === 2000L)
    assert(lo <= est && est <= hi, s"[$lo, $hi] vs $est")
    assert(hi - lo > 0 && hi - lo < 4.0) // σ≈11.8/√2000 ≈ 0.26 per side ×2·1.96
    // degenerate data: zero-width interval at the constant
    val const = (1L to 50L).map(k => ("c", k, 7L)).toDF("g", "k", "v")
    val rc = Bootstrap.meanCI(const, "g", "v", "k", b = 8).collect().head
    assert(rc.getDouble(2) === 7.0 && rc.getDouble(3) === 7.0 && rc.getDouble(4) === 7.0)
  }

  test("meanCI is partitioning-invariant (bit-exact on integer values)") {
    val rows = (1L to 500L).map(k => (s"g${k % 2}", k, k % 13)).toDF("g", "k", "v")
    def run(p: Int) = Bootstrap.meanCI(rows.repartition(p), "g", "v", "k", b = 16)
      .collect().map(r => (r.getString(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        java.lang.Double.doubleToLongBits(r.getDouble(3)),
        java.lang.Double.doubleToLongBits(r.getDouble(4)))).toSet
    assert(run(1) === run(11))
  }

  test("medianCI: est is the lower median; CI brackets it; all integers") {
    // skewed data: median 10, whale tail — the case meanCI mis-describes
    val rows = ((1L to 900L).map(k => ("g", k, 10L + (k % 3))) ++
      (901L to 1000L).map(k => ("g", k, 100000L))).toDF("g", "k", "v")
    val r = Bootstrap.medianCI(rows, "g", "v", "k", b = 16).collect().head
    assert(r.getLong(1) === 1000L)
    val est = r.getLong(2); val lo = r.getLong(3); val hi = r.getLong(4)
    assert(est === 11L, "lower median of 900×{10,11,12} + 100 whales")
    assert(lo <= est && est <= hi)
    assert(lo >= 10L && hi <= 12L, "whales cannot reach the median's CI")
  }

  test("medianCI: constant data gives a zero-width interval") {
    val rows = (1L to 60L).map(k => ("c", k, 42L)).toDF("g", "k", "v")
    val r = Bootstrap.medianCI(rows, "g", "v", "k", b = 8).collect().head
    assert(r.getLong(2) === 42L && r.getLong(3) === 42L && r.getLong(4) === 42L)
  }

  test("medianCI is partitioning-invariant (fully integral output)") {
    val rows = (1L to 400L).map(k => (s"g${k % 2}", k, k % 17)).toDF("g", "k", "v")
    def run(p: Int) = Bootstrap.medianCI(rows.repartition(p), "g", "v", "k", b = 12)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(run(1) === run(11))
  }
}

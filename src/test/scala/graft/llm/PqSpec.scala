package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  // 8-dim vectors on the exact 0.001 grid; ids 0-3 are the seeds (k=4),
  // each with a distinct signature per 4-dim subspace
  private def vec(a: Double, b: Double): Seq[Float] =
    (Seq.fill(4)(a) ++ Seq.fill(4)(b)).map(_.toFloat)

  private lazy val corpus = Seq(
    (0L, vec(0.0, 0.0)),
    (1L, vec(1.0, 0.0)),
    (2L, vec(0.0, 1.0)),
    (3L, vec(1.0, 1.0)),
    (4L, vec(0.002, 0.001)),  // nearest codes: (0, 0)
    (5L, vec(0.998, 0.999)),  // nearest codes: (1, 1)
    (6L, vec(0.6, 0.4))       // nearer 1 in sub0 (0.4<0.6), nearer 0 in sub1
  ).toDF("vec_id", "embedding")

  private lazy val dfq = KMeans.quantized(corpus, "vec_id", "embedding")
  private lazy val cbs = Pq.seedCodebooks(dfq, "vec_id", m = 2, k = 4)

  test("codebooks: m subspaces x k codes of d/m integer dims, from lowest ids") {
    assert(cbs.size === 2 && cbs.forall(_.size === 4))
    assert(cbs.forall(_.forall(_.length === 4)))
    // seed 1 = (1.0 x4, 0.0 x4) on the x1000 grid
    assert(cbs(0)(1).toSeq === Seq(1000L, 1000L, 1000L, 1000L))
    assert(cbs(1)(1).toSeq === Seq(0L, 0L, 0L, 0L))
  }

  test("encode: seeds take their own code; near vectors snap to the nearest; " +
      "subspaces decide independently") {
    val codes = Pq.encode(dfq, "vec_id", cbs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // the seed set has duplicate subspace entries (e.g. seeds 0 and 2
    // share the all-zero sub0), so exact-0 ties snap to the LOWER code:
    // sub0 zeros → code 0, sub0 ones → code 1, sub1 zeros → code 0
    // (seeds 0,1), sub1 ones → code 2 (seeds 2,3)
    assert(codes(0L) === Seq(0, 0))
    assert(codes(1L) === Seq(1, 0))
    assert(codes(2L) === Seq(0, 2))
    assert(codes(3L) === Seq(1, 2))
    assert(codes(4L) === Seq(0, 0))
    assert(codes(5L) === Seq(1, 2))
    assert(codes(6L) === Seq(1, 0)) // 0.6 → code 1 in sub0; 0.4 → code 0 in sub1
  }

  test("ADC is the exact integer sum of per-subspace distances to the " +
      "neighbor's reconstruction") {
    val res = Pq.adcTopK(dfq, "vec_id", Pq.encode(dfq, "vec_id", cbs), cbs,
        topK = 10, queryPred = col("vec_id") === 4L)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    // query 4 = (0.002 x4, 0.001 x4) → grid (2 x4, 1 x4)
    // vs neighbor 0 (codes 0,0 → reconstruction all zeros): 4*2² + 4*1² = 20
    assert(res(0L) === 20L)
    // vs neighbor 5 (codes 1,2 → (1000 x4, 1000 x4)):
    // 4*(998)² + 4*(999)² = 4*996004 + 4*998001
    assert(res(5L) === 4L * 996004L + 4L * 998001L)
    // neighbor 6 encodes to (1, 0) → same reconstruction as seed 1: equal adc
    assert(res(6L) === res(1L))
  }

  test("ranking: ties break to the lower neighbor id; self excluded; " +
      "repartitioning does not change the result") {
    val enc = Pq.encode(dfq, "vec_id", cbs)
    val a = Pq.adcTopK(dfq, "vec_id", enc, cbs, topK = 3,
        queryPred = col("vec_id") < 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(a.nonEmpty)
    assert(!a.exists(t => t._1 == t._2), "self-pair leaked into top-k")
    // neighbors 1 and 6 reconstruct identically for any query → adjacent
    // ranks with the lower id first whenever both appear
    val q0 = a.filter(_._1 == 0L).toSeq.sortBy(_._4)
    val pos1 = q0.indexWhere(_._2 == 1L); val pos6 = q0.indexWhere(_._2 == 6L)
    if (pos1 >= 0 && pos6 >= 0) assert(pos1 < pos6)
    val b = Pq.adcTopK(KMeans.quantized(corpus.repartition(7), "vec_id", "embedding"),
        "vec_id", enc, cbs, topK = 3, queryPred = col("vec_id") < 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(a === b)
  }

  test("indivisible dims are rejected") {
    intercept[IllegalArgumentException] {
      Pq.seedCodebooks(dfq, "vec_id", m = 3, k = 4)
    }
  }

  test("IVF-PQ with a full probe list is exactly PQ/ADC; a narrow probe " +
      "returns a subset from the probed cells only") {
    val seeds = KMeans.seedCentroids(dfq, "vec_id", 4)
    val coarse = KMeans.assign(dfq, "vec_id", seeds).select(col("vec_id"), col("cell"))
    val enc = Pq.encode(dfq, "vec_id", cbs)
    val full = Pq.adcTopK(dfq, "vec_id", enc, cbs, topK = 10,
        queryPred = col("vec_id") < 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val allProbe = Pq.ivfAdcTopK(dfq, "vec_id", coarse, enc, cbs, topK = 10,
        Pq.routeCells(dfq, "vec_id", seeds, nProbe = 4, col("vec_id") < 2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(allProbe === full, "probing every cell must reproduce brute ADC")
    val narrow = Pq.ivfAdcTopK(dfq, "vec_id", coarse, enc, cbs, topK = 10,
        Pq.routeCells(dfq, "vec_id", seeds, nProbe = 1, col("vec_id") < 2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(narrow.nonEmpty)
    assert(narrow.subsetOf(full.map(t => (t._1, t._2, t._3))),
      "pruned search surfaced a pair brute ADC did not score")
  }
}

package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = graft.Tables.embeddings(spark, sf).cache()

  test("cosine of a vector with itself is 1 (normalized corpus)") {
    val c = emb.limit(5)
      .select(Similarity.cosine(col("embedding"), col("embedding")).as("c"))
      .collect().map(_.getDouble(0))
    c.foreach(v => assert(math.abs(v - 1.0) < 1e-9))
  }

  test("brute-force top-k: k rows per query, descending, self excluded") {
    val q = emb.filter(col("vec_id") < 3)
    val res = Similarity.bruteForceTopK(q, emb, k = 5).collect()
    assert(res.length === 15)
    res.groupBy(_.getAs[Long]("query_id")).foreach { case (qid, rows) =>
      assert(rows.forall(_.getAs[Long]("neighbor_id") != qid))
      val cosines = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cosine"))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
    }
  }

  test("mutual nearest neighbors: bidirectional top-1 only, canonical, once") {
    // hand graph: 1↔2 mutual; 3's top-1 is 1 but 1's is 2 → 3 excluded
    val ranked = Seq(
      (1L, 2L, 1L), (1L, 3L, 2L),
      (2L, 1L, 1L), (2L, 3L, 2L),
      (3L, 1L, 1L), (3L, 2L, 2L),
      (4L, 5L, 1L), (5L, 4L, 1L)
    ).toDF("query_id", "neighbor_id", "rank")
    val got = Similarity.mutualNearest(ranked)
      .as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L), (4L, 5L)))
    // on the real corpus: every emitted pair is bidirectional-top-1
    val t1 = Similarity.bruteForceTopK(emb, emb, k = 1)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toMap
    val mnn = Similarity.mutualNearest(Similarity.bruteForceTopK(emb, emb, k = 1))
      .as[(Long, Long)].collect()
    assert(mnn.nonEmpty)
    mnn.foreach { case (a, b) =>
      assert(a < b && t1(a) == b && t1(b) == a)
    }
    // completeness: every bidirectional top-1 pair is emitted
    val expected = t1.collect { case (a, b) if a < b && t1.get(b).contains(a) => (a, b) }.toSet
    assert(mnn.toSet === expected)
  }

  test("top-1 aggregate fast path == window form (round-15 optimization)") {
    // the k=1 branch replaces the row_number window with max(struct);
    // both must pick the identical (cosine DESC, neighbor_id ASC) winner,
    // including on exact-tie cosines (replicated vectors below)
    val base = emb.select(col("vec_id"), col("embedding"))
    val dup = base.limit(4).select((col("vec_id") + 100000).as("vec_id"),
      col("embedding"))
    val corpus = base.unionByName(dup)
    val viaAgg = Similarity.bruteForceTopK(corpus, corpus, k = 1)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
      .map { case (q, n, c) => q -> ((n, c)) }.toMap
    // window reference: force the general branch with k=2 and keep rank 1
    val viaWin = Similarity.bruteForceTopK(corpus, corpus, k = 2)
      .filter(col("rank") === 1)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
      .map { case (q, n, c) => q -> ((n, c)) }.toMap
    assert(viaAgg.keySet === viaWin.keySet)
    viaAgg.foreach { case (q, (n, c)) =>
      assert(viaWin(q)._1 === n, s"query $q winner diverged")
      assert(viaWin(q)._2 === c)
    }
  }

  test("hard negatives: band respected, equals band-filtered brute force") {
    val q = emb.filter(col("vec_id") < 3)
    val got = Similarity.hardNegatives(q, emb, k = 5, loCos = 0.2, hiCos = 0.9)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cosine"), r.getAs[Long]("rank")))
    assert(got.nonEmpty)
    assert(got.forall { case (_, _, c, _) => c >= 0.2 && c < 0.9 })
    // reference: rank the full brute-force scoring inside the band
    val all = Similarity.bruteForceTopK(q, emb, k = Int.MaxValue).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cosine")))
    val ref = all.filter { case (_, _, c) => c >= 0.2 && c < 0.9 }
      .groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
        rows.sortBy { case (_, nid, c) => (-c, nid) }.take(5).zipWithIndex
          .map { case ((_, nid, c), i) => (qid, nid, c, (i + 1).toLong) }
      }
    assert(got.sortBy(t => (t._1, t._4)) === ref.sortBy(t => (t._1, t._4)))
  }

  test("lsh buckets: deterministic, same vector → same bucket, 2^planes max") {
    val signs = Similarity.hyperplaneSigns(4, 64)
    assert(signs === Similarity.hyperplaneSigns(4, 64)) // deterministic
    val buckets = emb.select(Similarity.lshBucket(col("embedding"), signs).as("b"))
    assert(buckets.distinct().count() <= 16)
    assert(buckets.filter(length(col("b")) =!= 4).count() === 0)
  }

  test("lsh top-k is a subset-quality approximation of brute force") {
    val q = emb.filter(col("vec_id") < 3)
    val brute = Similarity.bruteForceTopK(q, emb, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(q, emb, k = 3, planes = 1, dims = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // near-uniform random embeddings are ANN's worst case; with 1 plane a
    // true top-3 neighbor should still usually share the query's half-space
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall >= 0.4, s"recall $recall")
    assert(lsh.subsetOf(Similarity.bruteForceTopK(q, emb, k = 500).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet))
  }

  test("ivf: centroid table has one row per cell; topk routes via cells") {
    val cells = Similarity.centroids(emb, "label")
    assert(cells.count() === emb.select("label").distinct().count())
    val dim = cells.select(size(col("centroid")).as("d")).head().getInt(0)
    assert(dim === 64)
    val q = emb.filter(col("vec_id") < 2)
    val res = Similarity.ivfTopK(q, emb.withColumnRenamed("label", "cell"), cells, k = 3, nProbe = 3)
    assert(res.count() === 6)
    // with nProbe = all cells, IVF degrades to exact brute force
    val all = Similarity.ivfTopK(q, emb.withColumnRenamed("label", "cell"), cells, k = 3, nProbe = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteForceTopK(q, emb, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(all === brute)
  }

  test("quantized cosine approximates exact cosine; picked neighbors are near-optimal") {
    // NOTE: the synthetic corpus has razor-thin cosine margins (near-tied
    // neighbors), so top-k IDENTITY vs the exact tier is not a meaningful
    // bar; the guarantee that matters is approximation error.
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter(col("vec_id") < 5)
    val exactAll = Similarity.bruteForceTopK(q, emb, k = 100000)
      .select("query_id", "neighbor_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val quantTop = Similarity.quantizedTopK(q, emb, k = 1)
      .select("query_id", "neighbor_id", "qcos").collect()
    assert(quantTop.nonEmpty)
    val bestExact = exactAll.groupBy(_._1._1).view.mapValues(_.values.max).toMap
    quantTop.foreach { r =>
      val (qid, nid, qcos) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      // quantized score is a close approximation of that pair's exact cosine
      assert(math.abs(qcos - exactAll((qid, nid))) < 0.02,
        s"approximation error too large at ($qid,$nid)")
      // and the chosen neighbor's TRUE cosine is near the true optimum
      assert(exactAll((qid, nid)) >= bestExact(qid) - 0.02,
        s"quantized pick for $qid is far from optimal")
    }
  }

  test("quantized top-k drops zero vectors instead of ranking their NaN cosine first") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array.fill(4)(0.0f)),
      (1L, Array(1.0f, 0.5f, 0.2f, 0.1f)),
      (2L, Array(0.9f, 0.6f, 0.1f, 0.2f)),
      (3L, Array(-1.0f, 0.4f, 0.3f, 0.0f))
    ).toDF("vec_id", "embedding")
    val res = Similarity.quantizedTopK(vecs.filter(col("vec_id") === 1), vecs, k = 2).collect()
    assert(res.nonEmpty)
    res.foreach { r =>
      assert(r.getLong(1) !== 0L, "all-zero vector must not appear as a neighbor")
      assert(!r.getDouble(2).isNaN, "NaN cosine leaked into the ranking")
    }
  }

  test("embedding near-dup buckets past the cap fall back to the join path unchanged") {
    // a tiny cap forces most buckets through the self-join path; the
    // result set must be identical to the uncapped in-array run
    def run(cap: Int) = Similarity.cosineNearDupPairs(emb, planes = 3, dims = 16,
        topK = 25, bucketCap = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e9)))
      .toSet
    assert(run(2) === run(100000))
    assert(run(2).nonEmpty)
  }

  test("semantic dedup: near-identical groups collapse to min id, distant rows survive") {
    // two tight direction-groups plus two isolated directions; within a
    // group cosine ≈ 1 (same LSH bucket by construction), across groups
    // well below the threshold
    def v(base: Array[Float], wiggle: Float) =
      base.zipWithIndex.map { case (x, i) => if (i == 3) x + wiggle else x }
    val a = Array(1.0f, 0.2f, 0.1f, 0.05f, 0.3f, 0.0f, 0.1f, 0.2f)
    val b = Array(-0.8f, 0.9f, -0.3f, 0.1f, -0.2f, 0.4f, -0.5f, 0.3f)
    val rows = Seq(
      10L -> v(a, 0f), 11L -> v(a, 0.01f), 12L -> v(a, 0.02f), // group A
      20L -> v(b, 0f), 21L -> v(b, 0.01f),                     // group B
      30L -> Array(0.0f, 0.0f, 1.0f, -1.0f, 0.0f, 0.5f, 0.9f, -0.4f),
      31L -> Array(0.1f, -1.0f, 0.0f, 0.3f, 0.8f, -0.7f, 0.0f, 0.6f)
    ).map { case (id, arr) => (id, arr) }.toDF("vec_id", "embedding")
    val survivors = Similarity.semanticDedup(rows, planes = 4, dims = 8, minCosine = 0.95)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(survivors === Set(10L, 20L, 30L, 31L))
    // survivors keep the full row shape (corpus minus dropped ids)
    val cols = Similarity.semanticDedup(rows, planes = 4, dims = 8, minCosine = 0.95).columns
    assert(cols.toSeq === Seq("vec_id", "embedding"))
    // a threshold nothing reaches drops nothing
    val none = Similarity.semanticDedup(rows, planes = 4, dims = 8, minCosine = 1.1)
      .count()
    assert(none === 7L)
  }

  test("int8 quantization: codes in range, error bounded by scale/2, dequantize inverts") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = Similarity.quantizeInt8(col("embedding"))
    val rows = emb.select(
        Similarity.asDouble(col("embedding")).as("v"), col("vec_id"), q.as("q"))
      .select(col("vec_id"), col("q.scale").as("s"),
        array_max(col("q.codes")).as("mx"), array_min(col("q.codes")).as("mn"),
        aggregate(zip_with(col("v"), Similarity.dequantizeInt8(col("q")),
          (a, b) => abs(a - b)), lit(0.0), (acc, e) => greatest(acc, e)).as("max_err"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= 127L && r.getLong(3) >= -127L, "codes out of int8 range")
      assert(r.getDouble(4) <= r.getDouble(1) / 2 + 1e-12, "reconstruction error above scale/2")
    }
  }

  test("recallAtK: exact overlap fractions, absent queries score 0") {
    import spark.implicits._
    val truth = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (2L, 21L),
      (3L, 30L)).toDF("query_id", "neighbor_id")
    val approx = Seq((1L, 10L), (1L, 12L), (1L, 99L), (2L, 22L))
      .toDF("query_id", "neighbor_id")
    val got = Similarity.recallAtK(truth, approx)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) === ((3L, 2L, 2.0 / 3.0)))   // 10,12 found; 99 is noise
    assert(got(2L) === ((2L, 0L, 0.0)))          // wrong neighbor
    assert(got(3L) === ((1L, 0L, 0.0)))          // query absent from approx
    // identical lists → recall 1 everywhere
    Similarity.recallAtK(truth, truth).collect()
      .foreach(r => assert(r.getDouble(3) === 1.0))
  }
}

class JlProjectSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private val dims = 8

  test("one-hot vectors read the sign matrix back (scala replay)") {
    val signs = Similarity.hyperplaneSigns(4, dims)
    val rows = (0 until dims).map { i =>
      (i.toLong, Array.tabulate(dims)(j => if (j == i) 1.0f else 0.0f))
    }
    val out = Similarity.jlProject(rows.toDF("vec_id", "embedding"),
        "embedding", outDims = 4, dims = dims)
      .select("vec_id", "proj").as[(Long, Array[Double])]
      .collect().toMap
    for (i <- 0 until dims; p <- 0 until 4)
      assert(out(i.toLong)(p) === signs(p)(i) / 2.0, s"dim $i plane $p")
  }

  test("projection is linear: f(2v) = 2 f(v) up to float widening") {
    val v = Array.tabulate(dims)(j => (j + 1).toFloat / 10)
    val v2 = v.map(_ * 2)
    val out = Similarity.jlProject(
        Seq((1L, v), (2L, v2)).toDF("vec_id", "embedding"),
        "embedding", outDims = 4, dims = dims)
      .select("vec_id", "proj").as[(Long, Array[Double])].collect().toMap
    out(1L).zip(out(2L)).foreach { case (a, b) =>
      assert(math.abs(b - 2 * a) < 1e-9)
    }
  }

  test("distance ratios concentrate near 1 on a gaussian-ish workload") {
    val rng = new scala.util.Random(13)
    val rows = (0 until 30).map(i =>
      (i.toLong, Array.fill(64)((rng.nextGaussian()).toFloat)))
    val proj = Similarity.jlProject(rows.toDF("vec_id", "embedding"),
        "embedding", outDims = 16, dims = 64)
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"),
        col("proj"))
    val a = proj.select(col("vec_id").as("ai"), col("v").as("av"), col("proj").as("ap"))
    val b = proj.select(col("vec_id").as("bi"), col("v").as("bv"), col("proj").as("bp"))
    val ratios = a.join(b, col("ai") < col("bi"))
      .select((Similarity.sqDist(col("ap"), col("bp")) /
        Similarity.sqDist(col("av"), col("bv"))).as("r"))
      .as[Double].collect()
    assert(ratios.length === 435)
    // E[ratio] = 1; JL at k=16 keeps most pairs within a broad band
    val mean = ratios.sum / ratios.length
    assert(mean > 0.8 && mean < 1.2, s"mean ratio $mean")
    assert(ratios.count(r => r > 0.3 && r < 2.2).toDouble / ratios.length > 0.95)
  }

  test("bit determinism under repartitioning (derivation, not data)") {
    val rng = new scala.util.Random(23)
    val rows = (0 until 40).map(i => (i.toLong, Array.fill(16)(rng.nextFloat())))
    val df = rows.toDF("vec_id", "embedding")
    def bits(p: Int) = Similarity.jlProject(df.repartition(p), "embedding", 4, 16)
      .select("vec_id", "proj").as[(Long, Array[Double])].collect()
      .sortBy(_._1).map { case (id, arr) => (id, arr.toSeq.map(java.lang.Double.doubleToLongBits)) }.toSeq
    assert(bits(1) === bits(9))
  }

  test("centroidDrift: identical slices cos 1 / L2 0; axis shift registers") {
    import org.apache.spark.sql.functions.col
    // both slices share the same two vectors -> identical centroids
    val same = Seq((0L, Seq(10L, 0L)), (1L, Seq(10L, 0L)),
      (2L, Seq(0L, 10L)), (3L, Seq(0L, 10L))).toDF("vec_id", "xq")
    val r0 = Similarity.centroidDrift(same, "vec_id", col("vec_id") % 2 === 0)
      .collect().head
    assert(r0.getLong(0) === 2L && r0.getLong(1) === 2L)
    // 1e-12-grid truncation of the dot/norm terms leaves the identity
    // cosine an ulp shy of exactly 1.0 — deterministic, just not 1
    assert(math.abs(r0.getDouble(2) - 1.0) < 1e-12)
    assert(r0.getDouble(3) === 0.0)
    // slice B rotates onto the other axis: centroids (10,0) vs (0,10)
    val rot = Seq((0L, Seq(10L, 0L)), (1L, Seq(0L, 10L))).toDF("vec_id", "xq")
    val r1 = Similarity.centroidDrift(rot, "vec_id", col("vec_id") % 2 === 0)
      .collect().head
    assert(math.abs(r1.getDouble(2)) < 1e-12, "orthogonal centroids")
    assert(math.abs(r1.getDouble(3) - math.sqrt(200.0)) < 1e-9)
    // uniform magnitude shift: cosine holds at 1, L2 registers
    val mag = Seq((0L, Seq(10L, 10L)), (1L, Seq(20L, 20L))).toDF("vec_id", "xq")
    val r2 = Similarity.centroidDrift(mag, "vec_id", col("vec_id") % 2 === 0)
      .collect().head
    assert(math.abs(r2.getDouble(2) - 1.0) < 1e-9)
    assert(r2.getDouble(3) > 10.0)
  }

  test("centroidDrift: empty slice yields NULL readouts, not zero drift") {
    import org.apache.spark.sql.functions.col
    // every row lands in slice A -> the A-vs-B comparison is undefined
    val oneSided = Seq((0L, Seq(10L, 0L)), (2L, Seq(0L, 10L)))
      .toDF("vec_id", "xq")
    val r = Similarity.centroidDrift(oneSided, "vec_id",
      col("vec_id") % 2 === 0).collect().head
    assert(r.getLong(0) === 2L && r.getLong(1) === 0L)
    assert(r.isNullAt(2) && r.isNullAt(3))
  }

  test("dimStats: exact grid moments per dimension, dead-dim and range readout") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, -2.0f)),
      (2L, Array(3.0f, 0.0f, 2.0f)),
      (3L, Array(5.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Similarity.dimStats(vecs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // dim 0: values 1,3,5 -> mean 3, std 2, no zeros
    val d0 = got(0L)
    assert(d0.getLong(1) === 3L && d0.getLong(2) === 0L)
    assert(math.abs(d0.getDouble(3) - 3.0) < 1e-9)
    assert(math.abs(d0.getDouble(4) - 2.0) < 1e-9)
    assert(d0.getDouble(5) === 1.0 && d0.getDouble(6) === 5.0)
    // dim 1: dead dimension — all zero, std 0
    val d1 = got(1L)
    assert(d1.getLong(2) === 3L && d1.getDouble(3) === 0.0 && d1.getDouble(4) === 0.0)
    // dim 2: mixed signs, min/max exact
    val d2 = got(2L)
    assert(d2.getDouble(5) === -2.0 && d2.getDouble(6) === 2.0)
    assert(d2.getLong(2) === 1L)
  }
}

package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DupClustersSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: chains collapse transitively to min-id clusters") {
    // components: {1,2,3,4} (chain), {7,8}, singleton pairs absent
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 8L)).toDF("id_a", "id_b")
    val c = DupClusters.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c(1L) === 1L && c(2L) === 1L && c(3L) === 1L && c(4L) === 1L)
    assert(c(7L) === 7L && c(8L) === 7L)
  }

  test("dropClusters keeps one survivor per component, untouched rows stay") {
    val docs = (1L to 9L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val kept = DupClusters.dropClusters(docs, pairs, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 4L, 5L, 6L, 7L, 9L))
  }

  test("keepBestPerCluster keeps the top-ranked row per component; unpaired rows survive") {
    val docs = Seq(
      (1L, 10L), (2L, 50L), (3L, 30L), // one chained cluster {1,2,3}
      (4L, 5L), (5L, 5L),              // pair with tied quality -> min id
      (9L, 1L)                         // unpaired -> survives regardless
    ).toDF("doc_id", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val kept = DupClusters.keepBestPerCluster(docs, pairs, "doc_id", Seq(col("quality").desc))
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L, 4L, 9L)) // best of {1,2,3}; tie -> 4; singleton 9
    // min-id policy differs on the first cluster, proving the policy matters
    val minId = DupClusters.dropClusters(docs, pairs, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(minId === Set(1L, 4L, 9L))
  }

  test("transitive vs pairwise survivorship differ exactly on indirect links") {
    // 1-3 and 2-3 similar, 1-2 NOT directly paired: the component is
    // {1,2,3} so transitive keeps only 1; the pairwise rule (drop id_b of
    // every pair) drops only 3 and KEEPS 2 — the over-retention transitive
    // clustering exists to fix.
    val docs = (1L to 3L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 3L), (2L, 3L)).toDF("id_a", "id_b")
    val transitive = DupClusters.dropClusters(docs, pairs, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(transitive === Set(1L))
    val pairwiseDropped = pairs.select("id_b").distinct().collect().map(_.getLong(0)).toSet
    assert((Set(1L, 2L, 3L) -- pairwiseDropped) === Set(1L, 2L))
  }

  test("pointer jumping: a 200-node chain converges in O(log n) rounds, not O(n)") {
    // plain min-label propagation needs ~199 rounds for this chain; the
    // path-halving step must finish it (plus one quiet round to detect
    // convergence) well inside a logarithmic budget
    val pairs = (1L to 199L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val c = DupClusters.clusters(pairs, maxIter = 12).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 200L).forall(c(_) === 1L))
  }

  test("non-convergence at maxIter raises instead of returning split clusters") {
    // a 7-node chain needs ~6 label-propagation rounds; maxIter=2 cannot
    // finish and must throw, not silently return partial labels
    val pairs = (1L to 6L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val ex = intercept[IllegalStateException] {
      DupClusters.clusters(pairs, maxIter = 2).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
    // and a budget that does cover the diameter still collapses the chain
    val ok = DupClusters.clusters(pairs, maxIter = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 7L).forall(ok(_) === 1L))
  }

  test("winnowing pairs: overlapping docs pair with shared count, disjoint don't") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog in the sunny meadow"),
      (2L, "yesterday the quick brown fox jumps over the lazy dog again happily"),
      (3L, "entirely unrelated content with zero overlap whatsoever here")
    ).toDF("doc_id", "text")
    val pairs = TextAnalysis.winnowingPairs(docs, "doc_id", "text", k = 8, w = 4, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) >= 1L)
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L))
    // n_shared equals the actual fingerprint-set intersection size
    val fps = docs.select(col("doc_id"),
        TextAnalysis.winnowingFingerprints(col("text"), 8, 4).as("f")).collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Long]]("f").toSet).toMap
    assert(pairs((1L, 2L)) === fps(1L).intersect(fps(2L)).size.toLong)
  }

  test("winnowing pairs: buckets past the cap route through the join path unchanged") {
    // many docs sharing one fingerprint-heavy template → fat fp buckets;
    // with bucketCap=2 every pair-producing bucket exceeds the cap, so
    // the result must come entirely from the distributed self-join path
    // and equal the uncapped in-array run (path switch, not a recall cut)
    val docs = (1L to 9L).map(i =>
      (i, s"the quick brown fox jumps over the lazy dog in meadow $i")).toDF("doc_id", "text")
    def pairs(cap: Int) = TextAnalysis.winnowingPairs(docs, "doc_id", "text",
        k = 8, w = 4, minShared = 1, maxDocFreqRatio = 1.0, bucketCap = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val joined = pairs(2)
    assert(joined === pairs(100000))
    assert(joined.nonEmpty)
  }

  test("winnowing pairs: exact-replica collapse matches brute force under the df cut") {
    // 3 templates × 4 verbatim replicas — the dup shape the group collapse
    // targets; templates 1+2 share a long substring so their fps overlap.
    // Brute force: n_shared(a,b) = |{fp ∈ f_a ∩ f_b : 2 ≤ df(fp) ≤ cap}|.
    val base = Seq(
      "the quick brown fox jumps over the lazy dog in the sunny meadow",
      "yesterday the quick brown fox jumps over the lazy dog again happily",
      "entirely unrelated content with zero overlap whatsoever here today")
    val docs = (0L until 12L).map(i => (i, base((i % 3).toInt))).toDF("doc_id", "text")
    val fps = docs.select(col("doc_id"),
        TextAnalysis.winnowingFingerprints(col("text"), 8, 4).as("f")).collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Long]]("f").toSet).toMap
    val dfCount = fps.values.toSeq.flatMap(_.toSeq).groupBy(identity).map { case (fp, xs) => fp -> xs.size }
    for (ratio <- Seq(0.5, 1.0); cap2 <- Seq(2, 100000)) {
      val cap = math.max(2L, math.floor(ratio * 12).toLong)
      val expected = (for {
        a <- 0L until 12L; b <- (a + 1) until 12L
        shared = fps(a).intersect(fps(b)).count(fp => dfCount(fp) >= 2 && dfCount(fp) <= cap)
        if shared >= 2
      } yield (a, b) -> shared.toLong).toMap
      val got = TextAnalysis.winnowingPairs(docs, "doc_id", "text", k = 8, w = 4,
          minShared = 2, maxDocFreqRatio = ratio, bucketCap = cap2)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got === expected, s"ratio=$ratio bucketCap=$cap2")
      assert(expected.nonEmpty)
    }
  }

  test("repetition signals: loops score high, diverse text scores low") {
    val docs = Seq(
      (1L, "buy now buy now buy now buy now buy now buy now"),
      (2L, "the quick brown fox jumps over a lazy dog near this river today"),
      (3L, "word")
    ).toDF("doc_id", "text")
    val m = docs.select(col("doc_id"), TextAnalysis.repetitionSignals(col("text")).as("r"))
      .select(col("doc_id"), col("r.dup_word_frac"), col("r.top_bigram_frac"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // the loop: 12 words, 2 distinct → dup 10/12; bigrams dominated by "buy now"
    assert(math.abs(m(1L)._1 - 10.0 / 12) < 1e-9)
    assert(m(1L)._2 > 0.5)
    // diverse: all 13 words distinct, every one of the 12 bigrams unique
    assert(m(2L)._1 === 0.0)
    assert(math.abs(m(2L)._2 - 1.0 / 12) < 1e-9)
    // single word: no bigrams → 0, no dups → 0
    assert(m(3L) === ((0.0, 0.0)))
  }

  test("winnowing: shared substring yields shared fingerprints; disjoint texts don't") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog in the sunny meadow"),
      (2L, "yesterday the quick brown fox jumps over the lazy dog again happily"),
      (3L, "entirely unrelated content with zero overlap whatsoever here")
    ).toDF("doc_id", "text")
    val fps = docs.select(col("doc_id"),
        TextAnalysis.winnowingFingerprints(col("text"), k = 8, w = 4).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Long]]("fps").toSet).toMap
    assert(fps(1L).intersect(fps(2L)).nonEmpty)  // share a 40+ char substring
    assert(fps(1L).intersect(fps(3L)).isEmpty)
    assert(fps.values.forall(_.nonEmpty))
  }
}

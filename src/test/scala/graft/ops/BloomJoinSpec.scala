package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
  private lazy val keys = graft.Tables.orders(spark, "/root/testdata/sf0.001")
    .filter(col("o_orderkey") % 5 === 0)
    .select(col("o_orderkey").as("l_orderkey"))

  test("pruned semi join equals the plain semi join exactly") {
    val pruned = BloomJoin.prunedSemiJoin(li, keys, Seq("l_orderkey"),
      expectedItems = 10000L, numBits = 1L << 17)
    val plain = li.join(keys, Seq("l_orderkey"), "left_semi")
    assert(pruned.count() === plain.count())
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("the bloom pre-filter has no false negatives and actually prunes") {
    val sketch = BloomJoin.buildSketch(keys, Seq("l_orderkey"), 10000L, 1L << 17)
    val survivors = li.filter(BloomJoin.mightContain(sketch, Seq("l_orderkey")))
    val truePos = li.join(keys, Seq("l_orderkey"), "left_semi")
    // no false negatives: every true match survives the bloom
    assert(truePos.exceptAll(survivors).isEmpty)
    // real pruning: survivors are far fewer than the probe side (~1/5 of
    // keys pass the %5 gate; allow slack for bloom false positives)
    assert(survivors.count() < li.count() / 2)
  }

  test("sketch size is fixed by numBits, not build cardinality") {
    val small = BloomJoin.buildSketch(keys.limit(10), Seq("l_orderkey"), 100L, 1L << 17)
    val large = BloomJoin.buildSketch(keys, Seq("l_orderkey"), 10000L, 1L << 17)
    assert(math.abs(small.length - large.length) <= 16)
    assert(large.length <= (1 << 17) / 8 + 64)
  }

  test("build keys of a different numeric type coerce to the probe's type before hashing") {
    // xxhash64 is type-sensitive (hash(2: INT) != hash(2: LONG)); without
    // the cast the bloom pre-filter would drop every true match here
    val probe = Seq(1, 2, 3).toDF("k") // IntegerType
    val build = Seq(2L, 3L, 9L).toDF("k") // LongType
    val out = BloomJoin.prunedSemiJoin(probe, build, Seq("k"), 10L, 1L << 12)
      .as[Int].collect().sorted.toSeq
    assert(out === Seq(2, 3))
  }

  test("build keys outside the probe type's range never match (no wrap-around)") {
    // Non-ANSI LONG->INT cast truncates bits: 2^32+5 would wrap to 5 and
    // spuriously match the probe. A plain equi join widens both sides and
    // excludes it — prunedSemiJoin must agree, by dropping build keys that
    // change under a probe-type round-trip cast.
    val probe = Seq(5, 7).toDF("k") // IntegerType
    val build = Seq((1L << 32) + 5L, 7L, Long.MaxValue).toDF("k") // LongType
    val out = BloomJoin.prunedSemiJoin(probe, build, Seq("k"), 10L, 1L << 12)
      .as[Int].collect().sorted.toSeq
    assert(out === Seq(7))
    // cross-check against the coercing equi semi join
    val plain = probe.join(Seq((1L << 32) + 5L, 7L, Long.MaxValue).toDF("k"), Seq("k"), "left_semi")
      .as[Int].collect().sorted.toSeq
    assert(out === plain)
  }

  test("fractional build keys not representable in an integral probe are dropped") {
    val probe = Seq(5, 6).toDF("k") // IntegerType
    val build = Seq(5.0, 5.5, 6.25).toDF("k") // DoubleType: 5.5 would cast to 5
    val out = BloomJoin.prunedSemiJoin(probe, build, Seq("k"), 10L, 1L << 12)
      .as[Int].collect().sorted.toSeq
    assert(out === Seq(5))
  }

  test("empty build side yields an empty result, not an error") {
    // zero build rows -> the aggregate evals to a null sketch ->
    // might_contain(null, ...) is null -> filter keeps nothing; the
    // confirming join would agree (empty ⋉ anything = empty)
    val probe = Seq(1L, 2L).toDF("k")
    val build = Seq.empty[Long].toDF("k")
    assert(BloomJoin.prunedSemiJoin(probe, build, Seq("k"), 10L, 1L << 12).count() === 0)
  }

  test("null probe keys never survive (equi-join semantics, FPs removed)") {
    val probe = Seq(Some(1L), None, Some(9L)).toDF("k")
    val build = Seq(Some(1L), None).toDF("k")
    val out = BloomJoin.prunedSemiJoin(probe, build, Seq("k"), 10L, 1L << 12)
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    // null = null is not true in an equi-join: only the real key matches
    assert(out === Seq(Some(1L)))
  }

  test("multi-column keys hash consistently on both sides") {
    val probe = Seq((1L, "x", 10), (1L, "y", 20), (2L, "x", 30)).toDF("a", "b", "v")
    val build = Seq((1L, "x"), (9L, "z")).toDF("a", "b")
    val out = BloomJoin.prunedSemiJoin(probe, build, Seq("a", "b"), 10L, 1L << 12)
      .select("v").as[Int].collect().toSeq
    assert(out === Seq(10))
  }
}

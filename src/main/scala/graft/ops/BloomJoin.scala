package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter-pruned semi join — the "dedup gate before the expensive
  * stage" idea (`extractor/riot/db/redis.py:48-56` gates HTTP fetches on a
  * SET) at relational scale, using the same Catalyst machinery as Spark's
  * own runtime row-filter injection (`BloomFilterAggregate` +
  * `BloomFilterMightContain`).
  *
  * Why it matters at 100 TB: a plain semi join shuffles the FULL probe side
  * on the join key. Building a fixed-size bloom sketch over the build keys
  * (one distributed typed-imperative aggregate, partial-merged — never a
  * row collect) and filtering the probe BEFORE the shuffle means the
  * exchange carries only probable matches. The sketch is O(numBits) bytes
  * regardless of build cardinality — the collect-stats-then-broadcast
  * pattern (SURVEY §4) applied to membership instead of percentiles.
  *
  * The bloom admits false positives, so [[prunedSemiJoin]] follows the
  * pre-filter with an exact semi join on the survivors — the result is
  * exactly `probe ⋉ build`, the bloom only shrinks the shuffle.
  */
object BloomJoin {

  /** Distributed bloom sketch over `xxhash64(keys)`: returns the serialized
    * filter (binary, `numBits/8` bytes + header) as a 1-row DataFrame.
    */
  def buildSketch(build: DataFrame, on: Seq[String],
      expectedItems: Long, numBits: Long): Array[Byte] = {
    val agg = Bridge.column(
      new BloomFilterAggregate(
        Bridge.expression(xxhash64(on.map(col): _*)),
        Literal(expectedItems), Literal(numBits), 0, 0
      ).toAggregateExpression())
    // The ONLY driver-side value is the fixed-size sketch itself (size set
    // by numBits, independent of build row count) — safe at any scale.
    build.agg(agg.as("bf")).head.getAs[Array[Byte]]("bf")
  }

  /** `might_contain(sketch, xxhash64(keys))` with the sketch embedded as a
    * binary literal (ships once per task with the plan, like a broadcast
    * scalar — `BloomFilterMightContain` requires a constant filter side).
    */
  def mightContain(sketch: Array[Byte], on: Seq[String]): Column =
    Bridge.column(BloomFilterMightContain(
      Literal(sketch, BinaryType),
      Bridge.expression(xxhash64(on.map(col): _*))))

  /** Exact semi join with bloom pre-pruning: filter `probe` through the
    * sketch first (narrow, whole-stage codegen), then confirm survivors
    * with a real left-semi join so false positives are eliminated.
    *
    * `xxhash64` is type-sensitive where an equi-join would type-coerce
    * (hash(5: INT) ≠ hash(5: LONG)), so the build keys are cast to the
    * probe's column types before sketching AND before the confirming join
    * — both stages then see the identical key space.
    *
    * Casting alone is not enough: a build key outside the probe type's
    * range (2^32+5 vs an INT probe holding 5) would wrap (legacy cast) or
    * throw (ANSI cast) where a plain equi join — which widens BOTH sides to
    * the common type — simply excludes it. A build key equals some probe
    * value under widening iff it is exactly representable in the probe's
    * type, i.e. it survives a `try_cast` round-trip unchanged — so rows
    * whose key nulls or changes under probe-type→build-type round-trip are
    * dropped before sketching and joining, restoring exactly
    * `probe ⋉ build` under equi-join coercion in either ANSI mode.
    */
  def prunedSemiJoin(probe: DataFrame, build: DataFrame, on: Seq[String],
      expectedItems: Long = 1000000L, numBits: Long = 8388608L): DataFrame = {
    val representable = on.map { c =>
      val pt = probe.schema(c).dataType
      if (build.schema(c).dataType == pt) lit(true)
      // <=> keeps null keys (harmless: a semi join never matches on null)
      // and drops exactly the values the probe's type cannot represent.
      else col(c).try_cast(pt).try_cast(build.schema(c).dataType) <=> col(c)
    }.reduce(_ && _)
    val buildKeys = build.filter(representable)
      .select(on.map(c => col(c).try_cast(probe.schema(c).dataType).as(c)): _*)
    val sketch = buildSketch(buildKeys, on, expectedItems, numBits)
    probe.filter(mightContain(sketch, on))
      .join(buildKeys, on, "left_semi")
  }
}

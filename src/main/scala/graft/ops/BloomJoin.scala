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
    * — both stages then see the identical key space and the result is
    * exactly `probe ⋉ build` under the probe's types.
    */
  def prunedSemiJoin(probe: DataFrame, build: DataFrame, on: Seq[String],
      expectedItems: Long = 1000000L, numBits: Long = 8388608L): DataFrame = {
    val buildKeys = build.select(on.map(c => col(c).cast(probe.schema(c).dataType).as(c)): _*)
    val sketch = buildSketch(buildKeys, on, expectedItems, numBits)
    probe.filter(mightContain(sketch, on))
      .join(buildKeys, on, "left_semi")
  }
}

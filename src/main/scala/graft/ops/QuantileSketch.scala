package graft.ops

import org.apache.datasketches.kll.{KllDoublesSketch, KllSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StructField, StructType}

/** Mergeable QUANTILE sketches (DataSketches KLL, Karnin–Lang–Liberty,
  * FOCS 2016) — the store-and-merge tier the quantile family was missing:
  * [[Aggregates]] has exact sort-based percentiles and
  * `percentile_approx` answers one-shot approximate questions, but
  * neither gives the [[Sketches]]-style persisted layer where a compact
  * sketch per FINE cell is built once and any coarser-grain quantile —
  * or tonight's incremental refresh — is answered by merging sketches,
  * raw history never rescanned. At 100 TB that difference is the whole
  * monitoring story: per-(day, segment) KLL sketches are a few KB each,
  * and the weekly / all-time latency p99 is a union over them.
  *
  * Spark ships HLL DataSketches bindings as SQL functions but no KLL
  * surface, so this is a thin typed layer over the same datasketches-java
  * jar: partial sketches are built imperatively per PARTITION
  * (mapPartitions — one sketch per (cell × partition), the map-side
  * combine shape; serialization happens once per partial, never per row)
  * and merged by a small `Aggregator` whose inputs are already
  * sketch-sized. Shuffled bytes = one ~KB sketch per (cell × partition).
  *
  * KLL estimates are NOT bit-reproducible (compaction flips coins), so
  * the oracle-checkable surface is the sketch self-check idiom
  * (`q_a3_approx_hll` / `q_approx_quantiles`): emit exact values and a
  * Spark-side flag that the estimate's occupied rank meets the published
  * normalized-rank-error band (doubled for slack — the published bound is
  * the 99%-confidence single-sided error); the oracle pins the exact
  * values and a literal `true`.
  */
object QuantileSketch {

  /** Published single-sided normalized rank error for parameter k
    * (≈1.33% at the k=200 default; 99% confidence per query). */
  def normalizedRankError(k: Int): Double =
    KllSketch.getNormalizedRankError(k, false)

  /** Merge-two-serialized-sketches kernel (null = empty). */
  private def union(k: Int, a: Array[Byte], b: Array[Byte]): Array[Byte] =
    if (a == null || a.isEmpty) b
    else if (b == null || b.isEmpty) a
    else {
      val u = KllDoublesSketch.heapify(Memory.wrap(a))
      u.merge(KllDoublesSketch.heapify(Memory.wrap(b)))
      u.toByteArray
    }

  /** Sketch-union Aggregator: inputs are serialized partials (one per
    * cell × partition from [[fineSketches]], or store/delta rows), so
    * the heapify cost is per-SKETCH, never per data row. */
  private final class MergeAgg(k: Int)
      extends Aggregator[Array[Byte], Array[Byte], Array[Byte]]
      with Serializable {
    def zero: Array[Byte] = null
    def reduce(b: Array[Byte], a: Array[Byte]): Array[Byte] = union(k, b, a)
    def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = union(k, b1, b2)
    def finish(r: Array[Byte]): Array[Byte] =
      if (r == null) KllDoublesSketch.newHeapInstance(k).toByteArray else r
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** The persisted layer: one KLL(k) sketch of `valueCol` per `cellCols`
    * cell, as a genuine binary column a table can store (the quantile
    * sibling of [[Sketches.fineSketches]]).
    *
    * Scale shape: ONE pass builds a sketch per (cell × input partition)
    * imperatively (no per-row shuffle mass, no per-row serialization),
    * then the only exchange moves those KB-sized partials to their cell
    * and unions them. At 100 TB the fine table is written bucketed once
    * per ingest; every later quantile question reads sketches.
    */
  def fineSketches(df: DataFrame, cellCols: Seq[String], valueCol: String,
                   k: Int = 200): DataFrame = {
    require(cellCols.nonEmpty, "need at least one cell column")
    val in = df.filter(col(valueCol).isNotNull)
      .select(cellCols.map(col) :+ col(valueCol).cast("double").as("__v"): _*)
    val nCell = cellCols.size
    val partialSchema = StructType(
      in.schema.fields.take(nCell) :+ StructField("__psk", BinaryType))
    val partials = in.mapPartitions { it =>
      val m = scala.collection.mutable.LinkedHashMap
        .empty[Seq[Any], KllDoublesSketch]
      it.foreach { r =>
        val key = (0 until nCell).map(r.get)
        m.getOrElseUpdate(key, KllDoublesSketch.newHeapInstance(k))
          .update(r.getDouble(nCell))
      }
      m.iterator.map { case (key, sk) => Row.fromSeq(key :+ sk.toByteArray) }
    }(org.apache.spark.sql.Encoders.row(partialSchema))
    partials.groupBy(cellCols.map(col): _*)
      .agg(udaf(new MergeAgg(k)).apply(col("__psk")).as("qsk"))
  }

  /** Merge a sketch table upward to `coarseCols` (lossless over sketches
    * up to KLL's own error composition; raw rows untouched). */
  def rollup(fine: DataFrame, coarseCols: Seq[String], k: Int = 200): DataFrame =
    fine.groupBy(coarseCols.map(col): _*)
      .agg(udaf(new MergeAgg(k)).apply(col("qsk")).as("qsk"))

  /** Incremental store maintenance: pairwise-union a delta sketch table
    * into the persisted store — the nightly refresh is O(|delta cells|),
    * history never rescanned (the [[Sketches.mergeSketchStores]] shape;
    * with the store bucketed on `keyCols` only the delta shuffles). */
  def mergeStores(store: DataFrame, delta: DataFrame, keyCols: Seq[String],
                  k: Int = 200): DataFrame = {
    val kk = k
    val u = udf((a: Array[Byte], b: Array[Byte]) => union(kk, a, b))
    store.withColumnRenamed("qsk", "__sk_s")
      .join(delta.withColumnRenamed("qsk", "__sk_d"), keyCols, "full_outer")
      .withColumn("qsk", u(col("__sk_s"), col("__sk_d")))
      .drop("__sk_s", "__sk_d")
  }

  /** Explode a sketch table into (keys*, prob, n, approx_q) — one row per
    * requested probability. Estimates use the INCLUSIVE rank rule
    * (smallest retained value whose rank ≥ p), matching the exact
    * lower-quantile convention callers pin alongside. */
  def quantiles(sketches: DataFrame, probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1),
      "probs must be in (0, 1]")
    val est = udf((b: Array[Byte], p: Double) => {
      val sk = KllDoublesSketch.heapify(Memory.wrap(b))
      if (sk.isEmpty) null
      else java.lang.Double.valueOf(sk.getQuantile(p))
    })
    val nOf = udf((b: Array[Byte]) =>
      KllDoublesSketch.heapify(Memory.wrap(b)).getN)
    sketches
      .withColumn("prob", explode(array(probs.map(lit(_)): _*)))
      .withColumn("n", nOf(col("qsk")))
      .withColumn("approx_q", est(col("qsk"), col("prob")))
      .drop("qsk")
  }
}

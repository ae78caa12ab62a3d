package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Isotonic regression (pool-adjacent-violators) calibration — fit the
  * best monotone non-decreasing map from a model score to an empirical
  * probability, the non-parametric alternative to Platt scaling and the
  * standard production calibrator (Zadrozny & Elkan 2002).
  *
  * Instead of the sequential PAV stack (inherently serial, driver-sized),
  * this uses the MINIMAX characterization of the isotonic fit
  * (Robertson, Wright & Dykstra 1988, §1.2):
  *
  *   fitted(i) = max_{j ≤ i} min_{k ≥ i} weightedMean(y, cells j..k)
  *
  * which is pure algebra over prefix sums — expressible as joins and
  * windows, no iteration, no driver state.
  *
  * CELL-CARDINALITY contract: the corpus first collapses to one row per
  * DISTINCT SCORE CELL (callers quantize the score — 2dp probabilities
  * give ≤ 101 cells; the fit only ever needs the resolution the
  * downstream decision threshold uses). Everything after the collapse is
  * metadata-sized: the (j,k) pair table is Θ(m²) rows of three numbers,
  * fine into the thousands of cells, and NEVER touches the fact table
  * again. The collapse itself is one map-side-combined aggregate — the
  * same single shuffle any calibration-bin report already pays.
  *
  * Exactness: cell counts and label sums are exact longs; every
  * weightedMean(j..k) is ONE IEEE division of exact integer differences,
  * so both engines materialize the identical set of doubles; min/max are
  * lattice operations over identical sets — order-free and bit-exact
  * cross-engine. The fit is monotone BY CONSTRUCTION (max over a grown
  * prefix of mins over a shrunk suffix).
  */
object Isotonic {

  /** Fit the isotonic calibration table. `cellCol` is the quantized
    * score cell (an integral column, ascending in score); `labelCol` is
    * the 0/1 (or integral) outcome. Returns one row per cell:
    * (cell, n, sum_y, empirical, fitted), with fitted non-decreasing in
    * cell.
    */
  def pavFit(df: DataFrame, cellCol: Column, labelCol: Column): DataFrame = {
    // Materialize the collapse ONCE: the cell table feeds three lineages
    // (both sides of the block self-join + the final readout join), and
    // without cutting the lineage each one would re-scan the fact table —
    // 3 corpus passes instead of 1 at 100 TB. The checkpoint holds ≤m
    // rows (the CELL-CARDINALITY contract), so the pinned blocks are
    // bytes, not data. Eager fit is the established fit-path shape
    // (fitClipGrid, fitGroupMedian).
    val cells = df
      .filter(cellCol.isNotNull && labelCol.isNotNull)
      .groupBy(cellCol.cast("long").as("cell"))
      .agg(count(lit(1)).as("n"), sum(labelCol.cast("long")).as("sy"))
      .localCheckpoint(true)
    // prefix sums over the m-cell table (metadata-sized by contract)
    val wPrefix = Window.orderBy(col("cell").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prefix = cells
      .withColumn("cn", sum(col("n")).over(wPrefix))
      .withColumn("cy", sum(col("sy")).over(wPrefix))
    // block means avg(j..k) for every j ≤ k:
    //   (cy_k − (cy_j − sy_j)) / (cn_k − (cn_j − n_j))
    val j = prefix.select(col("cell").as("cj"),
      (col("cy") - col("sy")).as("cy0"), (col("cn") - col("n")).as("cn0"))
    val k = prefix.select(col("cell").as("ck"), col("cy"), col("cn"))
    val blocks = j.join(k, col("cj") <= col("ck"))
      .select(col("cj"), col("ck"),
        ((col("cy") - col("cy0")).cast("double") /
          (col("cn") - col("cn0"))).as("avg"))
    // minfrom(j, i) = min_{k ≥ i} avg(j..k): running min from the right
    val wTail = Window.partitionBy(col("cj")).orderBy(col("ck").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val minfrom = blocks
      .withColumn("mf", min(col("avg")).over(wTail))
      .select(col("cj"), col("ck").as("cell"), col("mf"))
    // fitted(i) = max_{j ≤ i} minfrom(j, i); rows exist exactly for j ≤ i
    val fitted = minfrom.groupBy(col("cell"))
      .agg(max(col("mf")).as("fitted"))
    cells.join(fitted, Seq("cell"))
      .select(col("cell"), col("n"), col("sy"),
        (col("sy").cast("double") / col("n")).as("empirical"),
        col("fitted"))
  }

  /** Apply a fitted calibration table ([[pavFit]] output — or any
    * (cell, fitted) map) to a scoring set: broadcast the ≤m-row model,
    * one narrow left join. Cells unseen at fit time keep a NULL
    * calibrated value — the caller decides the fallback (raw score,
    * nearest cell, refuse) rather than this op inventing one silently.
    * The fit/apply split is the leak-safety contract: fit on one fold,
    * apply to another ([[graft.aram.Preprocess]]'s pattern).
    */
  def pavApply(model: DataFrame, df: DataFrame, cellCol: Column,
      outCol: String = "calibrated"): DataFrame =
    df.withColumn("__cell", cellCol.cast("long"))
      .join(broadcast(model.select(col("cell").as("__cell"),
        col("fitted").as(outCol))), Seq("__cell"), "left")
      .drop("__cell")
}

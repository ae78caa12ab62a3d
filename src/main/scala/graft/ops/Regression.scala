package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Closed-form per-group simple linear regression (OLS y = a + b·x) —
  * the trend-fitting aggregate behind drift detection, per-segment trend
  * reports, and feature/label leakage screens (a suspiciously high r²
  * between a feature and the label is the classic leak signal).
  *
  * Exactness contract: callers pass INTEGER x and y columns (e.g. day
  * index and value cents — the repo's established fixed-point idiom).
  * Then every accumulated moment (Σx, Σy, Σxy, Σx², Σy², n) is an exact
  * 64-bit integer — order-free under any partitioning — and the closed
  * forms below consume identical exact operands on every engine, so the
  * handful of final double multiplications/divisions are bit-identical
  * cross-engine (IEEE ops on identical inputs), and `qround` at the
  * query layer is belt-and-braces rather than load-bearing.
  *
  *   b  = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
  *   a  = (Σy − b·Σx) / n
  *   r² = (n·Σxy − Σx·Σy)² / ((n·Σx² − (Σx)²)·(n·Σy² − (Σy)²))
  *
  * NULL slope/intercept/r² where x (or y, for r²) is constant.
  *
  * Scale shape: one map-side-combined hash aggregate over the group key —
  * the five moments are the whole shuffle payload (fixed width per
  * group); the closed forms are projections on the aggregated table.
  */
object Regression {

  /** (group, n, slope, intercept, r2). x/y must be integral types. */
  def groupOls(df: DataFrame, groupCol: String, xCol: String, yCol: String)
      : DataFrame = {
    // widen BEFORE forming products: an IntegerType x*y wraps at 32 bits
    // (non-ANSI) before sum() promotes, so e.g. y ≥ 46341 would corrupt Σy²
    // silently — the documented integral contract must hold for any width
    val x = col(xCol).cast("long"); val y = col(yCol).cast("long")
    val m = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(x).as("sx"),
        sum(y).as("sy"), sum(x * y).as("sxy"),
        sum(x * x).as("sxx"),
        sum(y * y).as("syy"))
    // fixed operand order, mirrored by the oracle SQL
    val covN = col("n").cast("double") * col("sxy") - col("sx").cast("double") * col("sy")
    val varXN = col("n").cast("double") * col("sxx") - col("sx").cast("double") * col("sx")
    val varYN = col("n").cast("double") * col("syy") - col("sy").cast("double") * col("sy")
    val slope = when(varXN > 0, covN / varXN)
    m.select(col(groupCol), col("n"),
      slope.as("slope"),
      when(varXN > 0, (col("sy") - covN / varXN * col("sx")) / col("n"))
        .as("intercept"),
      when(varXN > 0 && varYN > 0, covN * covN / (varXN * varYN)).as("r2"))
  }

  /** Theil–Sen robust trend: per group, the MEDIAN of all pairwise
    * slopes (y_j − y_i)/(x_j − x_i) over x_i < x_j — the trend estimator
    * with a 29% breakdown point, where one bad day bends OLS but not
    * this (Theil 1950; Sen 1968). Lower median at even pair counts,
    * ties broken by (slope, x1, x2), so the pick is deterministic
    * cross-engine.
    *
    * BOUNDED-GROUP contract: pairs are C(n,2) per group — this is the
    * per-entity short-series estimator (daily volumes, sensor drift),
    * not a data-sized-group aggregate; the Scaladoc'd intent is n in the
    * hundreds-to-thousands per group. `x` must be unique within a group
    * (pre-aggregate to one row per (group, x) first).
    *
    * Scale shape: one group-keyed self-join (pairs stay inside their
    * group's partition), one per-group rank window over the pair table.
    * Parallel across groups; nothing global.
    */
  def theilSenSlope(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val pts = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(groupCol).as("g"), col(xCol).cast("double").as("x"),
        col(yCol).cast("double").as("y"))
    val a = pts.as("a"); val b = pts.as("b")
    val pairs = a.join(b, col("a.g") === col("b.g") && col("a.x") < col("b.x"))
      .select(col("a.g").as("g"),
        ((col("b.y") - col("a.y")) / (col("b.x") - col("a.x"))).as("slope"),
        col("a.x").as("x1"), col("b.x").as("x2"))
    val wRank = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
      .orderBy(col("slope").asc, col("x1").asc, col("x2").asc)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
    pairs.withColumn("rnk", row_number().over(wRank).cast("long"))
      .withColumn("np", count(lit(1)).over(wAll))
      .filter(col("rnk") === floor((col("np") + lit(1L)) / lit(2.0)).cast("long"))
      .select(col("g"), col("np").as("n_pairs"), col("slope"))
  }
}

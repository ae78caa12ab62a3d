package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy / compliance screens for training-corpus release — the audit
  * pass a pipeline runs before a dataset (or its per-group statistics)
  * leaves the trust boundary. Complements the PII span detector
  * (`TextAnalysis.piiSpans`): that one finds raw identifiers in text;
  * this module measures RE-IDENTIFICATION risk of structured metadata
  * (k-anonymity / l-diversity, Sweeney 2002; Machanavajjhala et al. 2006)
  * and releases noisy aggregates under the Laplace mechanism (Dwork et
  * al. 2006), with the repo's deterministic md5 uniforms standing in for
  * the RNG so runs, partitionings, and engines agree bit-for-bit.
  *
  * Scale shape: both operators are single hash-aggregates over the
  * quasi-identifier / release keys — map-side partials, one shuffle on
  * the group key, output rows = |distinct groups| (metadata-sized, never
  * data-sized). Nothing here joins back to rows; at 100 TB the audit
  * costs one pass.
  */
object Privacy {

  /** k-anonymity / l-diversity audit: one row per quasi-identifier
    * equivalence class with its size (`class_size`), the number of
    * distinct sensitive values it contains (`l_diversity`), and the
    * `at_risk` flag (size < k — the classes whose members a linking
    * attacker can pin down to fewer than k candidates). Publishing
    * decisions (suppress / generalize) key off this table.
    *
    * The class count is exact, not sketched: risk audits cannot
    * false-negative on a singleton class, so `countDistinct` (exact
    * two-phase expand) is the right tool even though the repo has HLL
    * for scale-tolerant distinct counts elsewhere.
    */
  def kAnonymityAudit(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
      k: Long): DataFrame =
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("l_diversity"))
      .withColumn("at_risk", col("class_size") < lit(k))

  /** Laplace-mechanism count release: per-group exact counts plus a
    * noisy copy with Laplace(1/epsilon) noise (sensitivity 1 for a
    * disjoint-group counting query), derived by inverse-CDF from the
    * deterministic group-key uniform. `released` is the conventional
    * post-processed integer release (rounded, clamped at 0).
    *
    * Determinism contract: noise is a pure function of the group key —
    * the same release re-run tomorrow is byte-identical (and the DuckDB
    * oracle replays it exactly). A production deployment that needs
    * fresh draws per release epoch salts the key with the epoch id; the
    * mechanism and its epsilon accounting are unchanged.
    *
    * Inverse CDF: X = -b·sign(u-½)·ln(1-2|u-½|), exact at u=½ (noise 0)
    * and finite for every 60-bit uniform (u is never exactly 0 or 1).
    */
  def laplaceNoisyCounts(df: DataFrame, keys: Seq[String],
      epsilon: Double): DataFrame = {
    require(epsilon > 0.0, "epsilon must be positive")
    val b = 1.0 / epsilon
    val u: Column = Sampling.hashUniform(concat_ws("|", keys.map(col): _*))
    // sign * ((0 - ln(1-2|u-½|)) * b): ln ≤ 0, so the second factor is the
    // non-negative magnitude — the operand ORDER is load-bearing, the
    // DuckDB oracle mirrors it textually
    val noise = signum(u - lit(0.5)) *
      ((lit(0.0) - log(lit(1.0) - lit(2.0) * abs(u - lit(0.5)))) * lit(b))
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("true_count"))
      .withColumn("noisy_count", col("true_count").cast("double") + noise)
      .withColumn("released",
        greatest(lit(0L), floor(col("noisy_count") + lit(0.5)).cast("long")))
  }

  /** Generalization ladder: the k-anonymity tuning curve. For each
    * candidate band width, re-band the numeric quasi-identifier to
    * ⌊value / width⌋ and report the per-width risk summary — class
    * count, classes below k, rows inside those classes, and the
    * smallest class. The table that answers "how coarse must `numCol`
    * get before the corpus is k-anonymous?" without running the audit
    * once per width by hand.
    *
    * Scale shape: one narrow ×|widths| explode (widths is a literal
    * handful), ONE class aggregate over (width, stratum, band), one
    * |classes|-sized summary aggregate. No joins, no windows.
    */
  def generalizationLadder(df: DataFrame, strataCol: String, numCol: String,
      widths: Seq[Long], k: Long): DataFrame = {
    require(widths.nonEmpty && widths.forall(_ > 0), "widths must be positive")
    val classes = df.select(col(strataCol), col(numCol))
      .withColumn("band_width", explode(typedLit(widths)))
      .groupBy(col("band_width"), col(strataCol),
        floor(col(numCol) / col("band_width")).as("band"))
      .agg(count(lit(1)).as("class_size"))
    classes.groupBy(col("band_width"))
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("class_size") < k, 1L).otherwise(0L)).as("n_risky"),
        sum(when(col("class_size") < k, col("class_size")).otherwise(0L))
          .as("rows_at_risk"),
        min(col("class_size")).as("min_class_size"))
  }

  /** t-closeness audit for an ORDERED sensitive attribute (Li, Li &
    * Venkatasubramanian, ICDE 2007) — the refinement k-anonymity and
    * l-diversity miss: a class can be large and diverse yet still leak
    * because its sensitive-value DISTRIBUTION deviates from the
    * corpus's (all high-salary, say). Distance is the 1-D Earth Mover's
    * Distance with unit ground distances between adjacent ordered
    * values,
    *
    *   EMD(p, q) = (1/(m−1)) · Σ_{i=1..m} | Σ_{j≤i} (p_j − q_j) |
    *
    * over the m GLOBALLY-observed distinct sensitive values (absent
    * cells count as p_j = 0 — the grid materializes them).
    *
    * Exactness: multiply each cumulative through by n_class·N — the
    * running numerator Σ_{j≤i}(c_j·N − G_j·n_class) is an exact integer
    * (decimal(38,0): c·N can exceed 64 bits at corpus scale), |·| and
    * the per-class sum stay integral, and EMD is ONE division by
    * n_class·N·(m−1) at readout.
    *
    * Scale shape: two map-side-combined aggregates (class cells, global
    * value marginals — both metadata-sized), one |classes|×m grid from
    * a broadcast-able cross join, one per-class window of length m
    * (bounded by the value-domain size, never by rows). Sensitive-null
    * rows are excluded; null QI values form their own class (the
    * [[kAnonymityAudit]] convention).
    *
    * Returns one row per class: (qiCols…, class_size, m, emd, at_risk =
    * emd > t).
    */
  def tClosenessAudit(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, t: Double): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    val Dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val base = df.filter(col(sensitiveCol).isNotNull)
      .select(qiCols.map(col) :+ col(sensitiveCol).cast("long").as("__s"): _*)
    val cells = base.groupBy(qiCols.map(col) :+ col("__s"): _*)
      .agg(count(lit(1)).as("__c"))
    val values = base.groupBy(col("__s")).agg(count(lit(1)).as("__g"))
    val totals = values.agg(sum(col("__g")).as("__N"),
      count(lit(1)).as("__m"))
    val classes = cells.groupBy(qiCols.map(col): _*)
      .agg(sum(col("__c")).as("__ng"))
    // null-safe QI match: a null QI value forms its own class (the
    // [[kAnonymityAudit]] convention), so the grid back-join must use
    // <=> — a plain equi-join would zero out every null-QI class's cells
    val gridBase = classes.crossJoin(broadcast(values.select(col("__s")))).as("gd")
    val ce = cells.as("ce")
    val cond = (qiCols.map(q => col(s"gd.$q") <=> col(s"ce.$q")) :+
      (col("gd.__s") === col("ce.__s"))).reduce(_ && _)
    val grid = gridBase.join(ce, cond, "left")
      .select(qiCols.map(q => col(s"gd.$q")) ++ Seq(col("gd.__s").as("__s"),
        col("gd.__ng").as("__ng"),
        coalesce(col("ce.__c"), lit(0L)).as("__c")): _*)
      .join(broadcast(values), Seq("__s"))
      .crossJoin(broadcast(totals))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(qiCols.map(col): _*).orderBy(col("__s").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    grid
      .withColumn("__num",
        sum((col("__c").cast(Dec) * col("__N") -
          col("__g").cast(Dec) * col("__ng")).cast(Dec)).over(wCum))
      .groupBy(qiCols.map(col) :+ col("__ng") :+ col("__N") :+ col("__m"): _*)
      .agg(sum(abs(col("__num")).cast(Dec)).as("__asum"))
      .select(qiCols.map(col) :+ col("__ng").as("class_size") :+
        col("__m").as("m") :+
        when(col("__m") > 1,
          col("__asum").cast("double") /
            (col("__ng").cast(Dec) * col("__N") * (col("__m") - 1L))
              .cast(Dec).cast("double"))
          .otherwise(lit(0.0)).as("emd"): _*)
      .withColumn("at_risk", col("emd") > lit(t))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Supervised categorical encodings beyond the dictionary encode of
  * `aram.Preprocess` (P8): the high-cardinality cases where a dictionary
  * id is useless (millions of user ids) and the informative feature is
  * the category's relationship to the LABEL — with the leakage control
  * that makes it trainable.
  *
  * Leave-one-out target encoding: each row's feature is its category's
  * label mean EXCLUDING the row itself, shrunk toward the global mean by
  * a pseudo-count prior m:
  *   te_i = (S_c − y_i + m·ȳ) / (n_c − 1 + m)
  * (S_c, n_c = category label sum/count). Excluding the own label is the
  * leak-safety: with it, the feature memorizes the target and
  * cross-validation silently overfits. Shrinkage keeps singleton
  * categories at the global mean instead of undefined.
  *
  * Exactness: S_c, n_c, y are exact longs; ȳ is ONE division of exact
  * longs; te one IEEE expression of those — deterministic cross-engine
  * (callers qround).
  *
  * Scale shape: one map-side-combined aggregate to (category, S, n) —
  * category-cardinality rows — then one equi-join back on the category
  * key (NO broadcast hint: the stats table grows with category
  * cardinality, AQE upgrades to broadcast only when it truly fits — the
  * J2/J5 discipline); the global mean is a 1-row broadcast.
  */
object Encoding {

  /** Adds `as` = leave-one-out target encoding of `catCol` against the
    * 0/1 (or integral) `labelCol`. Rows with a null category or label are
    * passed through with a null encoding.
    */
  def looTargetEncode(df: DataFrame, catCol: String, labelCol: Column,
                      m: Double = 10.0, as: String = "te"): DataFrame = {
    require(m > 0, "prior pseudo-count m must be positive (m=0 breaks singletons)")
    val y = labelCol.cast("long")
    val stats = df
      .filter(col(catCol).isNotNull && y.isNotNull)
      .groupBy(col(catCol))
      .agg(sum(y).as("__te_s"), count(lit(1)).as("__te_n"))
    val global = stats
      .agg((sum(col("__te_s")).cast("double") / sum(col("__te_n"))).as("__te_gm"))
    df.join(stats, Seq(catCol), "left")
      .crossJoin(broadcast(global))
      .withColumn(as,
        when(col("__te_n").isNotNull && y.isNotNull,
          (col("__te_s") - y + lit(m) * col("__te_gm")) /
            (col("__te_n") - 1 + lit(m))))
      .drop("__te_s", "__te_n", "__te_gm")
  }

  /** Per-group winsorization: clip `valueCol` into the group's
    * [pLo, pHi] quantile band (exact lower-quantile boundaries from
    * [[Aggregates.groupedQuantiles]], joined back on the group key) and
    * report per group: n, clipped-low/high counts and the mean of the
    * clipped values — the grouped, outlier-robust sibling of the global
    * P7 quantile clip. Integer boundaries and sums ⇒ the mean's division
    * is the only rounding site.
    */
  def groupWinsorize(df: DataFrame, groupCol: String, valueCol: String,
                     pLo: Double, pHi: Double): DataFrame = {
    require(0 < pLo && pLo < pHi && pHi <= 1)
    val bounds = Aggregates.groupedQuantiles(df, groupCol, valueCol,
      Seq(pLo -> "__lo", pHi -> "__hi"))
    val v = col(valueCol).cast("long")
    // no broadcast hint: the bounds table is |groups|-sized and AQE
    // upgrades the join when it truly fits (the J2/J5 discipline)
    df.filter(col(groupCol).isNotNull && v.isNotNull)
      .join(bounds.drop("n_rows"), Seq(groupCol))
      .withColumn("__w", greatest(col("__lo"), least(col("__hi"), v)))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum((v < col("__lo")).cast("long")).as("n_clipped_lo"),
        sum((v > col("__hi")).cast("long")).as("n_clipped_hi"),
        max(col("__lo")).as("lo"), max(col("__hi")).as("hi"),
        (sum(col("__w")).cast("double") / count(lit(1))).as("mean_clipped"))
  }

  /** The hashing trick (Weinberger et al., ICML'09 / sklearn
    * `FeatureHasher`): categorical features mapped into a FIXED
    * `dim`-dimensional sparse vector with no fitted dictionary at all —
    * the encoder for unbounded-cardinality features (urls, user ids,
    * n-grams) at 100 TB, where even a dictionary of ids is itself a
    * corpus-scale table. Stateless ⇒ nothing to fit, persist, or ship;
    * new categories at inference hash to the same space by construction.
    *
    * Each non-null feature becomes the token `name=value`; its bucket is
    * hash(token) mod dim and its sign ±1 from the NEXT bits of the same
    * hash (`(hash div dim) mod 2` — disjoint bits, so sign is
    * bucket-independent; the signed sum makes collisions cancel in
    * expectation, the variance argument of the paper). The hash is the
    * repo-wide md5-60-bit derivation ([[graft.llm.Sampling]]'s), so
    * DuckDB oracles replicate buckets and signs bit-for-bit.
    *
    * Returns sparse rows (`idCol`, bucket, x): one narrow ×|features|
    * projection, one map-side-combined (id, bucket) aggregate — no joins,
    * no fitted state, no shuffle beyond the output aggregate.
    */
  def hashFeatures(df: DataFrame, idCol: String, featureCols: Seq[String],
                   dim: Int): DataFrame = {
    require(dim >= 2, s"dim must be >= 2, got $dim")
    require(featureCols.nonEmpty, "featureCols must be non-empty")
    val tokens = featureCols.map { c =>
      when(col(c).isNotNull, concat(lit(s"$c="), col(c).cast("string")))
    }
    df.select(col(idCol), explode(array(tokens: _*)).as("__t"))
      .filter(col("__t").isNotNull)
      // 60-bit md5 prefix: non-negative, so % and div need no pmod guard
      .withColumn("__h", graft.functions.Md5Hash60.hash60(col("__t")))
      .select(col(idCol), (col("__h") % dim).as("bucket"),
        when(expr(s"(__h div $dim) % 2") === 0, lit(1L))
          .otherwise(lit(-1L)).as("__sgn"))
      .groupBy(col(idCol), col("bucket"))
      .agg(sum(col("__sgn")).as("x"))
  }

  /** Weight-of-Evidence / Information-Value audit of an integral feature
    * against a boolean label — the credit-scoring-era feature screen
    * (Siddiqi 2006) that survives into LLM-pipeline curation as "how
    * much does this doc-level signal separate kept from dropped": per
    * equal-width bin i,
    *
    *   WoE_i = ln( ((pos_i + ½)·negTot) / ((neg_i + ½)·posTot) )
    *   IV    = Σ_i (pos_i/posTot − neg_i/negTot) · WoE_i
    *
    * (½-smoothing keeps one-sided bins finite; the IV distribution
    * fractions stay raw so IV = 0 exactly when every bin splits
    * proportionally). Bins are equal-width over the OBSERVED [min, max]:
    * bin = min(bins−1, (v − min)·bins div (max − min + 1)) — pure
    * integer arithmetic, so bin assignment is deterministic
    * cross-engine; empty bins don't materialize.
    *
    * Exactness: counts and totals are exact longs; each WoE is one ln of
    * a ratio of exact products, each IV term one fixed IEEE expression.
    * The IV TOTAL is made order-free by the per-term fixed-point idiom:
    * terms quantize to 1e-9 longs and SUM as integers, so no float
    * accumulation order exists to disagree on.
    *
    * Scale shape: one 1-row min/max aggregate (broadcast), one
    * map-side-combined bin aggregate to ≤`bins` rows; the totals window
    * runs over that bounded table. Nothing data-sized moves twice.
    */
  def woeIv(df: DataFrame, featureCol: Column, labelCol: Column,
            bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val v = featureCol.cast("long")
    val y = labelCol.cast("long")
    val rows = df.select(v.as("__v"), y.as("__y"))
      .filter(col("__v").isNotNull && col("__y").isNotNull)
    val ext = rows.agg(min(col("__v")).as("__lo"), max(col("__v")).as("__hi"))
    val binned = rows.crossJoin(broadcast(ext))
      .select(least(lit(bins - 1L),
        floor((col("__v") - col("__lo")) * bins /
          (col("__hi") - col("__lo") + 1L)).cast("long")).as("bin"),
        col("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("pos"),
        (count(lit(1)) - sum(col("__y"))).as("neg"))
    val wAll = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val posTot = sum(col("pos")).over(wAll)
    val negTot = sum(col("neg")).over(wAll)
    // fixed operand order, mirrored by the oracle SQL
    val woe = log(((col("pos") + lit(0.5)) * negTot) /
      ((col("neg") + lit(0.5)) * posTot))
    val term = (col("pos").cast("double") / posTot -
      col("neg").cast("double") / negTot) * col("woe")
    binned
      .withColumn("woe", woe)
      .withColumn("__tq", floor(term * 1e9 + lit(0.5)).cast("long"))
      .withColumn("iv_term", col("__tq").cast("double") / 1e9)
      .withColumn("iv", (sum(col("__tq")).over(wAll)).cast("double") / 1e9)
      .select(col("bin"), col("n"), col("pos"), col("neg"), col("woe"),
        col("iv_term"), col("iv"))
  }
}

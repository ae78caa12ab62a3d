package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines: corpus subsampling
  * and per-source mixture weighting ("data mixing") with hash-derived
  * randomness instead of an RNG. Three properties an RNG sample lacks, all
  * load-bearing at 100 TB:
  *
  *  - reproducible across runs, partitionings, engines and replays (the
  *    sample is a pure function of the key — a re-run or a recovering
  *    streaming job selects the identical rows);
  *  - no coordination: each row decides membership locally from its own
  *    key, so sampling is a narrow filter — no shuffle, no driver state;
  *  - stratum-aware: per-source fractions express mixture ratios (e.g.
  *    upsample curated sources, downsample crawl) as data, not code.
  *
  * The uniform variate is the first 60 bits of md5(key) scaled to [0, 1) —
  * the same derivation the DuckDB oracles replicate bit-for-bit.
  */
object Sampling {

  /** The one hash derivation every sampler (and every DuckDB oracle)
    * shares: first 15 hex digits (60 bits) of md5(key) as a long. All
    * reproducibility contracts in this module reduce to this expression —
    * keep it single-sourced.
    */
  private[graft] def hash60(key: Column): Column =
    graft.functions.Md5Hash60.hash60(key.cast("string"))

  /** Deterministic uniform in [0, 1) from a row key: [[hash60]] scaled.
    * Uniform because md5 bits are; deterministic because nothing else
    * enters.
    */
  def hashUniform(key: Column): Column =
    hash60(key).cast("double") / lit(1152921504606846976.0) // 2^60

  /** Keep each row with probability `fraction`, deterministically by key. */
  def sampleByKey(df: DataFrame, keyCol: String, fraction: Double): DataFrame =
    df.filter(hashUniform(col(keyCol)) < fraction)

  /** Accept each row with its OWN per-row probability — the soft-filter /
    * quality-temperature mixing primitive: `pCol` is any expression in
    * [0, 1] (e.g. a quality score raised to a temperature power), and a
    * row survives iff its deterministic key-uniform falls below it. The
    * hard quality gate is this with a step function; modern corpus
    * recipes prefer the soft form (low-quality mass is downweighted, not
    * annihilated, preserving diversity). One narrow filter expression —
    * no shuffle, no RNG state, identical selection across runs,
    * partitionings and engines.
    */
  def acceptBy(df: DataFrame, keyCol: String, pCol: Column): DataFrame =
    df.filter(hashUniform(col(keyCol)) < pCol)

  /** Group-aware (leakage-safe) train/val/test split: the assignment
    * hashes the GROUP key — never the row — so every row of a group
    * lands in the same split by construction. Hashing the row instead
    * (the classic mistake) leaks: a user's events straddle train and
    * eval, and any model with user-level signal grades itself on data
    * it trained on. One narrow per-row expression, no shuffle, stable
    * under any repartitioning or data arrival order; new rows for a
    * known group join its split forever (hash, not state).
    *
    * `splits`: (label, fraction) in declared order; fractions must sum
    * to ~1. Returns `df` + a `split` label column.
    */
  def groupSplit(df: DataFrame, groupCol: String,
                 splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1: $splits")
    val u = hashUniform(col(groupCol))
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    // last branch is the otherwise-arm: float-sum jitter can't drop rows
    val assign = splits.init.zip(cum.init).reverse
      .foldLeft(lit(splits.last._1)) { case (acc, ((label, _), hi)) =>
        when(u < hi, label).otherwise(acc)
      }
    df.withColumn("split", assign)
  }

  /** Leakage-safe TEMPORAL split with an embargo gap — the time-series
    * sibling of [[groupSplit]] (de Prado's purged split): train takes
    * everything strictly before `boundary − embargo`, test everything at
    * or after `boundary`, and the embargo band between them is labeled
    * (not silently dropped — the caller decides, and the band stays
    * countable). The gap is the leak control: features built with
    * trailing windows (EWMA, rolling counts) computed near the boundary
    * embed post-boundary information; an embargo of at least the longest
    * feature lookback severs it. Integer-microsecond comparisons (the
    * repo's cross-engine idiom), one narrow projection, no shuffle.
    */
  def purgedTimeSplit(df: DataFrame, tsCol: String,
                      boundary: java.sql.Timestamp,
                      embargoMicros: Long): DataFrame = {
    require(embargoMicros >= 0, "embargo must be >= 0")
    val t = unix_micros(col(tsCol))
    val b = lit(boundary.toInstant.getEpochSecond * 1000000L +
      boundary.toInstant.getNano / 1000L)
    df.withColumn("split",
      when(col(tsCol).isNull, lit(null).cast("string"))
        .when(t < b - embargoMicros, "train")
        .when(t >= b, "test")
        .otherwise("embargo"))
  }

  /** Rolling-origin evaluation folds (time-series cross-validation):
    * for each cut c_i, fold i trains on ts < c_i − embargo and tests on
    * c_i ≤ ts < c_i + horizon — the walk-forward protocol that replaces
    * k-fold CV when rows are temporally dependent (random folds leak
    * future into past). Returns one row per (input row, fold) membership
    * with `fold` (0-based, in cut order) and `role` ∈ train/test; rows in
    * neither side of a fold emit nothing for it (the embargo band and the
    * post-horizon tail), so output mass is Σ_folds |train_i ∪ test_i| —
    * the ×k replication every walk-forward backtest pays, made explicit.
    * One narrow explode over a k-element literal array, no shuffle.
    */
  def rollingOriginFolds(df: DataFrame, tsCol: String,
                         cuts: Seq[java.sql.Timestamp], horizonMicros: Long,
                         embargoMicros: Long): DataFrame = {
    require(cuts.nonEmpty, "at least one cut")
    require(horizonMicros > 0 && embargoMicros >= 0)
    val t = unix_micros(col(tsCol))
    val folds = cuts.zipWithIndex.map { case (c, i) =>
      val cu = c.toInstant.getEpochSecond * 1000000L +
        c.toInstant.getNano / 1000L
      struct(lit(i.toLong).as("fold"),
        when(t < cu - embargoMicros, "train")
          .when(t >= cu && t < cu + horizonMicros, "test").as("role"))
    }
    df.filter(col(tsCol).isNotNull)
      .select(col("*"), explode(array(folds: _*)).as("__f"))
      .filter(col("__f.role").isNotNull)
      .select((df.columns.map(col) :+ col("__f.fold").as("fold") :+
        col("__f.role").as("role")): _*)
  }

  /** Per-stratum sampling fractions — the data-mixing primitive: rows in
    * stratum s survive with probability fractions(s) (default for strata
    * not listed). One narrow filter, no shuffle.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 0.0): DataFrame = {
    val frac = fractions.foldLeft(lit(defaultFraction)) { case (acc, (s, f)) =>
      when(col(strataCol) === s, f).otherwise(acc)
    }
    df.filter(hashUniform(col(keyCol)) < frac)
  }

  /** Deterministic shard assignment + within-shard position — the "global
    * training-data shuffle" done scalably: shard = hash(key) mod n,
    * position = rank of the hash within its shard. The resulting order is a
    * pure function of the keys (identical across runs, partitionings and
    * engines — a resumed job sees the same example order), and the work is
    * a per-shard window over hash-partitioned data: no global sort, no
    * single reducer, no RNG state. Hash-ordering within shards IS the
    * shuffle — adjacent input rows land in unrelated (shard, pos) slots.
    *
    * The shard is the parallel unit (one ordered window per shard), so at
    * scale pick `nShards` at least the target write parallelism — e.g.
    * thousands of output shards at 100 TB, not 8. Rows per shard ≈ n/nShards
    * is also each reducer's sort size.
    */
  def deterministicShards(df: DataFrame, keyCol: String, nShards: Int): DataFrame = {
    val h = hash60(col(keyCol))
    val w = Window.partitionBy(col("shard")).orderBy(col("__h").asc, col(keyCol).asc)
    df.withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__h")
  }

  /** Exactly k rows per stratum, deterministically: rank by the key hash
    * inside each stratum and keep the first k — the eval-set construction
    * primitive ("500 held-out docs per source"), where a fraction-based
    * sample under- or over-shoots small strata. Per-stratum windows over
    * hash-partitioned data; heavy strata stream through
    * `WindowGroupLimitExec`'s pre-shuffle group pruning (each map task
    * forwards at most k rows per stratum), so the exchange carries
    * ≤ k·|strata| rows — never the corpus.
    */
  def exactKPerStratum(df: DataFrame, strataCol: String, keyCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol)).orderBy(col("__h").asc, col(keyCol).asc)
    df.withColumn("__h", hash60(col(keyCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__h", "__rn")
  }

  /** Weighted sampling WITHOUT replacement — k rows per stratum with
    * inclusion driven by a weight column (the Efraimidis–Spirakis A-ES
    * scheme): each row draws an exponential arrival clock t = −ln(u)/w
    * from its deterministic uniform u, and the k earliest clocks per
    * stratum win. This is the quality-weighted selection primitive ("pick
    * k docs per source, favoring long/high-quality ones") — reproducible
    * like every sampler here because u is a pure function of the key.
    *
    * Cross-engine determinism: the rank basis is the clock ROUNDED to
    * 1e-9, tie-broken by key. u is bit-identical by construction
    * ([[hashUniform]]); ln and ÷ on identical doubles agree across libms
    * to ~1 ulp, which the rounding grain collapses, and md5-random clocks
    * land within 1e-9 of a rounding boundary only with negligible
    * probability — the repo's standing qround discipline. Non-positive /
    * null weights are excluded (an unweighted row must not win a slot).
    *
    * Scale shape: identical to [[exactKPerStratum]] — a narrow per-row
    * clock, then one per-stratum rank window whose WindowGroupLimit
    * pruning forwards ≤ k rows per stratum from any map task.
    */
  def weightedKPerStratum(df: DataFrame, strataCol: String, keyCol: String,
      weightCol: String, k: Int): DataFrame = {
    val clock = -log(hashUniform(col(keyCol))) / col(weightCol).cast("double")
    val w = Window.partitionBy(col(strataCol)).orderBy(col("__t").asc, col(keyCol).asc)
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__t", floor(clock * 1e9 + lit(0.5)) / 1e9)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__t", "__rn")
  }

  /** Token-budget mixture sampling: within each stratum, take documents in
    * deterministic hash order until the stratum's cumulative token count
    * reaches `budget` — "N tokens per source", the way training mixtures
    * are actually specified, rather than a row fraction. Adds `cum_tokens`
    * (the within-stratum inclusive running total of `tokenCol`) and keeps
    * rows with `cum_tokens <= budget`.
    *
    * Scale shape: one [[graft.ops.PrefixScan]] two-pass scan over the
    * global (stratum, hash, key) order — parallelism stays at the range-
    * partition count — plus a per-stratum offset table of one row per
    * stratum joined back (strata are a mixture dimension: inherently few).
    * Never a whole-stratum window funneled through one reducer.
    */
  def tokenBudget(df: DataFrame, strataCol: String, keyCol: String,
      tokenCol: String, budget: Long): DataFrame = {
    val hashed = df.withColumn("__u", hash60(col(keyCol)))
    val scanned = graft.ops.PrefixScan.cumulativeSum(hashed,
      Seq(strataCol, "__u", keyCol), tokenCol, "__gcum")
    // exclusive global offset of each stratum = total tokens of all
    // lexically-earlier strata (the scan's order), one row per stratum
    val offsets = df.groupBy(strataCol).agg(sum(col(tokenCol)).as("__stot"))
      .withColumn("__soff", coalesce(
        sum(col("__stot")).over(Window.orderBy(strataCol)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(strataCol), col("__soff"))
    scanned.join(offsets, strataCol)
      .withColumn("cum_tokens", col("__gcum") - col("__soff"))
      .filter(col("cum_tokens") <= budget)
      .drop("__u", "__gcum", "__soff")
  }

  /** Temperature (α) mixture sampling — the multilingual-LM rebalancing
    * rule (mT5 / XLM-R): stratum s receives a share of the `nTarget`-row
    * budget proportional to n_s^α, flattening the head and boosting the
    * tail as α → 0 (α = 1 is proportional sampling, i.e. no rebalance).
    * Within each stratum the selected rows are the first
    * k_s = round(nTarget · n_s^α / Σ n_t^α), capped at n_s, in
    * deterministic hash order.
    *
    * Cross-engine determinism: the only floating-point computation is the
    * per-STRATUM k_s (strata are few; a final-ulp divergence would need
    * nTarget · share to land within ~1e-12 of an integer boundary);
    * per-ROW selection is an integer rank comparison against k_s — no
    * float threshold per row, unlike probability sampling at p_s.
    *
    * Scale shape: one stratum-count aggregate (rows = |strata|), computed
    * α-shares on the driver-free small table, joined back broadcast-sized;
    * selection is the [[exactKPerStratum]] window over hash order with a
    * per-stratum k. Heavy strata stream through the rank filter; nothing
    * global.
    */
  def alphaMixture(df: DataFrame, strataCol: String, keyCol: String,
      alpha: Double, nTarget: Long): DataFrame = {
    require(alpha >= 0.0, "alpha must be non-negative")
    val counts = df.groupBy(strataCol).agg(count(lit(1)).as("__n"))
    val powed = counts.withColumn("__w", pow(col("__n").cast("double"), alpha))
    val ks = powed
      .crossJoin(broadcast(powed.agg(sum(col("__w")).as("__wsum"))))
      .withColumn("__k", least(col("__n"),
        floor(lit(nTarget.toDouble) * col("__w") / col("__wsum") + lit(0.5)).cast("long")))
      .select(col(strataCol), col("__k"))
    val w = Window.partitionBy(col(strataCol)).orderBy(col("__h").asc, col(keyCol).asc)
    df.withColumn("__h", hash60(col(keyCol)))
      .withColumn("__rn", row_number().over(w))
      .join(ks, strataCol)
      .filter(col("__rn") <= col("__k"))
      .drop("__h", "__rn", "__k")
  }

  /** Curriculum ordering: bucket rows by a difficulty score into
    * `nBuckets` equal-width bands (bucket = ⌊score·B / (max+1)⌋, one tiny
    * max-aggregate broadcast back), then emit a global round-robin
    * interleave across bands — `global_ord = pos_in_bucket·B + bucket`,
    * so consecutive training positions cycle easy→hard through every
    * band instead of front-loading one difficulty. The deterministic
    * anti-curriculum of sorted-by-length batching: an epoch order that is
    * reproducible across runs, partitionings, and engines, with
    * difficulty mixed uniformly at every prefix.
    *
    * Scale shape: the within-bucket position is a rank over hash order
    * partitioned by bucket — the same bounded-partition-count pattern as
    * [[deterministicShards]] (B reducers). A deployment whose single
    * band exceeds one reducer swaps the window for
    * [[graft.ops.PrefixScan]] exactly as [[tokenBudget]] does; the
    * emitted (bucket, pos, global_ord) contract is unchanged.
    */
  def curriculumInterleave(df: DataFrame, keyCol: String, difficultyCol: String,
      nBuckets: Int): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val mx = df.agg(max(col(difficultyCol)).as("__mx"))
    val bucketed = df.crossJoin(broadcast(mx))
      .withColumn("bucket", floor(
        (col(difficultyCol) * lit(nBuckets.toLong)).cast("double") /
          (col("__mx").cast("double") + lit(1.0))).cast("long"))
    val w = Window.partitionBy(col("bucket"))
      .orderBy(hash60(col(keyCol)).asc, col(keyCol).asc)
    bucketed.withColumn("__pos", row_number().over(w).cast("long"))
      .withColumn("global_ord", col("__pos") * lit(nBuckets.toLong) + col("bucket"))
      .drop("__mx", "__pos")
  }

  /** Balanced stratified k-fold assignment: within each stratum, rows in
    * deterministic hash order take folds round-robin — every stratum's
    * fold sizes differ by at most one, by construction, unlike plain
    * hash-mod assignment whose per-stratum balance is only ±O(√n). The
    * cross-validation splitter for grouped/imbalanced data.
    *
    * Scale shape: one rank window per stratum (the [[deterministicShards]]
    * bounded-partition pattern; swap in [[graft.ops.PrefixScan]] for
    * over-wide strata as [[tokenBudget]] does). Assignment is a pure
    * function of (stratum, key set) — reproducible across runs, engines,
    * partitionings.
    */
  def stratifiedKFold(df: DataFrame, strataCol: String, keyCol: String,
      k: Int): DataFrame = {
    require(k >= 2, "k must be at least 2")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hash60(col(keyCol)).asc, col(keyCol).asc)
    df.withColumn("fold",
      pmod(row_number().over(w) - lit(1), lit(k)).cast("long"))
  }

  /** Importance weights that reweight `src`'s stratum distribution onto
    * `tgt`'s: w_s = p_tgt(s) / p_src(s), one row per stratum present in
    * BOTH corpora, with the effective sample size of the reweighted
    * source attached — ESS = (Σ n_s·w_s)² / (Σ n_s·w_s²), the honesty
    * metric of any reweighting (ESS ≪ n means the weights concentrate
    * on a sliver and the "matched" corpus is effectively tiny).
    *
    * Scale shape: two stratum-count aggregates (|strata|-sized), 1-row
    * total broadcasts, and a |strata|-row summary — rows never rescan.
    * The ESS sums run over |strata| doubles; at the repo's 6dp rounding
    * a fold-order ulp cannot surface (the [[q_mutual_info]] precedent).
    */
  def importanceWeights(src: DataFrame, tgt: DataFrame,
      strataCol: String): DataFrame = {
    val sc = src.groupBy(col(strataCol)).agg(count(lit(1)).as("n_src"))
    val tc = tgt.groupBy(col(strataCol)).agg(count(lit(1)).as("n_tgt"))
    val sTot = sc.agg(sum(col("n_src")).as("__st"))
    val tTot = tc.agg(sum(col("n_tgt")).as("__tt"))
    val w = sc.join(tc, strataCol)
      .crossJoin(broadcast(sTot)).crossJoin(broadcast(tTot))
      .withColumn("w",
        (col("n_tgt").cast("double") / col("__tt").cast("double")) /
          (col("n_src").cast("double") / col("__st").cast("double")))
      .select(col(strataCol), col("n_src"), col("n_tgt"), col("w"))
    val ess = w.agg(
      (sum(col("n_src").cast("double") * col("w")) *
        sum(col("n_src").cast("double") * col("w")) /
        sum(col("n_src").cast("double") * (col("w") * col("w")))).as("ess"))
    w.crossJoin(broadcast(ess))
  }

  /** Padding-waste report for fixed-size training batches: tokens padded
    * to each batch's max length under (a) length-sorted batching and
    * (b) hash-order (random) batching — the table that justifies length
    * bucketing, with the waste stated as the fraction of padded compute.
    * All counts are exact integers; only the final fraction is a double.
    *
    * Scale shape: each strategy's global rank is a [[graft.ops.PrefixScan]]
    * pass (never a one-reducer window); batches aggregate map-side by
    * `(rank-1) div batchSize`, and the per-strategy summary is 1 row.
    */
  def paddingWaste(df: DataFrame, keyCol: String, tokenCol: String,
      batchSize: Int): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    val base = df.filter(col(tokenCol).isNotNull && col(keyCol).isNotNull)
      .select(col(keyCol).as("__k"), col(tokenCol).cast("long").as("__tok"))
      .withColumn("__one", lit(1L))
    def report(orderCols: Seq[String], label: String): DataFrame = {
      val ranked = graft.ops.PrefixScan.cumulativeSum(base
          .withColumn("__h", hash60(col("__k"))),
        orderCols, "__one", "__rnk")
      val batches = ranked
        .withColumn("__b",
          floor((col("__rnk") - lit(1L)) / lit(batchSize.toDouble)).cast("long"))
        .groupBy("__b")
        .agg(count(lit(1)).as("__n"), max(col("__tok")).as("__mx"),
          sum(col("__tok")).as("__sum"))
      batches.agg(
          count(lit(1)).as("n_batches"),
          sum(col("__sum")).as("total_tokens"),
          sum(col("__n") * col("__mx") - col("__sum")).as("padded_tokens"))
        .withColumn("strategy", lit(label))
        .withColumn("waste_frac", col("padded_tokens").cast("double") /
          (col("padded_tokens") + col("total_tokens")).cast("double"))
    }
    report(Seq("__tok", "__k"), "sorted")
      .unionByName(report(Seq("__h", "__k"), "hash"))
      .select(col("strategy"), col("n_batches"), col("total_tokens"),
        col("padded_tokens"), col("waste_frac"))
  }

  /** Neyman optimal allocation (Neyman 1934): split a sampling budget B
    * across strata proportional to N_h·S_h — the size-times-spread rule
    * that minimizes the variance of the stratified mean estimator. The
    * sizing pass a stratified eval-set or labeling budget runs BEFORE
    * [[exactKPerStratum]] draws the rows: a high-variance stratum earns
    * more than its population share, a constant one almost nothing.
    *
    * Exactness: INTEGRAL values (cents/counts); per-stratum (n, Σv, Σv²)
    * accumulate DECIMAL(38,0) (the robustMeans widening), S_h is one
    * fixed IEEE expression of them; the allocation weights N_h·S_h
    * quantize to a 1e-6 grid and total as exact longs (no float sum
    * order), so every n_h is a fixed expression of exact operands.
    * Rounded allocations are reported per stratum and may differ from B
    * by ±|strata| (largest-remainder correction is the caller's policy
    * choice).
    *
    * Scale shape: ONE map-side-combined per-stratum aggregate over the
    * scan; everything after runs on the |strata|-row table.
    */
  def neymanAllocation(df: DataFrame, strataCol: String, valueCol: String,
                       budget: Long): DataFrame = {
    require(budget > 0)
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val v = col(valueCol).cast("long")
    val perStratum = df
      .filter(col(strataCol).isNotNull && v.isNotNull)
      .groupBy(col(strataCol).as("stratum"))
      .agg(count(lit(1)).as("n_pop"), sum(v.cast(dec)).as("sv"),
        sum(v.cast(dec) * v).as("qv"))
    val mean = col("sv").cast("double") / col("n_pop")
    val sd = sqrt(col("qv").cast("double") / col("n_pop") - mean * mean)
    val wAll = Window.partitionBy(lit(1)).rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    perStratum
      .withColumn("sd", sd)
      .withColumn("wq", floor(col("n_pop") * col("sd") * 1e6 + lit(0.5))
        .cast("long"))
      .withColumn("wq_tot", sum(col("wq")).over(wAll))
      .select(col("stratum"), col("n_pop"), col("sd"),
        (col("wq").cast("double") / col("wq_tot")).as("share"),
        when(col("wq_tot") > 0,
          floor(lit(budget.toDouble) * col("wq") / col("wq_tot") + lit(0.5))
            .cast("long")).as("n_alloc"))
  }
}

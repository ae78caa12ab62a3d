package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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

  /** CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM 2013):
    * adjust an experiment metric y by a pre-experiment covariate x,
    * ŷ = y − θ·(x − x̄), with θ = cov(x,y)/var(x) POOLED over all arms —
    * the industry-standard way to shrink A/B confidence intervals
    * without touching the treatment effect (x predates assignment, so
    * E[x | arm] is equal across arms and the adjustment is unbiased).
    *
    * Exactness contract: INTEGRAL x and y (cents / counts — the
    * [[groupOls]] idiom). All moments (n, Σx, Σy, Σxy, Σx², Σy²)
    * accumulate as DECIMAL(38,0) — exact at any row count (a LongType
    * sum of products wraps silently past 2^63 at ~10^10 cent-scale
    * rows, while the oracle engine promotes to a 128-bit sum: the
    * engines would diverge exactly at scale); the pooled moments are
    * exact sums of those; θ, the adjusted means, and the population
    * variances are fixed IEEE expressions of exact operands —
    * bit-identical cross-engine, no accumulation order anywhere.
    *
    * Scale shape: ONE map-side-combined per-arm aggregate (6 moments,
    * fixed width); pooled moments come from a window over the
    * |arms|-row result — never a second pass over the fact table.
    * Listwise null exclusion (a row must bring both x and y, and a
    * non-null arm — a NULL arm would otherwise form its own group and
    * contaminate pooled θ and the global x̄).
    *
    * Returns one row per arm: n, raw/adjusted means, θ, population
    * var(y), var(ŷ) = var(y) − 2θ·cov + θ²·var(x), and the variance
    * reduction 1 − var(ŷ)/var(y) (null when var degenerates).
    */
  def cuped(df: DataFrame, armCol: String, yCol: String, xCol: String)
      : DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val x = col(xCol).cast("long"); val y = col(yCol).cast("long")
    val xd = x.cast(dec); val yd = y.cast(dec)
    val perArm = df
      .filter(col(armCol).isNotNull &&
        col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(armCol))
      .agg(count(lit(1)).as("n"), sum(xd).as("sx"), sum(yd).as("sy"),
        sum(xd * y).as("sxy"), sum(xd * x).as("sxx"), sum(yd * y).as("syy"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
    val g = perArm
      .withColumn("gn", sum(col("n")).over(wAll))
      .withColumn("gsx", sum(col("sx")).over(wAll))
      .withColumn("gsy", sum(col("sy")).over(wAll))
      .withColumn("gsxy", sum(col("sxy")).over(wAll))
      .withColumn("gsxx", sum(col("sxx")).over(wAll))
    // pooled θ and global x̄ — fixed operand order, mirrored by the oracle
    val covN = col("gn").cast("double") * col("gsxy") -
      col("gsx").cast("double") * col("gsy")
    val varXN = col("gn").cast("double") * col("gsxx") -
      col("gsx").cast("double") * col("gsx")
    val theta = when(varXN > 0, covN / varXN)
    val xbarG = col("gsx").cast("double") / col("gn")
    // per-arm population moments
    val meanY = col("sy").cast("double") / col("n")
    val meanX = col("sx").cast("double") / col("n")
    val varY = col("syy").cast("double") / col("n") - meanY * meanY
    val varX = col("sxx").cast("double") / col("n") - meanX * meanX
    val covA = col("sxy").cast("double") / col("n") - meanX * meanY
    val varAdj = varY - lit(2.0) * theta * covA + theta * theta * varX
    g.select(col(armCol), col("n"),
      meanY.as("mean_y"), meanX.as("mean_x"),
      (meanY - theta * (meanX - xbarG)).as("mean_y_adj"),
      theta.as("theta"), varY.as("var_y"), varAdj.as("var_y_adj"),
      when(varY > 0, lit(1.0) - varAdj / varY).as("var_reduction"))
  }

  /** Covariate balance audit — standardized mean difference per covariate
    * between two arms, SMD = (x̄_A − x̄_B) / √((s²_A + s²_B)/2), the table
    * every experiment/observational-matching readout opens with (|SMD| >
    * 0.1 is the conventional imbalance flag — Austin 2009). The
    * pre-flight [[cuped]] and uplift readouts assume: arms that differ on
    * a pre-treatment covariate confound the effect.
    *
    * Exactness contract: INTEGRAL covariates ([[groupOls]] idiom); ONE
    * map-side-combined aggregate produces every (Σx, Σx², n) per arm as
    * exact DECIMAL(38,0) — overflow-free at any row count, matching the
    * oracle engine's 128-bit sum promotion
    * (listwise null exclusion across all covariates, the
    * [[logregGdStep]] shared-n discipline); means, population variances,
    * and SMD are fixed IEEE expressions of them. The balanced flag
    * thresholds |SMD| ROUNDED to 6dp, so the decision can't straddle an
    * ulp. Null SMD where a pooled variance degenerates to 0.
    *
    * Scale shape: one 1-row aggregate over the scan (2·|covariates|·2+2
    * numbers wide), then a literal ×|covariates| explode of that row —
    * nothing else moves.
    */
  def covariateBalance(df: DataFrame, armACol: Column,
      covariates: Seq[(String, Column)]): DataFrame = {
    require(covariates.nonEmpty, "need at least one covariate")
    val names = covariates.map(_._1)
    val arm = armACol.cast("boolean")
    val base = df
      .select(covariates.map { case (n, c) => c.cast("long").as(s"__x_$n") } :+
        arm.as("__a"): _*)
      .filter(names.map(n => col(s"__x_$n").isNotNull).reduce(_ && _) &&
        col("__a").isNotNull)
    // decimal-widened moments: a LongType Σx² wraps silently past 2^63
    // (~10^10 cent-scale rows) while the oracle engine promotes to a
    // 128-bit sum — the cuped/robustMeans widening discipline
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val aggs = names.flatMap { n =>
      val x = col(s"__x_$n"); val xd = x.cast(dec)
      val zero = lit(0L).cast(dec)
      Seq(
        sum(when(col("__a"), xd).otherwise(zero)).as(s"__sa_$n"),
        sum(when(col("__a"), xd * x).otherwise(zero)).as(s"__qa_$n"),
        sum(when(!col("__a"), xd).otherwise(zero)).as(s"__sb_$n"),
        sum(when(!col("__a"), xd * x).otherwise(zero)).as(s"__qb_$n"))
    }
    val stats = base.agg(count_if(col("__a")).as("__na"),
      (count_if(!col("__a")).as("__nb") +: aggs): _*)
    val rows = names.map { n =>
      val ma = col(s"__sa_$n").cast("double") / col("__na")
      val mb = col(s"__sb_$n").cast("double") / col("__nb")
      val va = col(s"__qa_$n").cast("double") / col("__na") - ma * ma
      val vb = col(s"__qb_$n").cast("double") / col("__nb") - mb * mb
      val pooled = (va + vb) / lit(2.0)
      val smd = when(col("__na") > 0 && col("__nb") > 0 && pooled > 0,
        (ma - mb) / sqrt(pooled))
      struct(lit(n).as("covariate"), ma.as("mean_a"), mb.as("mean_b"),
        va.as("var_a"), vb.as("var_b"), smd.as("smd"))
    }
    stats
      .select(col("__na").as("n_a"), col("__nb").as("n_b"),
        explode(array(rows: _*)).as("f"))
      .select(col("f.covariate").as("covariate"), col("n_a"), col("n_b"),
        col("f.mean_a").as("mean_a"), col("f.mean_b").as("mean_b"),
        col("f.var_a").as("var_a"), col("f.var_b").as("var_b"),
        col("f.smd").as("smd"),
        when(col("f.smd").isNotNull,
          abs(floor(col("f.smd") * 1e6 + lit(0.5)) / 1e6) <= 0.1)
          .as("balanced"))
  }

  /** One full-batch gradient-descent step of logistic regression from
    * w = 0 — the distributed-training primitive reduced to its Spark
    * shape: a gradient is a map-side-combined SUM of per-row terms, a
    * step is a broadcast of the updated weights, and convergence
    * evidence is loss(w¹) < loss(w⁰). Not a trainer (the reference
    * delegates model fitting to sklearn, SURVEY §2.9) — this pins the
    * data-parallel mechanics a 1000-executor fit is made of.
    *
    * At w⁰ = 0 the sigmoid is exactly ½, so the first gradient is
    * RATIONAL: ∂L/∂w_j = Σ(½ − y)·x_j / n = (Σx_j − 2·Σ_{y=1}x_j)/(2n)
    * — integer numerator, one division; loss⁰ = ln 2 exactly. The step
    * w¹_j = lr·(2·Σ_{y=1}x_j − Σx_j)/(2n) is one fixed IEEE expression
    * of exact operands. Pass 2 broadcasts w¹, computes per row (in
    * literal feature order) z = Σ w¹_j·x_j, e = exp(z), p = e/(1+e),
    * loss = ln(1+e) − y·z, grad_j = (p − y)·x_j, and makes the sums
    * ORDER-FREE by the per-term fixed-point idiom: each term quantizes
    * to a 1e-9 long and sums as integers, so no float accumulation
    * order exists to disagree on cross-engine.
    *
    * Exactness contract: INTEGRAL feature columns and 0/1 label; the
    * caller scales features so |w¹·x| stays small (≲1 — e.g. raw counts
    * with lr ~ 1e-8), keeping exp well-conditioned.
    *
    * Scale shape: two map-side-combined 1-row aggregates over the fact
    * table; weights move by broadcast; nothing else shuffles. Rows with
    * any null feature or label are excluded (listwise, shared n).
    *
    * Returns one row per feature: (feature, n, grad0, w1, grad1, loss0,
    * loss1) — loss/step scalars repeated on each row.
    */
  def logregGdStep(df: DataFrame, features: Seq[(String, Column)],
                   labelCol: Column, lr: Double): DataFrame = {
    require(features.nonEmpty, "need at least one feature")
    val names = features.map(_._1)
    val base = df
      .select(features.map { case (n, c) => c.cast("long").as(s"__x_$n") } :+
        labelCol.cast("long").as("__y"): _*)
      .filter(names.map(n => col(s"__x_$n").isNotNull)
        .reduce(_ && _) && col("__y").isNotNull)
    val aggs = names.flatMap { n =>
      Seq(sum(col(s"__x_$n")).as(s"__sx_$n"),
        sum(when(col("__y") === 1L, col(s"__x_$n")).otherwise(0L)).as(s"__sxy_$n"))
    }
    val stats = base.agg(count(lit(1)).as("__n"), aggs: _*)
    // w¹_j = lr · (2·Σ_{y=1}x_j − Σx_j) / (2n): fixed operand order
    val weights = stats.select(col("*") +: names.map { n =>
      ((lit(lr) * (lit(2L) * col(s"__sxy_$n") - col(s"__sx_$n")).cast("double")) /
        (lit(2L) * col("__n"))).as(s"__w_$n")
    }: _*)
    val rows2 = base.crossJoin(broadcast(weights))
    val z = names.map(n => col(s"__w_$n") * col(s"__x_$n").cast("double"))
      .reduce(_ + _)
    val ez = exp(z)
    val p = ez / (lit(1.0) + ez)
    val lossRow = log(lit(1.0) + ez) - col("__y") * z
    val agg2 = rows2.agg(
      sum(floor(lossRow * 1e9 + lit(0.5)).cast("long")).as("__lq"),
      names.map { n =>
        sum(floor((p - col("__y")) * col(s"__x_$n").cast("double") * 1e9 +
          lit(0.5)).cast("long")).as(s"__gq_$n")
      }: _*)
    val both = weights.crossJoin(agg2)
    val rows = names.map { n =>
      struct(lit(n).as("feature"),
        ((col(s"__sx_$n") - lit(2L) * col(s"__sxy_$n")).cast("double") /
          (lit(2L) * col("__n"))).as("grad0"),
        col(s"__w_$n").as("w1"),
        (col(s"__gq_$n").cast("double") / 1e9 / col("__n")).as("grad1"))
    }
    both.select(col("__n").as("n"),
        (col("__lq").cast("double") / 1e9 / col("__n")).as("loss1"),
        explode(array(rows: _*)).as("f"))
      .select(col("f.feature").as("feature"), col("n"),
        col("f.grad0").as("grad0"), col("f.w1").as("w1"),
        col("f.grad1").as("grad1"), lit(math.log(2.0)).as("loss0"),
        col("loss1"))
  }

  /** Standardized effect sizes per test for a continuous outcome — the
    * companion number every significance test needs (a z-score says a
    * difference EXISTS; at 10⁹ rows everything "exists" — Cohen's d says
    * whether it is big enough to act on):
    *
    *   d     = (x̄_A − x̄_B) / s_pooled       (Cohen 1988)
    *   g     = J·d, J = 1 − 3/(4(n_A+n_B) − 9)   (Hedges 1981 small-n
    *                                              bias correction)
    *   glass = (x̄_A − x̄_B) / s_B            (Glass Δ: control-arm sd,
    *                                          for variance-shifted arms)
    *
    * Exactness: integral values; one map-side-combined aggregate carries
    * both arms' (n, Σv, Σv²) with products widened to decimal(38,0) (the
    * [[cuped]] discipline); every readout is a fixed IEEE expression of
    * those exact moments. NULL d/g when either arm has < 2 rows or the
    * pooled deviation is 0; NULL glass when s_B = 0.
    *
    * Scale shape: ONE grouped aggregate over the scan → |tests| rows of
    * closed-form algebra. Nothing else moves.
    */
  def effectSizes(df: DataFrame, testCol: String, armACol: Column,
      valueCol: String): DataFrame = {
    val dec   = org.apache.spark.sql.types.DecimalType(38, 0)
    val dec19 = org.apache.spark.sql.types.DecimalType(19, 0)
    val arm = armACol.cast("boolean")
    val v = col(valueCol).cast("long")
    val vd = v.cast(dec19)
    val g = df
      .filter(col(testCol).isNotNull && arm.isNotNull && v.isNotNull)
      .groupBy(col(testCol))
      .agg(
        count_if(arm).as("n_a"), count_if(!arm).as("n_b"),
        sum(when(arm, vd.cast(dec)).otherwise(lit(0L).cast(dec))).as("s_a"),
        sum(when(!arm, vd.cast(dec)).otherwise(lit(0L).cast(dec))).as("s_b"),
        sum(when(arm, (vd * vd).cast(dec)).otherwise(lit(0L).cast(dec))).as("q_a"),
        sum(when(!arm, (vd * vd).cast(dec)).otherwise(lit(0L).cast(dec))).as("q_b"))
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val sa = col("s_a").cast("double"); val sb = col("s_b").cast("double")
    val ssdA = col("q_a").cast("double") - sa * sa / na
    val ssdB = col("q_b").cast("double") - sb * sb / nb
    val diff = sa / na - sb / nb
    val sPool = sqrt((ssdA + ssdB) / (na + nb - 2.0))
    val sB = sqrt(ssdB / (nb - 1.0))
    val j = lit(1.0) - lit(3.0) / (lit(4.0) * (na + nb) - 9.0)
    val okPool = col("n_a") > 1 && col("n_b") > 1 && (ssdA + ssdB) > 0
    g.select(col(testCol), col("n_a"), col("n_b"),
      when(col("n_a") > 0 && col("n_b") > 0, diff).as("diff"),
      when(okPool, diff / sPool).as("cohen_d"),
      when(okPool, j * (diff / sPool)).as("hedges_g"),
      when(col("n_a") > 0 && col("n_b") > 1 && ssdB > 0, diff / sB)
        .as("glass_delta"))
  }

  /** Difference-in-differences estimator over a 2×2 (arm × period)
    * design — the quasi-experimental effect readout when assignment
    * isn't randomized but BOTH arms share a pre-period trend:
    *
    *   DiD = (ȳ_{T,post} − ȳ_{T,pre}) − (ȳ_{C,post} − ȳ_{C,pre})
    *   SE  = √(Σ_cells s²_cell / n_cell)   (unpooled, Welch-style)
    *
    * with s² the cell's unbiased variance. Complements [[cuped]] (which
    * needs randomized arms) — DiD is what an observational rollout
    * reads. The parallel-trends assumption is the CALLER's to defend;
    * the estimator is exact given it.
    *
    * Exactness: `valueCol` integral; all four cell moments (n, Σy, Σy²)
    * are exact decimal sums from ONE aggregate; means, DiD, SE and t
    * are fixed IEEE readouts (callers qround). NULL se/t when any cell
    * has n < 2 or zero spread.
    *
    * Scale shape: one map-side-combined 1-row aggregate carrying all
    * twelve moments; nothing else moves.
    */
  def diffInDiff(df: DataFrame, treatedCol: Column, postCol: Column,
      valueCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val t = treatedCol.cast("boolean"); val p = postCol.cast("boolean")
    val v = col(valueCol).cast("long")
    val vd = v.cast(DecimalType(19, 0))
    def cell(name: String, cond: Column) = Seq(
      sum(when(cond, 1L).otherwise(0L)).as(s"n_$name"),
      sum(when(cond, vd.cast(dec)).otherwise(lit(0L).cast(dec))).as(s"s_$name"),
      sum(when(cond, (vd * vd).cast(dec)).otherwise(lit(0L).cast(dec)))
        .as(s"q_$name"))
    val aggs = cell("t_pre", t && !p) ++ cell("t_post", t && p) ++
      cell("c_pre", !t && !p) ++ cell("c_post", !t && p)
    val g = df.filter(t.isNotNull && p.isNotNull && v.isNotNull)
      .agg(aggs.head, aggs.tail: _*)
    def mean(name: String) =
      col(s"s_$name").cast("double") / col(s"n_$name")
    def varTerm(name: String) = {
      val n = col(s"n_$name").cast("double")
      ((col(s"q_$name").cast("double") -
        col(s"s_$name").cast("double") * col(s"s_$name").cast("double") / n) /
        (n - 1.0)) / n
    }
    val did = (mean("t_post") - mean("t_pre")) -
      (mean("c_post") - mean("c_pre"))
    val se2 = Seq("t_pre", "t_post", "c_pre", "c_post").map(varTerm)
      .reduce(_ + _)
    val allCells = Seq("t_pre", "t_post", "c_pre", "c_post")
      .map(n => col(s"n_$n") > 1).reduce(_ && _)
    g.select(
      col("n_t_pre"), col("n_t_post"), col("n_c_pre"), col("n_c_post"),
      mean("t_pre").as("m_t_pre"), mean("t_post").as("m_t_post"),
      mean("c_pre").as("m_c_pre"), mean("c_post").as("m_c_post"),
      when(allCells, did).as("did"),
      when(allCells && se2 > 0, sqrt(se2)).as("se"),
      when(allCells && se2 > 0, did / sqrt(se2)).as("t_stat"))
  }
}

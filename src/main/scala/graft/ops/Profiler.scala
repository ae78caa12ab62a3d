package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Single-pass data profiling and declarative constraint validation —
  * the ingest-gate layer a 100 TB pipeline runs before anything else
  * touches a batch (the reference validates per-record in Python inside
  * `data_extractor.py`; this is the set-at-a-time equivalent).
  *
  * Shapes:
  *  - `profile` is ONE aggregate job over all requested columns. The
  *    multi-column exact distinct counts lower to Catalyst's Expand (one
  *    scan, expand factor = #cols) with partial aggregation below the
  *    shuffle, so the exchange carries per-group partials, not rows.
  *  - Row-level constraints (`NotNull`/`InRange`/`InSet`/`Matches`) fold
  *    into the SAME single aggregate as conditional counts.
  *  - `Unique` rides the expand path (count − distinct-count). The only
  *    constraint needing a second plan is `ForeignKey` (an anti-join
  *    count; AQE picks broadcast when the dim is small).
  *
  * Long-format output keeps values typed: numeric facts in `value_num`
  * (exact min/max — no aggregation arithmetic, so doubles are bit-stable
  * cross-engine), string facts in `value_str` (binary collation min/max).
  */
object Profiler {

  /** Per-column metrics over one scan: n_rows (per column for a uniform
    * long format), n_nulls, n_distinct (exact, null excluded), min/max.
    * Output: (col_name, metric, value_num, value_str) — min/max of string
    * columns land in value_str, numeric/temporal in value_num (temporal as
    * epoch micros to stay in exact integer space).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val schema = df.schema
    def numCol(c: String): org.apache.spark.sql.Column = schema(c).dataType match {
      // NTZ parquet timestamps cast through TimestampType in the UTC
      // session, matching the oracle's epoch_us on naive values
      case TimestampType | TimestampNTZType =>
        unix_micros(col(c).cast(TimestampType)).cast("double")
      case _: NumericType => col(c).cast("double")
      case _ => lit(null).cast("double")
    }
    def isStr(c: String): Boolean = schema(c).dataType == StringType

    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}__n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__n_nulls"),
        count_distinct(col(c)).as(s"${c}__n_distinct")) ++
        (if (isStr(c)) Seq(min(col(c)).as(s"${c}__min_s"), max(col(c)).as(s"${c}__max_s"))
         else Seq(min(numCol(c)).as(s"${c}__min_n"), max(numCol(c)).as(s"${c}__max_n")))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)

    val rows = cols.flatMap { c =>
      val base = Seq(
        struct(lit(c).as("col_name"), lit("n_rows").as("metric"),
          col(s"${c}__n_rows").cast("double").as("value_num"),
          lit(null).cast("string").as("value_str")),
        struct(lit(c).as("col_name"), lit("n_nulls").as("metric"),
          col(s"${c}__n_nulls").cast("double").as("value_num"),
          lit(null).cast("string").as("value_str")),
        struct(lit(c).as("col_name"), lit("n_distinct").as("metric"),
          col(s"${c}__n_distinct").cast("double").as("value_num"),
          lit(null).cast("string").as("value_str")))
      val mm =
        if (isStr(c))
          Seq(
            struct(lit(c).as("col_name"), lit("min").as("metric"),
              lit(null).cast("double").as("value_num"), col(s"${c}__min_s").as("value_str")),
            struct(lit(c).as("col_name"), lit("max").as("metric"),
              lit(null).cast("double").as("value_num"), col(s"${c}__max_s").as("value_str")))
        else
          Seq(
            struct(lit(c).as("col_name"), lit("min").as("metric"),
              col(s"${c}__min_n").as("value_num"), lit(null).cast("string").as("value_str")),
            struct(lit(c).as("col_name"), lit("max").as("metric"),
              col(s"${c}__max_n").as("value_num"), lit(null).cast("string").as("value_str")))
      base ++ mm
    }
    wide.select(explode(array(rows: _*)).as("m")).select("m.*")
  }

  /** Order-free per-shard content manifest — the integrity check for
    * moving 100 TB between systems: after any reshuffle/rewrite/engine
    * swap, two copies hold exactly the same rows iff their manifests
    * match, because every entry is an ORDER-INSENSITIVE fold (count,
    * XOR of row fingerprints, exact decimal sum of fingerprints) over a
    * deterministic hash shard. XOR catches any odd multiset difference,
    * the sum catches the XOR's blind spot (a row duplicated twice while
    * another vanishes twice), and the count pins total mass — together a
    * practically collision-proof certificate at KB size per shard.
    *
    * Row fingerprints hash the canonical string repr
    * `coalesce(col, U+0002)` joined on U+0001, via the repo-wide
    * md5-60-bit derivation — callers pass integer/string
    * columns (or pre-canonicalized numerics): float-to-string formatting
    * is NOT engine-portable, row bytes are. One narrow projection + one
    * map-side-combined shard aggregate; nothing else moves.
    *
    * Representation contract (round 12): every output column is BIGINT
    * or VARCHAR — never DECIMAL. A certificate whose whole purpose is
    * byte-identical cross-engine comparison must not depend on how a
    * consumer renders wide decimals: a DECIMAL(38,0) sum of 60-bit
    * fingerprints exceeds 2^53 at a few thousand rows, so any consumer
    * that passes it through float64 (or formats scale/exponent
    * differently across releases) reports divergence on identical data
    * — exactly the round-11 driver failure mode on `q_integrity_
    * manifest`. The exact fingerprint sum is still accumulated
    * decimal-wide internally (overflow-free at any scale) but is
    * EMITTED as `sum_mod` = sum mod 2^61−1, a plain int64 both engines
    * and every client stack move losslessly; the XOR additionally
    * ships as a zero-padded lowercase hex STRING. The mod keeps the
    * sum's duplicate-pair blind-spot coverage (a collision needs the
    * multiset delta to be ≡ 0 mod a 61-bit prime AND xor-neutral AND
    * count-neutral per shard).
    */
  def contentManifest(df: DataFrame, valueCols: Seq[String],
                      nShards: Int): DataFrame = {
    require(nShards >= 1 && valueCols.nonEmpty)
    val dec = DecimalType(38, 0)
    val repr = concat_ws("\u0001",
      valueCols.map(c => coalesce(col(c).cast("string"), lit("\u0002"))): _*)
    val fp = graft.functions.Md5Hash60.hash60(repr)
    val mersenne61 = new java.math.BigDecimal((1L << 61) - 1)
    df.select(fp.as("__fp"))
      .withColumn("shard", pmod(col("__fp"), lit(nShards.toLong)))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(__fp)").as("xor_fp"),
        sum(col("__fp").cast(dec)).as("__sum"))
      .select(col("shard"), col("n_rows"), col("xor_fp"),
        format_string("%015x", col("xor_fp")).as("xor_hex"),
        pmod(col("__sum"), lit(mersenne61)).cast("long").as("sum_mod"))
  }

  /** Drift report between two snapshots' [[profile]]s — the
    * schema/statistics diff a pipeline runs on every new batch before
    * accepting it: did a column's null rate jump, its distinct count
    * collapse, its min/max escape the historical envelope? One row per
    * (column, metric) with both sides, a null-safe `changed` flag, and
    * the numeric relative delta (null when the old value is 0 or the
    * metric is a string min/max).
    *
    * Scale shape: two [[profile]] passes (one aggregate job each over
    * their scan) + a join of two 5·|cols|-row tables — the diff itself
    * is constant-sized.
    */
  def profileDiff(oldDf: DataFrame, newDf: DataFrame,
                  cols: Seq[String]): DataFrame = {
    val o = profile(oldDf, cols).select(col("col_name"), col("metric"),
      col("value_num").as("old_num"), col("value_str").as("old_str"))
    val n = profile(newDf, cols).select(col("col_name"), col("metric"),
      col("value_num").as("new_num"), col("value_str").as("new_str"))
    o.join(n, Seq("col_name", "metric"), "full_outer")
      .select(col("col_name"), col("metric"),
        col("old_num"), col("new_num"), col("old_str"), col("new_str"),
        (!(col("old_num") <=> col("new_num")) ||
          !(col("old_str") <=> col("new_str"))).as("changed"),
        when(col("old_num").isNotNull && col("old_num") =!= 0.0,
          (col("new_num") - col("old_num")) / col("old_num")).as("rel_delta"))
  }

  /** Declarative constraints. Row-level ones are aggregated in one pass;
    * `Unique` joins that pass via the expand path; `ForeignKey` is an
    * anti-join count against the dimension.
    */
  sealed trait Constraint { def name: String }
  /** col must be non-null. */
  final case class NotNull(colName: String) extends Constraint {
    val name = s"not_null($colName)"
  }
  /** lo ≤ col ≤ hi (nulls do not violate — compose with NotNull). */
  final case class InRange(colName: String, lo: Double, hi: Double) extends Constraint {
    val name = s"in_range($colName)"
  }
  /** col ∈ values (nulls do not violate). */
  final case class InSet(colName: String, values: Seq[String]) extends Constraint {
    val name = s"in_set($colName)"
  }
  /** col RLIKE regex (nulls do not violate). Keep the pattern in the
    * POSIX-compatible subset if an external oracle must agree. */
  final case class Matches(colName: String, regex: String) extends Constraint {
    val name = s"matches($colName)"
  }
  /** The column set must have no duplicate combination (null-safe: rows
    * with any null in the set are excluded, SQL-UNIQUE style). Violations =
    * excess rows beyond one per distinct combination. */
  final case class Unique(colNames: Seq[String]) extends Constraint {
    val name = s"unique(${colNames.mkString(",")})"
  }
  /** Every non-null fact key must exist in the dimension. */
  final case class ForeignKey(colName: String, dim: DataFrame, dimCol: String) extends Constraint {
    val name = s"foreign_key($colName)"
  }

  /** Output: (constraint_name, violations) — `constraint` itself is a
    * reserved word in ANSI-ish engines. A constraint passes iff violations
    * is 0 — keeping the count (not a boolean) makes the result useful for
    * triage and keeps the schema engine-neutral.
    */
  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    val rowLevel = constraints.collect {
      case c: NotNull => c.name -> col(c.colName).isNull
      case c: InRange => c.name -> (col(c.colName).isNotNull &&
        (col(c.colName) < c.lo || col(c.colName) > c.hi))
      case c: InSet => c.name -> (col(c.colName).isNotNull &&
        !col(c.colName).isInCollection(c.values))
      case c: Matches => c.name -> (col(c.colName).isNotNull &&
        !col(c.colName).rlike(c.regex))
    }
    val uniques = constraints.collect { case c: Unique => c }
    val fks = constraints.collect { case c: ForeignKey => c }

    val aggExprs =
      rowLevel.map { case (n, cond) => sum(when(cond, 1L).otherwise(0L)).as(n) } ++
        uniques.map { c =>
          val nonNull = c.colNames.map(col(_).isNotNull).reduce(_ && _)
          (count(when(nonNull, 1L)) -
            count_distinct(when(nonNull, struct(c.colNames.map(col): _*)))).as(c.name)
        }

    val spark = df.sparkSession
    import spark.implicits._
    val aggregated: DataFrame =
      if (aggExprs.isEmpty) spark.emptyDataFrame
      else {
        val wide = df.agg(aggExprs.head, aggExprs.tail: _*)
        val pairs = (rowLevel.map(_._1) ++ uniques.map(_.name)).map { n =>
          struct(lit(n).as("constraint_name"), col(n).cast("long").as("violations"))
        }
        wide.select(explode(array(pairs: _*)).as("c")).select("c.*")
      }

    val fkCounts = fks.map { c =>
      df.select(col(c.colName)).filter(col(c.colName).isNotNull)
        .join(c.dim.select(col(c.dimCol).as(c.colName)).distinct(),
          Seq(c.colName), "left_anti")
        .agg(count(lit(1)).cast("long").as("violations"))
        .select(lit(c.name).as("constraint_name"), col("violations"))
    }

    (Seq(aggregated).filter(_ => aggExprs.nonEmpty) ++ fkCounts)
      .reduceOption(_.unionByName(_))
      .getOrElse(Seq.empty[(String, Long)].toDF("constraint_name", "violations"))
  }

  /** Join-key skew diagnosis — the pre-flight check before any large keyed
    * shuffle: one row (n, n_keys, max_c, p50, p99, skew_ratio,
    * suggested_salt) where skew_ratio = max key count / mean key count and
    * suggested_salt = ⌈skew_ratio⌉ (the salt factor that levels the
    * hottest key to roughly the average partition load — the input
    * `Partitioning.saltedAgg/saltedJoin` expect).
    *
    * Exactness: counts are exact longs; the p50/p99 frequency quantiles
    * use [[Aggregates.groupedQuantiles]] lower semantics (pure integer
    * comparisons); skew_ratio is one IEEE expression of exact longs and
    * suggested_salt its ceil — deterministic cross-engine.
    *
    * Scale shape: ONE corpus-mass shuffle (the per-key count aggregate,
    * map-side combined, checkpointed for its two consumers); the quantile
    * pass collapses |keys| rows to |distinct frequency values| (tiny — the
    * window partition is frequency-value-bounded); totals are a 1-row
    * aggregate over the key counts. Nothing driver-side.
    */
  def keySkew(df: DataFrame, keyCol: String): DataFrame = {
    val kc = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("c"))
      .localCheckpoint(false) // consumed by the quantile pass AND totals
    val q = Aggregates
      .groupedQuantiles(kc.withColumn("g", lit("k")), "g", "c",
        Seq(0.5 -> "p50", 0.99 -> "p99"))
      .select(col("n_rows").as("n_keys"), col("p50"), col("p99"))
    kc.agg(sum(col("c")).as("n"), max(col("c")).as("max_c"))
      .crossJoin(broadcast(q))
      .withColumn("skew_ratio",
        col("max_c").cast("double") * col("n_keys") / col("n"))
      .withColumn("suggested_salt",
        ceil(col("max_c").cast("double") * col("n_keys") / col("n")))
      .select("n", "n_keys", "max_c", "p50", "p99", "skew_ratio", "suggested_salt")
  }

  /** Exact join-output cardinality pre-flight: before shuffling two
    * 100 TB-class tables on a key, predict the inner-join output size and
    * its skew from per-key counts alone — Σ over shared keys of cₗ·cᵣ.
    * The estimate job touches each input ONCE for a map-side-combined
    * per-key count (two aggregates, each |keys|-sized — orders of
    * magnitude below the join it predicts); a fanout surprise (a key
    * whose cₗ·cᵣ dominates) shows up here for the cost of two counts,
    * not after the real join has spilled.
    *
    * One row: `est_rows` (exact inner-join cardinality), key overlap
    * (`n_keys_both` / `n_keys_left_only` / `n_keys_right_only`),
    * `max_contrib` (largest single-key cₗ·cᵣ) and `max_share` =
    * max_contrib / est_rows — the share of the join one key produces,
    * the direct input to the salt-or-broadcast decision.
    *
    * Exactness: per-key products and their sum accumulate in
    * decimal(38,0), with the counts widened to decimal BEFORE the
    * multiply — at full scale a single key's cₗ·cᵣ can pass 2⁶³, where
    * a silent long wrap would report a *smaller* join than reality (the
    * worst failure mode for a pre-flight check); the HUGEINT-promoting
    * oracle mirrors the widening. The OUTPUT `est_rows`/`max_contrib`
    * are cast back to long for schema stability: exact up to 2⁶³−1,
    * null (not wrapped) past it — and `max_share`, the salt-or-broadcast
    * signal, is computed on the decimal values so it stays exact at any
    * magnitude.
    */
  def joinSizeEstimate(left: DataFrame, right: DataFrame,
                       leftKey: String, rightKey: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val lc = left.filter(col(leftKey).isNotNull)
      .groupBy(col(leftKey).as("__k")).agg(count(lit(1)).as("cl"))
    val rc = right.filter(col(rightKey).isNotNull)
      .groupBy(col(rightKey).as("__k")).agg(count(lit(1)).as("cr"))
    // widen BEFORE multiplying: a single hot key with cl·cr > 2⁶³ must
    // overflow into decimal, not wrap in long and then get cast
    val contrib = col("cl").cast(dec) * col("cr").cast(dec)
    lc.join(rc, Seq("__k"), "full_outer")
      .agg(
        sum(contrib).as("est"),
        count(when(col("cl").isNotNull && col("cr").isNotNull, 1)).as("n_keys_both"),
        count(when(col("cr").isNull, 1)).as("n_keys_left_only"),
        count(when(col("cl").isNull, 1)).as("n_keys_right_only"),
        max(contrib).as("max_contrib"))
      .select(
        coalesce(col("est"), lit(0).cast(dec)).cast("long").as("est_rows"),
        col("n_keys_both"), col("n_keys_left_only"), col("n_keys_right_only"),
        coalesce(col("max_contrib"), lit(0).cast(dec)).cast("long").as("max_contrib"),
        when(col("est").isNotNull && col("est") =!= 0,
          col("max_contrib").cast("double") / col("est").cast("double"))
          .as("max_share"))
  }

  /** Benford first-digit audit — the classic fabricated-data screen:
    * naturally-occurring multiplicative quantities (prices, populations,
    * transaction amounts) lead with digit d at frequency log10(1 + 1/d);
    * uniform or hand-entered data does not. One row per leading digit
    * with the observed count, observed fraction, and the Benford
    * expectation — a reviewer (or a constraint check) compares the two
    * columns.
    *
    * `intCol` must be integral (derive cents first for monetary values);
    * non-positive values carry no leading-digit information and are
    * dropped. Digit extraction is decimal-string slicing, identical in
    * any engine. Scale: one 9-row aggregate + a 1-row total broadcast —
    * a single pass.
    */
  def benfordAudit(df: DataFrame, intCol: String): DataFrame = {
    val digits = df.filter(col(intCol).isNotNull && col(intCol) > 0)
      .withColumn("digit", substring(col(intCol).cast("string"), 1, 1).cast("long"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val total = digits.agg(sum(col("n_obs")).as("__t"))
    digits.crossJoin(broadcast(total))
      .withColumn("obs_frac", col("n_obs").cast("double") / col("__t").cast("double"))
      .withColumn("exp_frac",
        log(lit(1.0) + lit(1.0) / col("digit").cast("double")) / log(lit(10.0)))
      .drop("__t")
  }

  /** Functional-dependency audit: does `lhs → rhs` hold — is the RHS
    * uniquely determined by the LHS key set? The schema-discovery /
    * denormalization-safety check [[check]]'s declared constraints can't
    * express (Unique is the special case rhs = rowid). The violation
    * rate decides whether a column can be factored into a dimension
    * table, whether a "key" actually keys, and whether two feeds
    * disagree about an attribute.
    *
    * Output one row: (n_groups, n_violating, violation_rate,
    * max_rhs_distinct, worst_lhs) — worst_lhs is the deterministic
    * witness (most RHS values, smallest key on ties), the first thing a
    * human asks for.
    *
    * Exactness: all counts exact; rate = one IEEE division. Listwise on
    * LHS and RHS nulls (a NULL attribute neither proves nor violates).
    * Multi-column LHS keys group by a STRUCT of the columns — no
    * separator exists at all, so ("ab","c") vs ("a","bc") and even
    * values containing a would-be separator (U+0001 included) stay
    * distinct groups; the witness is a field-wise struct-min, rendered
    * with '>' only for display AFTER the aggregate.
    *
    * Scale shape: one map-side-combined (lhs, rhs) distinct collapse,
    * one lhs aggregate, one 1-row readout + a min(struct) witness pick —
    * nothing collected, no window, no key-string materialization in the
    * hot aggregate.
    */
  def fdAudit(df: DataFrame, lhsCols: Seq[String], rhsCol: String): DataFrame = {
    require(lhsCols.nonEmpty, "need at least one LHS column")
    val base = df
      .filter(lhsCols.map(c => col(c).isNotNull).reduce(_ && _) &&
        col(rhsCol).isNotNull)
      .select(struct(lhsCols.map(c => col(c).cast("string").as(c)): _*)
        .as("__lhs"), col(rhsCol).cast("string").as("__rhs"))
    val perKey = base.groupBy("__lhs", "__rhs").agg(count(lit(1)).as("__c"))
      .groupBy("__lhs").agg(count(lit(1)).as("__nrhs"))
      .localCheckpoint(false) // feeds the max pass AND the readout
    val mx = perKey.agg(max(col("__nrhs")).as("__mx"))
    perKey.crossJoin(broadcast(mx)).agg(
        count(lit(1)).as("n_groups"),
        sum(when(col("__nrhs") > 1, 1L).otherwise(0L)).as("n_violating"),
        max(col("__nrhs")).as("max_rhs_distinct"),
        // witness: most distinct RHS values, smallest key on ties
        // (field-wise struct-min = lexicographic over the column tuple)
        min(when(col("__nrhs") === col("__mx"), col("__lhs")))
          .as("__worst"))
      .withColumn("violation_rate",
        col("n_violating").cast("double") / col("n_groups"))
      .select(col("n_groups"), col("n_violating"), col("violation_rate"),
        col("max_rhs_distinct"),
        concat_ws(">", lhsCols.map(c =>
          col("__worst").getField(c)): _*).as("worst_lhs"))
  }
}

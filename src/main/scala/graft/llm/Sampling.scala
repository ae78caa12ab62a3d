package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Deterministic uniform in [0, 1) from a row key: first 15 hex digits
    * (60 bits) of md5, scaled. Uniform because md5 bits are; deterministic
    * because nothing else enters.
    */
  def hashUniform(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("double") /
      lit(1152921504606846976.0) // 2^60

  /** Keep each row with probability `fraction`, deterministically by key. */
  def sampleByKey(df: DataFrame, keyCol: String, fraction: Double): DataFrame =
    df.filter(hashUniform(col(keyCol)) < fraction)

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
}

package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Probabilistic record linkage — the SCORING layer of the
  * Fellegi–Sunter model (Fellegi & Sunter 1969) over candidate pairs a
  * blocking scheme already generated ([[SortedNeighborhood]], MinHash
  * bands, exact keys). Each compared field carries the classic
  * log-likelihood-ratio weights: agreement adds ln(m/u), disagreement
  * adds ln((1-m)/(1-u)), where m = P(agree | same entity) and
  * u = P(agree | different entities); the summed score classifies the
  * pair against the (upper, lower) thresholds into match / review /
  * nonmatch — the clerical-review triage that makes entity resolution
  * auditable instead of a black box.
  *
  * Null semantics: a null on either side of a field counts as
  * DISAGREEMENT (null-safe-equality would treat two unknowns as the same
  * entity's value — the wrong default for linkage), matching SQL's
  * `CASE WHEN a = b` null behavior so oracles replay it exactly.
  *
  * Scale shape: a narrow per-pair projection — no shuffle of its own;
  * cost lives entirely in the blocking stage that produced the pairs.
  * Because every weight is a literal, the score takes one of 2^|fields|
  * constant values; thresholds placed between those values are immune to
  * cross-engine ulp drift.
  */
object RecordLinkage {

  /** One compared field: the pair-frame columns holding each side's
    * value, and the model's m/u probabilities for it.
    */
  final case class FieldSpec(aCol: String, bCol: String, m: Double, u: Double) {
    require(m > 0 && m < 1 && u > 0 && u < 1, s"m/u must be in (0,1): $this")
  }

  /** Adds `fs_score` (the summed Fellegi–Sunter log-likelihood ratio,
    * fields in the given order) and `decision`
    * (match / review / nonmatch by `tUpper` / `tLower`) to `pairs`.
    */
  def score(pairs: DataFrame, fields: Seq[FieldSpec],
      tUpper: Double, tLower: Double): DataFrame = {
    require(fields.nonEmpty, "at least one field to compare")
    require(tUpper > tLower, "tUpper must exceed tLower")
    val s = fields.map { f =>
      when(col(f.aCol) === col(f.bCol), log(lit(f.m) / lit(f.u)))
        .otherwise(log(lit(1.0 - f.m) / lit(1.0 - f.u)))
    }.reduce(_ + _)
    pairs.withColumn("fs_score", s)
      .withColumn("decision",
        when(col("fs_score") >= tUpper, "match")
          .when(col("fs_score") <= tLower, "nonmatch")
          .otherwise("review"))
  }
}

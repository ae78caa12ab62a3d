package graft.aram

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Typed row for the per-player feature table (the 25 columns of
  * `feature_factory.py:62-105`) — the `Dataset[T]` surface for callers who
  * want compile-time field checks; the `DataFrame` surface in
  * [[PlayerFeatures]] remains the dynamic-schema path. Both share the same
  * Catalyst plans (an `as[T]` is a metadata-only cast).
  */
final case class PlayerFeature(
    match_id: String, puuid: String, champion: String, win: Boolean,
    kda: Double, kills: Int, deaths: Int, assists: Int,
    damage_per_min: Double, damage_taken_per_min: Double,
    damage_mitigated_per_min: Double, total_damage_share: Double,
    gold_per_min: Double, cs_per_min: Double, cc_time: Double,
    heal_shield_given: Double, kill_participation: Double, death_share: Double,
    longest_time_alive: Double, items_purchased: Int, gold_efficiency: Double,
    skill_shots_hit: Double, skill_shots_dodged: Double,
    game_duration: Double, timestamp: java.sql.Timestamp)

object PlayerFeature {
  implicit val encoder: Encoder[PlayerFeature] = Encoders.product[PlayerFeature]

  /** Typed extraction: same plan as [[PlayerFeatures.extract]]. */
  def extract(matches: org.apache.spark.sql.DataFrame,
      limit: Option[Int] = None): Dataset[PlayerFeature] =
    PlayerFeatures.extract(matches, limit).as[PlayerFeature]
}

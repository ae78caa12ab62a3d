package graft.aram

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Match documents → per-player feature rows: the reference's
  * `MatchDataExtractor.extract_match_features` + `FeatureFactory.
  * extract_player_features` (`transformer/ranking/data_extractor.py:42-93`,
  * `transformer/ranking/feature_factory.py:24-107`) as one declarative plan:
  *
  *   scan → filter(ARAM, duration ≥ 300) → explode(participants)
  *        → window team-death total → ~25-column projection.
  *
  * All scalar math is built-in `Column` expressions (codegen'd, no UDFs):
  * `greatest` for the divide-by-zero floors, `coalesce` + `getItem` for the
  * sparse `challenges` map defaults, `when` for the gold-efficiency guard.
  * The per-(match, team) death total — a Python dict in the reference
  * (`data_extractor.py:75-81`) — is a window sum: one shuffle on
  * (match_id, teamId), no join, no collect. The plan is fully narrow
  * except that single shuffle, so it scales linearly with input size.
  */
object PlayerFeatures {

  val featureCols: Seq[String] = Seq(
    "match_id", "puuid", "champion", "win", "kda", "kills", "deaths", "assists",
    "damage_per_min", "damage_taken_per_min", "damage_mitigated_per_min",
    "total_damage_share", "gold_per_min", "cs_per_min", "cc_time",
    "heal_shield_given", "kill_participation", "death_share",
    "longest_time_alive", "items_purchased", "gold_efficiency",
    "skill_shots_hit", "skill_shots_dodged", "game_duration", "timestamp")

  /** P1/P2 — the ARAM gate + minimum-duration predicate
    * (`tasks.py:136-139`, `data_extractor.py:52-55`). Applied before the
    * explode so the generator never runs on filtered matches.
    */
  def aramFilter(matches: DataFrame, minDurationSec: Long = 300L): DataFrame =
    matches.filter(col("info.gameMode") === "ARAM" && col("info.gameDuration") >= minDurationSec)

  /** Full feature extraction. `limit`, when set, is applied on matchId order
    * for reproducibility (the reference's Mongo `cursor.limit` is
    * unordered — SURVEY.md §7.3).
    */
  def extract(matches: DataFrame, limit: Option[Int] = None): DataFrame = {
    val filtered = aramFilter(matches)
    val limited = limit match {
      case Some(n) => filtered.orderBy(col("metadata.matchId")).limit(n)
      case None    => filtered
    }

    // P4 — 1 match doc → 10 player rows. game_duration converts to minutes
    // (`data_extractor.py:73`).
    val exploded = limited.select(
      col("metadata.matchId").as("match_id"),
      (col("info.gameDuration").cast("double") / 60.0).as("game_duration"),
      explode(col("info.participants")).as("p"))

    // A1 — per-(match, team) death total via window sum (dict build/probe in
    // the reference), with the same max(·,1) floor.
    val wTeam = Window.partitionBy(col("match_id"), col("p.teamId"))
    val withTeamDeaths = exploded.withColumn("team_deaths", sum(col("p.deaths")).over(wTeam))

    // P5 — the ~25-column projection (`feature_factory.py:62-105`).
    val p = col("p")
    val dur = col("game_duration")
    val dpm = p.getField("totalDamageDealtToChampions").cast("double") / dur
    val gpm = p.getField("goldEarned").cast("double") / dur
    val challenges = p.getField("challenges")
    withTeamDeaths.select(
      col("match_id"),
      p.getField("puuid").as("puuid"),
      p.getField("championName").as("champion"),
      p.getField("win").as("win"),
      ((p.getField("kills") + p.getField("assists")).cast("double") /
        greatest(p.getField("deaths"), lit(1))).as("kda"),
      p.getField("kills").as("kills"),
      p.getField("deaths").as("deaths"),
      p.getField("assists").as("assists"),
      dpm.as("damage_per_min"),
      (p.getField("totalDamageTaken").cast("double") / dur).as("damage_taken_per_min"),
      (p.getField("damageSelfMitigated").cast("double") / dur).as("damage_mitigated_per_min"),
      coalesce(challenges.getItem("teamDamagePercentage"), lit(0.0)).as("total_damage_share"),
      gpm.as("gold_per_min"),
      (p.getField("totalMinionsKilled").cast("double") / dur).as("cs_per_min"),
      coalesce(p.getField("timeCCingOthers"), lit(0L)).cast("double").as("cc_time"),
      (p.getField("totalHealsOnTeammates") + p.getField("totalDamageShieldedOnTeammates"))
        .cast("double").as("heal_shield_given"),
      coalesce(challenges.getItem("killParticipation"), lit(0.0)).as("kill_participation"),
      (p.getField("deaths").cast("double") / greatest(col("team_deaths"), lit(1L))).as("death_share"),
      p.getField("longestTimeSpentLiving").cast("double").as("longest_time_alive"),
      p.getField("itemsPurchased").as("items_purchased"),
      when(gpm > 0, (dpm + p.getField("totalDamageTaken").cast("double") / dur) / gpm)
        .otherwise(0.0).as("gold_efficiency"),
      coalesce(challenges.getItem("skillshotsHit"), lit(0.0)).as("skill_shots_hit"),
      coalesce(challenges.getItem("skillshotsDodged"), lit(0.0)).as("skill_shots_dodged"),
      dur.as("game_duration"),
      current_timestamp().as("timestamp"))
  }
}

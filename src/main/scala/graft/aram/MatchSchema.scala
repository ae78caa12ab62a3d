package graft.aram

import org.apache.spark.sql.types._

/** Explicit schema for the Riot Match-V5 document the reference stores in
  * MongoDB (one doc per match, `_id` = matchId — see
  * `extractor/riot/db/mongodb.py:39-49`, merge at
  * `extractor/riot/tasks.py:119-149`, consumed leaves at
  * `transformer/ranking/data_extractor.py:57-63` and
  * `transformer/ranking/feature_factory.py:24-107`).
  *
  * The reference is schemaless (Mongo + pandas inference with `.get(...,0)`
  * defaults). Here the schema is explicit so Catalyst can do nested-schema
  * pruning: a query touching 5 subtrees of a ~100-field document reads only
  * those columns from parquet — the automatic version of the reference's
  * hand-written Mongo projection. Every leaf stays nullable; absence
  * semantics are handled by `coalesce` at projection time, mirroring the
  * reference's defaulted lookups.
  */
object MatchSchema {

  /** Per-participant struct — only the leaves the pipeline consumes are
    * declared (FIXTURES.md §1); `challenges` is a sparse map accessed with
    * defaults (`feature_factory.py:53-54,99-100`).
    */
  val participant: StructType = StructType(Seq(
    StructField("puuid", StringType),
    StructField("championName", StringType),
    StructField("teamId", IntegerType),
    StructField("win", BooleanType),
    StructField("kills", IntegerType),
    StructField("deaths", IntegerType),
    StructField("assists", IntegerType),
    StructField("totalDamageDealtToChampions", LongType),
    StructField("totalDamageTaken", LongType),
    StructField("damageSelfMitigated", LongType),
    StructField("goldEarned", LongType),
    StructField("totalMinionsKilled", IntegerType),
    StructField("timeCCingOthers", LongType),
    StructField("totalHealsOnTeammates", LongType),
    StructField("totalDamageShieldedOnTeammates", LongType),
    StructField("longestTimeSpentLiving", LongType),
    StructField("itemsPurchased", IntegerType),
    StructField("challenges", MapType(StringType, DoubleType))
  ))

  val team: StructType = StructType(Seq(
    StructField("teamId", IntegerType),
    StructField("win", BooleanType)
  ))

  /** Full match document: metadata + info (+ opaque timeline, stored but
    * never queried — `tasks.py:141-143`).
    */
  val matchDoc: StructType = StructType(Seq(
    StructField("metadata", StructType(Seq(
      StructField("matchId", StringType),
      StructField("participants", ArrayType(StringType))
    ))),
    StructField("info", StructType(Seq(
      StructField("gameMode", StringType),
      StructField("gameDuration", LongType),
      StructField("gameVersion", StringType),
      StructField("participants", ArrayType(participant)),
      StructField("teams", ArrayType(team))
    ))),
    StructField("timeline", StructType(Seq(
      StructField("frameCount", IntegerType)
    )))
  ))
}

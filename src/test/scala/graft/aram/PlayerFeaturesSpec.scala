package graft.aram

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PlayerFeaturesSpec extends SparkSpec {

  private lazy val matches = MatchFixtures.matches(spark, 60)
  private lazy val features = PlayerFeatures.extract(matches).cache()

  test("ARAM + duration filters drop the right matches, explode yields 10 rows each") {
    val kept = matches
      .filter(col("info.gameMode") === "ARAM" && col("info.gameDuration") >= 300)
      .count()
    assert(features.count() === kept * 10)
    // fixture generator plants non-ARAM every 7th (i%7==3) and short every 11th (i%11==5)
    assert(kept < 60)
  }

  test("feature row has the reference's 25 columns") {
    assert(features.columns.toSeq === PlayerFeatures.featureCols)
  }

  test("KDA guard: deaths=0 divides by 1, not 0") {
    val zeroDeaths = features.filter(col("deaths") === 0)
    assert(zeroDeaths.count() > 0)
    val bad = zeroDeaths
      .filter(col("kda") =!= (col("kills") + col("assists")).cast("double"))
      .count()
    assert(bad === 0)
  }

  test("missing challenges map defaults shares to 0, not null") {
    val nulls = features.filter(
      col("kill_participation").isNull || col("total_damage_share").isNull ||
        col("skill_shots_hit").isNull || col("skill_shots_dodged").isNull).count()
    assert(nulls === 0)
    // fixture plants null challenges on some participants → zeros must appear
    assert(features.filter(col("kill_participation") === 0.0).count() > 0)
  }

  test("death_share: per-(match, team) shares sum to 1 when the team died at all") {
    val sums = features.groupBy("match_id", "win")
      .agg(sum("death_share").as("s"), sum("deaths").as("d"))
      .collect()
    sums.foreach { r =>
      val s = r.getDouble(2)
      if (r.getLong(3) > 0) assert(math.abs(s - 1.0) < 1e-9, s"share sum $s")
      else assert(s === 0.0)
    }
  }

  test("gold_efficiency guard: (dpm + dtpm) / gpm with zero-gpm fallback") {
    val bad = features.filter(col("gold_per_min") > 0)
      .filter(abs(col("gold_efficiency") -
        (col("damage_per_min") + col("damage_taken_per_min")) / col("gold_per_min")) > lit(1e-12))
      .count()
    assert(bad === 0)
  }

  test("deterministic limit takes lowest matchIds") {
    val limited = PlayerFeatures.extract(matches, limit = Some(5))
    assert(limited.count() === 50)
    val ids = limited.select("match_id").distinct().collect().map(_.getString(0)).sorted
    val firstKept = PlayerFeatures.aramFilter(matches)
      .select("metadata.matchId").orderBy("matchId").limit(5)
      .collect().map(_.getString(0)).sorted
    assert(ids.toSeq === firstKept.toSeq)
  }

  test("result is independent of input partitioning") {
    val a = PlayerFeatures.extract(matches.repartition(13)).drop("timestamp")
    val b = PlayerFeatures.extract(matches.coalesce(1)).drop("timestamp")
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }
}

package graft.aram

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import scala.collection.mutable

/** Deterministic synthetic Match-V5 documents for unit tests and demos
  * (FIXTURES.md: no live Riot API / Mongo / Redis anywhere in tests).
  *
  * A seeded LCG drives all values so fixtures are reproducible across runs
  * and JVMs. Includes the edge variants the reference's semantics hinge on:
  * non-ARAM matches (filtered), short matches (duration < 300 s, filtered),
  * missing `challenges` (defaults to 0), deaths = 0 (KDA guard), and exact
  * score ties (rank tie semantics).
  */
object MatchFixtures {

  private final class Lcg(seed0: Long) {
    private var s = seed0
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    def int(bound: Int): Int = { val v = (next() >>> 33).toInt % bound; if (v < 0) v + bound else v }
    def dbl(): Double = (next() >>> 11).toDouble / (1L << 53).toDouble
  }

  private val champions = Vector("Ahri", "Lux", "Jinx", "Ezreal", "Sona", "Veigar",
    "Ashe", "Brand", "Ziggs", "MissFortune", "Xerath", "Varus", "Teemo", "Swain")

  /** Generate `n` match documents. Every 7th match is non-ARAM; every 11th
    * is shorter than 300 s; every 5th participant of match 0 mod 3 lacks
    * `challenges`; participant 0 of every 9th match has deaths = 0.
    */
  def matches(spark: SparkSession, n: Int, seed: Long = 42L): DataFrame = {
    val rng = new Lcg(seed)
    val rows = mutable.ArrayBuffer.empty[Row]
    var i = 0
    while (i < n) {
      val matchId = f"KR_$i%06d"
      val gameMode = if (i % 7 == 3) "CLASSIC" else "ARAM"
      val duration: Long = if (i % 11 == 5) 120L + rng.int(100) else 800L + rng.int(1000)
      val winTeam = if (rng.dbl() < 0.5) 100 else 200
      val puuids = (0 until 10).map(p => f"puuid-$i%06d-$p")
      val parts = (0 until 10).map { p =>
        val teamId = if (p < 5) 100 else 200
        val win = teamId == winTeam
        val deaths = if (i % 9 == 2 && p == 0) 0 else rng.int(12)
        val kills = rng.int(15)
        val assists = rng.int(25)
        val challenges: Map[String, Double] =
          if (i % 3 == 0 && p % 5 == 1) null
          else Map(
            "killParticipation" -> math.rint(rng.dbl() * 100) / 100,
            "teamDamagePercentage" -> math.rint(rng.dbl() * 100) / 100,
            "skillshotsHit" -> rng.int(40).toDouble,
            "skillshotsDodged" -> rng.int(60).toDouble)
        Row(
          puuids(p), champions(rng.int(champions.size)), teamId, win,
          kills, deaths, assists,
          (5000 + rng.int(40000)).toLong, (8000 + rng.int(40000)).toLong,
          (2000 + rng.int(30000)).toLong, (6000 + rng.int(12000)).toLong,
          rng.int(120), rng.int(60).toLong, rng.int(5000).toLong, rng.int(4000).toLong,
          (100 + rng.int(800)).toLong, 1 + rng.int(8),
          challenges)
      }
      val teams = Seq(Row(100, winTeam == 100), Row(200, winTeam == 200))
      rows += Row(
        Row(matchId, puuids),
        Row(gameMode, duration, "14.3.1", parts, teams),
        Row(10 + rng.int(30)))
      i += 1
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 4), MatchSchema.matchDoc)
  }
}

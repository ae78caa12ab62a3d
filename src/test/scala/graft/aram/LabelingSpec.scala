package graft.aram

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LabelingSpec extends SparkSpec {
  import spark.implicits._

  private def featRow(m: String, p: String, win: Boolean, kda: Double, dpm: Double,
      kp: Double, gpm: Double, ds: Double, ge: Double) =
    (m, p, win, kda, dpm, kp, gpm, ds, ge)

  private lazy val tiny = Seq(
    featRow("m1", "a", win = true, 4.0, 800.0, 0.6, 400.0, 0.2, 2.0),
    featRow("m1", "b", win = true, 4.0, 800.0, 0.6, 400.0, 0.2, 2.0), // exact tie with a
    featRow("m1", "c", win = false, 1.0, 200.0, 0.1, 300.0, 0.5, 1.0),
    featRow("m1", "d", win = false, 2.0, 500.0, 0.3, 350.0, 0.3, 1.5),
    featRow("m2", "e", win = false, 3.0, 600.0, 0.5, 380.0, 0.25, 1.8)
  ).toDF("match_id", "puuid", "win", "kda", "damage_per_min", "kill_participation",
    "gold_per_min", "death_share", "gold_efficiency")

  test("score formula: 6 weighted terms, ×1.1 win bonus") {
    val r = Labeling.label(tiny).filter($"puuid" === "c").head()
    val base = 1.0 * 0.25 + 200.0 / 1000 * 0.20 + 0.1 * 0.15 + 300.0 / 500 * 0.10 +
      (1 - 0.5) * 0.15 + 1.0 * 0.15
    assert(math.abs(r.getAs[Double]("performance_score") - base) < 1e-12)
    val w = Labeling.label(tiny).filter($"puuid" === "a").head()
    val baseA = 4.0 * 0.25 + 800.0 / 1000 * 0.20 + 0.6 * 0.15 + 400.0 / 500 * 0.10 +
      (1 - 0.2) * 0.15 + 2.0 * 0.15
    assert(math.abs(w.getAs[Double]("performance_score") - baseA * 1.1) < 1e-12)
  }

  test("RANK semantics: exact ties share the min rank, next rank gaps") {
    val ranks = Labeling.label(tiny).filter($"match_id" === "m1")
      .select($"puuid", $"rank_in_match").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ranks("a") === 1.0 && ranks("b") === 1.0) // tied top
    assert(ranks("d") === 3.0)                       // gap after the tie
    assert(ranks("c") === 4.0)
  }

  test("ranks are a permutation of 1..n per match when scores are distinct") {
    val matches = MatchFixtures.matches(spark, 30)
    val labeled = Labeling.label(PlayerFeatures.extract(matches))
    val perMatch = labeled.groupBy("match_id")
      .agg(collect_list("rank_in_match").as("ranks"), count(lit(1)).as("n"),
        countDistinct("performance_score").as("nd"))
      .collect()
    perMatch.filter(r => r.getAs[Long]("nd") == r.getAs[Long]("n")).foreach { r =>
      val got = r.getAs[scala.collection.Seq[Double]]("ranks").toSeq.sorted
      assert(got === (1 to r.getAs[Long]("n").toInt).map(_.toDouble))
    }
  }

  test("rank invariant under positive affine score transforms (property)") {
    // rank depends only on score ordering: scaling all inputs by the same
    // positive factor in one match must preserve the ranking
    val labeled = Labeling.label(tiny)
    val scaled = Labeling.label(tiny
      .withColumn("kda", $"kda" * 2)
      .withColumn("damage_per_min", $"damage_per_min" * 2)
      .withColumn("kill_participation", $"kill_participation" * 2)
      .withColumn("gold_per_min", $"gold_per_min" * 2)
      .withColumn("gold_efficiency", $"gold_efficiency" * 2)
      .withColumn("death_share", $"death_share")) // shares kept fixed
    val a = labeled.select("puuid", "rank_in_match").collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val b = scaled.select("puuid", "rank_in_match").collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    // win=false rows in m1: relative order of c and d preserved
    assert(a("c") > a("d") && b("c") > b("d"))
  }
}

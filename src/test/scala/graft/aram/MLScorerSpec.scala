package graft.aram

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MLScorerSpec extends SparkSpec {

  private lazy val labeled = {
    val matches = MatchFixtures.matches(spark, 60)
    Labeling.label(PlayerFeatures.extract(matches)).cache()
  }
  private val feats = Seq("kda", "damage_per_min", "gold_per_min", "death_share",
    "kill_participation", "gold_efficiency")

  test("ensemble: 5 models, weights normalized, predictions finite, ranks computable") {
    val (train, test) = Preprocess.splitByGroup(labeled, "match_id", 0.3)
    val trained = MLScorer.fit(train, feats, "performance_score", nFolds = 3)
    assert(math.abs(trained.weights.values.sum - 1.0) < 1e-9)
    assert(trained.weights.keySet === Set("gbt", "rf", "dt", "lr", "glr"))
    assert(trained.weights.values.forall(w => w > 0 && w < 1))

    val scored = MLScorer.score(trained, test)
    assert(scored.filter(col("predicted_score").isNull || isnan(col("predicted_score"))).count() === 0)
    val ranked = Ranking.predictedRanks(scored, "predicted_score", Seq("match_id"), "puuid")
    val metrics = graft.ops.Aggregates.rankAccuracy(ranked, "rank_in_match", "predicted_rank").head()
    // trained on the label's own features: must beat random rank assignment
    assert(metrics.getAs[Double]("within2_acc") > 0.5)
  }

  test("inverse-MSE weight algebra: normalized and monotone in 1/MSE") {
    val mse = Map("a" -> 0.5, "b" -> 1.0, "c" -> 2.0, "d" -> 4.0, "e" -> 0.25)
    val w = Ranking.inverseErrorWeights(mse)
    assert(math.abs(w.values.sum - 1.0) < 1e-12)
    // lower MSE ⇒ strictly higher weight
    val byMse = mse.toSeq.sortBy(_._2).map(_._1)
    assert(byMse.map(w) === byMse.map(w).sorted.reverse)
    // exact algebra: w_i = (1/mse_i) / Σ(1/mse_j)
    val z = mse.values.map(1.0 / _).sum
    mse.foreach { case (k, v) => assert(math.abs(w(k) - (1.0 / v) / z) < 1e-12) }
  }

  test("fold assignment is group-aware: no match straddles folds") {
    val folded = Preprocess.hashFold(labeled, "match_id", 5)
    assert(folded.groupBy("match_id").agg(countDistinct("fold").as("n"))
      .filter(col("n") > 1).count() === 0)
  }

  test("importances: one entry per (feature, tree model), top-k works") {
    val trained = MLScorer.fit(labeled, feats, "performance_score", nFolds = 2)
    val imps = MLScorer.importances(trained, feats)
    assert(imps.map(_._2).toSet === Set("gbt", "rf", "dt"))
    import spark.implicits._
    val top = Ranking.topImportances(imps.toDF("feature", "model", "importance"), k = 3)
    assert(top.count() === 3)
  }
}

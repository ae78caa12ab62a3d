package graft

import graft.aram._

/** Runnable replay of the reference's end-to-end analytics run
  * (`transformer/ranking/test_modeling.py` → `test_result.txt`): synthetic
  * match documents → features → labels → leak-safe split → fitted
  * preprocessing → MLlib ensemble (hash-fold CV, inverse-MSE weights) →
  * per-match predicted ranks → the same report surface (test MSE/RMSE/MAE,
  * exact/±1/±2 rank accuracy, top feature importances, save/load check).
  *
  *   sbt "runMain graft.AramDemo [nMatches]"
  */
object AramDemo {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100)
    val spark = GraftSession.get("aram-demo")
    import spark.implicits._

    val matches = MatchFixtures.matches(spark, n)
    val labeled = Labeling.label(PlayerFeatures.extract(matches)).cache()
    println(s"dataset: ${labeled.count()} player rows / ${labeled.select("match_id").distinct().count()} matches")

    val (train, test) = Preprocess.splitByGroup(labeled, "match_id", 0.2)
    val fitted = Pipeline.fit(train)
    val trainT = Pipeline.transform(fitted, train).cache()
    val testT = Pipeline.transform(fitted, test).cache()
    println(s"split: train ${trainT.count()} / test ${testT.count()}")

    val trained = MLScorer.fit(trainT, Preprocess.modelFeatureCols, "performance_score")
    println("ensemble weights: " + trained.weights.map { case (k, w) => f"$k=$w%.4f" }.mkString(", "))

    val scored = MLScorer.score(trained, testT)
    val err = ops.Aggregates.errorMetrics(scored, "predicted_score", "performance_score").head()
    println(f"test MSE=${err.getAs[Double]("mse")}%.4f RMSE=${err.getAs[Double]("rmse")}%.4f MAE=${err.getAs[Double]("mae")}%.4f")

    val ranked = Ranking.predictedRanks(scored, "predicted_score", Seq("match_id"), "puuid")
    val acc = ops.Aggregates.rankAccuracy(ranked, "rank_in_match", "predicted_rank").head()
    println(f"rank accuracy: exact=${acc.getAs[Double]("exact_acc") * 100}%.1f%% " +
      f"±1=${acc.getAs[Double]("within1_acc") * 100}%.1f%% ±2=${acc.getAs[Double]("within2_acc") * 100}%.1f%% " +
      f"(mean err ${acc.getAs[Double]("mean_rank_err")}%.2f)")

    val imps = MLScorer.importances(trained, Preprocess.modelFeatureCols)
      .toDF("feature", "model", "importance")
    println("top importances:")
    Ranking.topImportances(imps, 10).collect().foreach { r =>
      println(f"  ${r.getString(0)}%-24s ${r.getAs[Double]("mean_importance")}%.4f")
    }

    // save/load determinism (the reference's max-diff-0 check)
    val dir = java.nio.file.Files.createTempDirectory("aram_models").toString
    ModelStore.saveClip(spark, fitted.clip, s"$dir/clip")
    ModelStore.saveScaler(spark, fitted.scaler, s"$dir/scaler")
    ModelStore.saveEncoder(fitted.encoder, s"$dir/encoder")
    val reloaded = Pipeline.Fitted(
      ModelStore.loadEncoder(spark, s"$dir/encoder", "champion"),
      ModelStore.loadClip(spark, s"$dir/clip"),
      ModelStore.loadScaler(spark, s"$dir/scaler"))
    val diff = Pipeline.transform(reloaded, test).drop("timestamp")
      .exceptAll(testT.drop("timestamp")).count()
    println(s"save/load determinism: differing rows after reload = $diff")
    spark.stop()
  }
}

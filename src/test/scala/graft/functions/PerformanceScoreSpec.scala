package graft.functions

import graft.SparkSpec
import graft.aram.{Labeling, MatchFixtures, PlayerFeatures}
import org.apache.spark.sql.functions._

class PerformanceScoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val features = PlayerFeatures.extract(MatchFixtures.matches(spark, 40)).cache()

  private def nativeScore = PerformanceScoreExpr.score(
    col("kda"), col("damage_per_min"), col("kill_participation"),
    col("gold_per_min"), col("death_share"), col("gold_efficiency"), col("win"))

  private def composedScore = Labeling.performanceScore(
    col("kda"), col("damage_per_min"), col("kill_participation"),
    col("gold_per_min"), col("death_share"), col("gold_efficiency"), col("win"))

  test("native expression ≡ composed Column expression, bit for bit") {
    val diff = features
      .select(nativeScore.as("a"), composedScore.as("b"))
      .filter($"a" =!= $"b")
    assert(diff.count() === 0)
  }

  test("codegen path executes (filter + aggregate over the expression)") {
    val n = features.withColumn("s", nativeScore).filter($"s" > 0).count()
    assert(n === features.count()) // all scores positive on fixtures
    val mx = features.select(max(nativeScore)).head().getDouble(0)
    assert(mx > 0)
  }

  test("null in any numeric input → null out") {
    val row = Seq((java.lang.Double.valueOf(2.0), null.asInstanceOf[java.lang.Double]))
      .toDF("kda", "dpm")
    val r = row.select(PerformanceScoreExpr.score(
      $"kda", $"dpm", lit(0.5), lit(300.0), lit(0.2), lit(1.0), lit(true)).as("s")).head()
    assert(r.isNullAt(0))
  }

  test("null win → base score (no bonus), matching the composed when/otherwise") {
    val row = Seq((2.0, null.asInstanceOf[java.lang.Boolean]), (2.0, java.lang.Boolean.TRUE))
      .toDF("kda", "win")
    val rows = row.select(
        PerformanceScoreExpr.score(lit(2.0), lit(600.0), lit(0.5), lit(300.0),
          lit(0.2), lit(1.0), $"win").as("native"),
        Labeling.performanceScore(lit(2.0), lit(600.0), lit(0.5), lit(300.0),
          lit(0.2), lit(1.0), $"win").as("composed"))
      .collect()
    rows.foreach { r =>
      assert(!r.isNullAt(0), "native must not be null for null win")
      assert(r.getDouble(0) === r.getDouble(1), "native and composed diverge on win nullness")
    }
    // the null-win row scores strictly less than the win=true row (no bonus)
    assert(rows(0).getDouble(0) < rows(1).getDouble(0))
  }

  test("SQL-callable after registration") {
    PerformanceScoreExpr.register(spark)
    features.createOrReplaceTempView("pf")
    val viaSql = spark.sql(
      """SELECT performance_score(kda, damage_per_min, kill_participation,
        |  gold_per_min, death_share, gold_efficiency, win) AS s FROM pf""".stripMargin)
      .agg(sum("s")).head().getDouble(0)
    val viaCol = features.select(nativeScore.as("s")).agg(sum("s")).head().getDouble(0)
    assert(viaSql === viaCol)
  }
}

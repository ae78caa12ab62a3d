package graft

import org.apache.spark.sql.functions._

class SqlSurfaceSpec extends SparkSpec {

  test("SQL front-end: views + custom functions drive the same plans") {
    Sql.registerViews(spark, "/root/testdata/sf0.001")
    // plain SQL over a view
    val viaSql = spark.sql(
      "SELECT l_returnflag, sum(l_quantity) AS s FROM lineitem GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val viaDf = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .groupBy("l_returnflag").agg(sum("l_quantity").as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaSql === viaDf)

    // native expression and udf both callable from SQL, and they agree
    val r = spark.sql(
      """SELECT
        |  performance_score(2.0, 500.0, 0.5, 300.0, 0.2, 1.5, true) AS native,
        |  performance_score_udf(2.0, 500.0, 0.5, 300.0, 0.2, 1.5, true) AS viaUdf
        |""".stripMargin).head()
    assert(r.getDouble(0) === r.getDouble(1))
  }

  test("udf tier: equals the native expression over real rows") {
    val features = aram.PlayerFeatures.extract(aram.MatchFixtures.matches(spark, 20))
    val cmp = features.select(
      functions.UdfShowcase.score(col("kda"), col("damage_per_min"),
        col("kill_participation"), col("gold_per_min"), col("death_share"),
        col("gold_efficiency"), col("win")).as("u"),
      functions.PerformanceScoreExpr.score(col("kda"), col("damage_per_min"),
        col("kill_participation"), col("gold_per_min"), col("death_share"),
        col("gold_efficiency"), col("win")).as("n"))
    assert(cmp.filter(col("u") =!= col("n")).count() === 0)
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL surface: register the testdata tables as temp views and the custom
  * functions, so the whole engine is drivable from `spark.sql` as well as
  * the DataFrame API (the two front-ends share Catalyst plans — a SQL
  * query and its DataFrame twin optimize identically).
  */
object Sql {

  val tableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def registerViews(spark: SparkSession, dir: String): Unit = {
    tableNames.foreach { t =>
      val df: DataFrame = t match {
        case "events" => Tables.events(spark, dir)
        case other    => Tables.table(spark, dir, other)
      }
      df.createOrReplaceTempView(t)
    }
    functions.PerformanceScoreExpr.register(spark)
    functions.CosineSimilarity.register(spark)
    functions.UdfShowcase.register(spark)
  }
}

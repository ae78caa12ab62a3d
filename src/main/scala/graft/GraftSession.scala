package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the configuration this engine is designed around.
  *
  * Tuned for the dev harness (`local[32]`, single JVM) but every knob is the
  * one you would also set on a real cluster: AQE on (runtime re-planning,
  * skew-join splitting, shuffle-partition coalescing), nested-schema pruning
  * on (the reference's hand-written Mongo projection of 5 subtrees —
  * `transformer/ranking/data_extractor.py:57-63` — becomes automatic), and a
  * shuffle-partition count sized to the parallelism actually available
  * instead of the 200 default.
  */
object GraftSession {
  def builder(appName: String = "graft", master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def get(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

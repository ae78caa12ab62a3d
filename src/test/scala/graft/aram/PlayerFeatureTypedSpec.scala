package graft.aram

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PlayerFeatureTypedSpec extends SparkSpec {
  import spark.implicits._

  test("typed Dataset surface: same rows as the DataFrame path, typed ops compile") {
    val matches = MatchFixtures.matches(spark, 20)
    val ds = PlayerFeature.extract(matches)
    assert(ds.count() === PlayerFeatures.extract(matches).count())

    // compile-time-checked field access + typed aggregation
    val worstDeaths = ds.filter(_.deaths > 0)
      .groupByKey(_.match_id)
      .mapValues(_.deaths)
      .reduceGroups((a, b) => math.max(a, b))
      .collect().toMap
    val viaDf = PlayerFeatures.extract(matches).filter($"deaths" > 0)
      .groupBy("match_id").agg(max("deaths"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(worstDeaths === viaDf)
  }
}

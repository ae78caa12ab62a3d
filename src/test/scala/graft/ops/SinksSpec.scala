package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SinksSpec extends SparkSpec {

  test("partitioned layout: filters prune partitions at the directory level") {
    val dir = Files.createTempDirectory("psink").toString + "/events"
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    Sinks.writePartitioned(events, dir, Seq("event_type"), sortCols = Seq("ts"))

    val back = Sinks.readPartitioned(spark, dir)
    assert(back.count() === events.count())

    val filtered = back.filter(col("event_type") === "purchase")
    val plan = filtered.queryExecution.executedPlan.toString
    // the predicate lands in PartitionFilters (directory prune), not as a
    // data filter over all rows
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan.take(1200))
    assert(filtered.count() ===
      events.filter(col("event_type") === "purchase").count())
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = (1L to 300L).map(i => (i % 7, i, i % 13))
    .toDF("k", "v", "w").cache()

  private val partials = Seq(count(lit(1)).as("n"), sum(col("v")).as("s"),
    min(col("w")).as("mn"), max(col("w")).as("mx"))
  private val merges = Seq(sum(col("n")).as("n"), sum(col("s")).as("s"),
    min(col("mn")).as("mn"), max(col("mx")).as("mx"))

  private def direct: Seq[(Long, Long, Long, Long, Long)] =
    rows.groupBy("k").agg(partials.head, partials.tail: _*)
      .select("k", "n", "s", "mn", "mx")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)

  private def viaBatches(splits: Seq[DataFrame]): Seq[(Long, Long, Long, Long, Long)] =
    IncrementalAgg.replay(splits, Seq("k"), partials, merges)
      .select("k", "n", "s", "mn", "mx")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)

  test("any batch split replays to the one-shot aggregate") {
    val byRange = Seq(rows.filter($"v" <= 100), rows.filter($"v" > 100 && $"v" <= 200),
      rows.filter($"v" > 200))
    val uneven = Seq(rows.filter($"v" <= 1), rows.filter($"v" > 1))
    assert(viaBatches(byRange) === direct)
    assert(viaBatches(uneven) === direct)
  }

  test("empty batches are no-ops; keys appearing only later still merge in") {
    val withEmpty = Seq(rows.filter($"v" < 0), rows.filter($"k" === 3),
      rows.filter($"k" =!= 3))
    assert(viaBatches(withEmpty) === direct)
  }

  test("update from None bootstraps state as the batch partials") {
    val st = IncrementalAgg.update(None, rows, Seq("k"), partials, merges)
    assert(st.columns.toSeq === Seq("k", "n", "s", "mn", "mx"))
    assert(st.count() === 7)
  }
}

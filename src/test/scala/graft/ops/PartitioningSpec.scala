package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PartitioningSpec extends SparkSpec {
  import spark.implicits._

  // skewed: key "hot" holds 90% of rows
  private lazy val skewed = (
    (1 to 900).map(i => ("hot", i.toDouble)) ++ (1 to 100).map(i => (s"k${i % 10}", i.toDouble))
  ).toDF("k", "v").repartition(8).cache()

  test("saltedAgg equals plain aggregation") {
    val plain = skewed.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val salted = Partitioning.saltedAgg(skewed, Seq("k"), salt = 7,
        partials = Seq(sum("v").as("ps"), count(lit(1)).as("pn")),
        finals = Seq(sum("ps").as("s"), sum("pn").as("n")))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted.keySet === plain.keySet)
    plain.foreach { case (k, (s, n)) =>
      assert(math.abs(salted(k)._1 - s) < 1e-6 && salted(k)._2 === n)
    }
  }

  test("saltedJoin equals plain join") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("k", "label")
    val plain = skewed.join(dim, Seq("k")).groupBy("k", "label").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val salted = Partitioning.saltedJoin(skewed, dim, Seq("k"), salt = 5)
      .groupBy("k", "label").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(salted === plain)
  }

  test("bucketed tables join without an exchange on the bucket key") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    Partitioning.writeBucketed(li.select("l_orderkey", "l_quantity"), "li_b", Seq("l_orderkey"), 4, Seq("l_orderkey"))
    Partitioning.writeBucketed(li.select("l_orderkey", "l_extendedprice"), "li_b2", Seq("l_orderkey"), 4, Seq("l_orderkey"))
    val joined = spark.table("li_b").groupBy("l_orderkey").agg(sum("l_quantity"))
      .join(spark.table("li_b2").groupBy("l_orderkey").agg(sum("l_extendedprice")), "l_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    // co-partitioned: no shuffle exchange feeding the join/agg
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey"), plan.take(2000))
    assert(joined.count() > 0)
    spark.sql("DROP TABLE li_b"); spark.sql("DROP TABLE li_b2")
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Direct coverage for the thin ops helpers not already pinned by an
  * oracle query's exact compare.
  */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    ("a", 1.0), ("a", 3.0), ("b", 2.0), ("b", 6.0), ("b", 4.0)
  ).toDF("k", "v")

  test("partitionAgg attaches a per-partition aggregate to every row") {
    val out = Windows.partitionAgg(df, Seq("k"), max(col("v")), "k_max")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    out.foreach { case (k, _, m) => assert(m === (if (k == "a") 3.0 else 6.0)) }
  }

  test("scan composes filter then projection") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val out = Relational.scan(li, col("l_quantity") > 45, Seq(col("l_orderkey"), col("l_quantity")))
    assert(out.columns.toSeq === Seq("l_orderkey", "l_quantity"))
    assert(out.filter(col("l_quantity") <= 45).count() === 0)
    assert(out.count() > 0)
  }

  test("sortedLimit is deterministic across partitionings") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val a = Relational.sortedLimit(li.repartition(7), Seq("l_orderkey", "l_linenumber"), 50)
      .select("l_orderkey", "l_linenumber").collect().toSeq
    val b = Relational.sortedLimit(li.coalesce(1), Seq("l_orderkey", "l_linenumber"), 50)
      .select("l_orderkey", "l_linenumber").collect().toSeq
    assert(a === b)
  }

  test("aggBackJoin broadcast and shuffle variants agree") {
    val x = Joins.aggBackJoin(df, Seq("k"), Seq(sum(col("v")).as("total")), broadcastAgg = true)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    val y = Joins.aggBackJoin(df, Seq("k"), Seq(sum(col("v")).as("total")), broadcastAgg = false)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(x === y)
    assert(x.forall { case (k, _, t) => t === (if (k == "a") 4.0 else 12.0) })
  }

  test("semi and anti joins partition the input") {
    val keys = Seq("a").toDF("k")
    val semi = Joins.semiJoinByKeys(df, keys, Seq("k")).count()
    val anti = Joins.antiJoinByKeys(df, keys, Seq("k")).count()
    assert(semi === 2 && anti === 3 && semi + anti === df.count())
  }
}

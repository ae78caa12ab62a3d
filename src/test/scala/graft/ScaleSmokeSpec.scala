package graft

import org.apache.spark.sql.functions._

/** Scale smoke: the heaviest pipelines on 8× self-unioned sf0.1 inputs
  * (~4.8M lineitem rows, 40k docs). Not a benchmark — a structural check
  * that the plans keep working when the data outgrows a single partition's
  * comfort zone: no collect-to-driver, no quadratic blowup, shuffles stay
  * keyed. Row-count algebra doubles as a correctness spot-check.
  */
class ScaleSmokeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.1"
  private def x8(df: org.apache.spark.sql.DataFrame) =
    (1 to 8).map(i => df.withColumn("__rep", lit(i))).reduce(_.unionByName(_))

  test("flagship ranking at 4.8M rows: ranks complete, per-order algebra holds") {
    val li = x8(Tables.lineitem(spark, sf))
      // make keys distinct across replicas so partitions multiply too
      .withColumn("l_orderkey", col("l_orderkey") * 10 + col("__rep"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("l_orderkey")
    val ranked = li
      .withColumn("score", col("l_extendedprice") * (lit(1) - col("l_discount")))
      .withColumn("rnk", rank().over(w.orderBy(col("score").desc)))
    val n = ranked.count()
    assert(n === 4800000L)
    // every order's best rank is 1
    assert(ranked.groupBy("l_orderkey").agg(min("rnk").as("m"))
      .filter(col("m") =!= 1).count() === 0)
  }

  test("exact dedup at 40k docs × 8 replicas collapses to the base corpus") {
    val docs = x8(Tables.documents(spark, sf)).drop("__rep")
    val base = Tables.documents(spark, sf)
    val groups = graft.llm.Dedup.exactGroups(docs, "doc_id", "text")
    // replicas are exact dups: group count equals distinct texts of base
    assert(groups.count() === base.select(md5(col("text"))).distinct().count())
    assert(groups.agg(sum("n_dups")).head().getLong(0) === base.count() * 8)
  }

  test("corpus scrub at 8× replication: identical survivor set as the base corpus") {
    // replicas are exact dups, so stage 3 (exact dedup) collapses them and
    // stages 1-4 must land on the same survivors — the composite is
    // replication-invariant, proving no stage leaks duplicate mass through
    val base = Tables.documents(spark, sf)
    val docs8 = x8(base).drop("__rep")
    val cfg = graft.llm.CorpusPipeline.Config(jaccardThreshold = 0.5)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val (c1, stats1) = graft.llm.CorpusPipeline.scrub(base, "doc_id", "text", cfg)
    val (c8, _) = graft.llm.CorpusPipeline.scrub(docs8, "doc_id", "text", cfg)
    val survivors = ids(c1)
    assert(survivors.nonEmpty && ids(c8) === survivors)
    // stage counts are monotone non-increasing
    val s = stats1.head()
    val counts = Seq("n_input", "n_after_gates", "n_after_exact", "n_after_neardup")
      .map(c => s.getAs[Long](c))
    assert(counts === counts.sorted.reverse)
  }
}

package graft

/** Smoke: every registered query runs and returns rows at sf0.001, and every
  * query has either an oracle or is explicitly registered as rows-only.
  */
class QueriesSmokeSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracles without queries: $extra")
  }

  test("rows-only queries are exactly the documented whitelist") {
    // every other query MUST carry a DuckDB oracle — this guards against
    // accidentally dropping one during a refactor
    // round 5: the HLL sketch joined the oracle set via the within-rsd
    // flag scheme (Spark self-checks its sketch against its own exact
    // count; the oracle pins the exact counts + a literal true).
    // round 7: q_image_neardup left this list — its banded pairing stage
    // is now oracled over the persisted dHash parquet; the single
    // remaining rows-only entry decodes real PNG bytes through
    // javax.imageio, which no SQL oracle engine can replay; its
    // determinism is pinned by MultimodalSpec instead.
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly === Set("q_multimodal_decode"),
      s"unexpected rows-only queries: $rowsOnly")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }
}

package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "alpha beta gamma"),
    (2L, "alpha beta gamma"),          // exact dup of 1
    (3L, "Alpha  Beta gamma"),         // canonical dup of 1 (case+spaces)
    (4L, "totally different text here")
  ).toDF("doc_id", "text")

  test("exact groups: min-id survivor, dup counts") {
    val g = Dedup.exactGroups(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("n_dups")).toMap
    assert(g(1L) === 2L) // 1,2 share content
    assert(g(3L) === 1L) // different raw bytes
    assert(g(4L) === 1L)
  }

  test("canonicalized groups fold case/whitespace variants") {
    val g = Dedup.exactGroups(docs, "doc_id", "text", canonicalize = true).collect()
      .map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("n_dups")).toMap
    assert(g(1L) === 3L) // 1,2,3 fold together
    assert(g(4L) === 1L)
  }

  test("dropExactDuplicates keeps exactly the representatives") {
    val kept = Dedup.dropExactDuplicates(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq === Seq(1L, 3L, 4L))
  }

  test("lastWriteWins keeps the newest row per key") {
    val evs = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c")
    ).toDF("user_id", "version", "payload")
    val last = Dedup.lastWriteWins(evs, Seq("user_id"),
      Seq(col("version").desc)).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(last === Map(1L -> "b", 2L -> "c"))
  }
}

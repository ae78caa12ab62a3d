package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private lazy val oldSnap = Seq(
    (1L, Some("a"), Some(10L)), // unchanged
    (2L, Some("b"), Some(20L)), // value update
    (3L, Some("c"), Some(30L)), // deleted in new
    (4L, None: Option[String], Some(40L)), // null vs value -> update
    (5L, None: Option[String], None: Option[Long]) // null vs null -> unchanged
  ).toDF("id", "s", "v")

  private lazy val newSnap = Seq(
    (1L, Some("a"), Some(10L)),
    (2L, Some("b"), Some(21L)),
    (4L, Some("x"), Some(40L)),
    (5L, None: Option[String], None: Option[Long]),
    (6L, Some("f"), Some(60L)) // insert
  ).toDF("id", "s", "v")

  private def ops(): Map[Long, String] =
    SnapshotDiff.changelog(oldSnap, newSnap, Seq("id"), Seq("s", "v"))
      .select("id", "op").as[(Long, String)].collect().toMap

  test("labels insert/delete/update/unchanged, null-safely") {
    val m = ops()
    assert(m === Map(1L -> "unchanged", 2L -> "update", 3L -> "delete",
      4L -> "update", 5L -> "unchanged", 6L -> "insert"))
  }

  test("carries old_/new_ value columns with nulls on the absent side") {
    val out = SnapshotDiff.changelog(oldSnap, newSnap, Seq("id"), Seq("s", "v"))
    val ins = out.filter(col("op") === "insert").collect().head
    assert(ins.isNullAt(ins.fieldIndex("old_s")) && ins.isNullAt(ins.fieldIndex("old_v")))
    assert(ins.getAs[String]("new_s") === "f" && ins.getAs[Long]("new_v") === 60L)
    val del = out.filter(col("op") === "delete").collect().head
    assert(del.isNullAt(del.fieldIndex("new_s")))
    assert(del.getAs[String]("old_s") === "c")
  }

  test("result is partitioning-independent") {
    val a = SnapshotDiff.changelog(oldSnap.repartition(5), newSnap.coalesce(1),
      Seq("id"), Seq("s", "v")).orderBy("id").collect().toSeq
    val b = SnapshotDiff.changelog(oldSnap, newSnap, Seq("id"), Seq("s", "v"))
      .orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("apply(old, changelog(old, new)) reproduces new exactly") {
    val log = SnapshotDiff.changelog(oldSnap, newSnap, Seq("id"), Seq("s", "v"))
    val got = SnapshotDiff.applyChangelog(oldSnap, log, Seq("id"), Seq("s", "v"))
      .orderBy("id").collect().toSeq
    val want = newSnap.select("id", "s", "v").orderBy("id").collect().toSeq
    assert(got === want)
  }

  test("apply works off a DELTA-only feed (no unchanged rows shipped)") {
    val delta = SnapshotDiff.changelog(oldSnap, newSnap, Seq("id"), Seq("s", "v"))
      .filter(col("op") =!= "unchanged")
    val got = SnapshotDiff.applyChangelog(oldSnap, delta, Seq("id"), Seq("s", "v"))
      .orderBy("id").collect().toSeq
    val want = newSnap.select("id", "s", "v").orderBy("id").collect().toSeq
    assert(got === want)
  }
}

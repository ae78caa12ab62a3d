package graft.ops

import graft.SparkSpec

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  test("unionStats: overlap, touch, nest, gap — exact covered/span/gaps") {
    // u1: [0,10) ∪ [5,20) merge → [0,20); [20,25) TOUCHES → same island
    //     (end-inclusive sweep: start == max end extends); [40,45) is
    //     its own island. covered = 25+5, span = 45, gaps = 15
    // u2: [0,100) swallows [10,20) (nested) → one island, covered 100
    val rows = Seq(
      ("u1", 0L, 10L), ("u1", 5L, 20L), ("u1", 20L, 25L), ("u1", 40L, 45L),
      ("u2", 0L, 100L), ("u2", 10L, 20L),
      // degenerate: end < start is dropped; end == start is a point
      ("u3", 5L, 3L), ("u3", 7L, 7L))
      .toDF("k", "s", "e")
    val got = Intervals.unionStats(rows, "k", "s", "e").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(got("u1") === ((4L, 2L, 30L, 45L, 15L)))
    assert(got("u2") === ((2L, 1L, 100L, 100L, 0L)))
    assert(got("u3") === ((1L, 1L, 0L, 0L, 0L)))
  }

  test("unionStats is deterministic under repartitioning") {
    val rows = (1 to 300).map(i =>
      (s"u${i % 7}", (i * 37 % 100).toLong, (i * 37 % 100 + i % 13).toLong))
      .toDF("k", "s", "e")
    def run(p: Int) = Intervals.unionStats(rows.repartition(p), "k", "s", "e")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(run(1) === run(11))
  }
}

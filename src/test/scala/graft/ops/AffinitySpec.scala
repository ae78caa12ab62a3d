package graft.ops

import graft.SparkSpec

class AffinitySpec extends SparkSpec {
  import spark.implicits._

  // baskets: 1:{a,b,c} 2:{a,b} 3:{a,c} 4:{b} → N=4, C(a)=3 C(b)=3 C(c)=2
  // pairs: (a,b)=2 (a,c)=2 (b,c)=1
  private lazy val facts = Seq(
    (1, "a"), (1, "b"), (1, "c"), (1, "a"), // duplicate (1,a) must not double-count
    (2, "a"), (2, "b"),
    (3, "a"), (3, "c"),
    (4, "b")).toDF("bk", "it")

  private def run(minPairs: Long = 1L, maxBasket: Int = 256) =
    Affinity.basketPairs(facts, "bk", "it", minPairs, maxBasket)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap

  test("pair counts, cosine and lift match hand computation; duplicates collapse") {
    val m = run()
    assert(m.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")))
    val (cab, ca, cb, cos, lift) = m(("a", "b"))
    assert((cab, ca, cb) === ((2L, 3L, 3L)))
    assert(math.abs(cos - 2.0 / 3.0) < 1e-12)          // 2/sqrt(9)
    assert(math.abs(lift - 2.0 * 4 / 9.0) < 1e-12)     // 2·4/(3·3)
    assert(m(("b", "c"))._1 === 1L)
  }

  test("minPairCount prunes the tail before the stats joins") {
    val m = run(minPairs = 2L)
    assert(m.keySet === Set(("a", "b"), ("a", "c")))
  }

  test("over-cap baskets drop from pairs AND from N / item counts") {
    val m = run(maxBasket = 2) // basket 1 (3 items) excluded entirely
    // remaining population: 2:{a,b} 3:{a,c} 4:{b} → N=3, C(a)=2 C(b)=2 C(c)=1
    assert(m.keySet === Set(("a", "b"), ("a", "c")))
    val (cab, ca, cb, _, lift) = m(("a", "b"))
    assert((cab, ca, cb) === ((1L, 2L, 2L)))
    assert(math.abs(lift - 1.0 * 3 / 4.0) < 1e-12)
  }

  test("null baskets and items are excluded; single-item baskets yield no pairs") {
    val withNulls = Seq(
      (Some(1), Some("a")), (Some(1), Some("b")),
      (None, Some("a")), (Some(2), None), (Some(2), Some("z")))
      .toDF("bk", "it")
    val m = Affinity.basketPairs(withNulls, "bk", "it")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m === Map(("a", "b") -> 1L)) // z alone in basket 2 pairs with nothing
  }

  test("partitioning-independent") {
    def counts(parts: Int) =
      Affinity.basketPairs(facts.repartition(parts), "bk", "it")
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(counts(1) === counts(13))
  }
}

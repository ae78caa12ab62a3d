package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def k(a: String, b: String): Double =
    JaroWinkler.sim(UTF8String.fromString(a), UTF8String.fromString(b))

  test("literature values (all verified against DuckDB jaro_winkler_similarity)") {
    assert(math.abs(k("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-15)
    assert(math.abs(k("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-15)
    assert(math.abs(k("JELLYFISH", "SMELLYFISH") - 0.8962962962962964) < 1e-15)
    assert(math.abs(k("DWAYNE", "DUANE") - 0.8400000000000001) < 1e-15)
    assert(math.abs(k("TRATE", "TRACE") - 0.9066666666666667) < 1e-15)
    assert(math.abs(k("banana", "bananas") - 0.9714285714285714) < 1e-15)
  }

  test("edge contracts: empty, identical, no-match, window-excluded swap") {
    assert(k("", "abc") === 0.0)
    assert(k("abc", "") === 0.0)
    assert(k("abc", "abc") === 1.0)
    assert(k("A", "A") === 1.0)
    assert(k("a", "b") === 0.0)
    // window max(2,2)/2-1 = 0: transposed bigram finds no matches at all
    assert(k("ab", "ba") === 0.0)
  }

  test("odd transposition count halves by integer floor (DuckDB-verified)") {
    // 'abcxxx' vs 'cabxxx': all 6 chars match, 3 matched positions
    // disagree -> trans = 3/2 = 1 by INTEGER floor division, so
    // jaro = (1 + 1 + 5/6)/3 = 17/18; no common prefix, no boost.
    // Real-halving (1.5) would give 0.91666…; DuckDB 1.0.0 returns
    // 0.9444444444444445 — the floor contract, BIT-equal to our kernel
    // (mathematically 17/18; the shared operand order (1+1+5/6)/3 sits
    // one ulp above the direct 17.0/18.0 division).
    assert(k("abcxxx", "cabxxx") === (1.0 + 1.0 + 5.0 / 6.0) / 3.0)
    assert(k("abcxxx", "cabxxx") === 0.9444444444444445)
    // one more odd-trans pair, with a prefix boost on top:
    // 'abcde' vs 'bacde' -> 2 mismatched matches -> trans = 1,
    // jaro = (1 + 1 + 4/5)/3 = 14/15, prefix l = 0 -> unboosted
    assert(math.abs(k("abcde", "bacde") - 0.9333333333333332) < 1e-14)
  }

  test("winkler boost applies only above the 0.7 jaro threshold") {
    // jaro = 0.5 with a 2-char common prefix: stays 0.5 (DuckDB-verified)
    assert(k("abcdefgh", "abzzzzzz") === 0.5)
    // jaro = 8/9 with 4+-char prefix: boosted with l capped at 4
    assert(math.abs(k("aaaaaX", "aaaaaY") - 0.9333333333333333) < 1e-15)
  }

  test("byte-based like the oracle engine: multi-byte chars count as bytes") {
    // 'héllo' is 6 UTF-8 bytes; DuckDB scores 0.84 on the byte strings
    assert(math.abs(k("héllo", "hello") - 0.8400000000000001) < 1e-15)
  }

  test("expression path (codegen) agrees with the kernel and is null-strict") {
    val df = Seq(
      (Some("MARTHA"), Some("MARHTA")),
      (Some("DIXON"), Some("DICKSONX")),
      (None: Option[String], Some("x")),
      (Some("x"), None: Option[String])).toDF("a", "b")
    val out = df.select(JaroWinkler.jaroWinkler(col("a"), col("b")).as("jw"))
      .as[Option[Double]].collect().toSeq
    assert(out(0).contains(k("MARTHA", "MARHTA")))
    assert(out(1).contains(k("DIXON", "DICKSONX")))
    assert(out(2).isEmpty && out(3).isEmpty)
  }

  test("symmetry on a pseudo-random workload") {
    val rng = new scala.util.Random(3)
    val words = (1 to 60).map(_ =>
      (1 to (3 + rng.nextInt(8))).map(_ => ('a' + rng.nextInt(5)).toChar).mkString)
    for (a <- words.take(20); b <- words.take(20)) {
      assert(k(a, b) === k(b, a), s"asym on $a/$b")
      assert(k(a, b) >= 0.0 && k(a, b) <= 1.0)
    }
  }
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Equivalence pin for the native 60-bit md5 prefix (round-15 optimization):
  * [[Md5Hash60]] must equal the composed
  * `conv(substring(md5(s), 1, 15), 16, 10).cast("long")` chain bit-for-bit
  * on every input shape the engine feeds it — the DuckDB oracles replay the
  * composed form, so any divergence is a correctness break, not a perf bug.
  */
class Md5Hash60Spec extends SparkSpec {

  private def composed(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  test("native md5hash60 == composed hex chain on adversarial strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val strings = Seq("", " ", "a", "#", "0", "-1", "ascii word",
      "unicode ✓ ünïcode 中文 🙂", "", "x" * 4096,
      "123456789", "doc:17#3", "a b c d e f g") ++
      (1 to 500).map(_ => rnd.alphanumeric.take(rnd.nextInt(40) + 1).mkString) ++
      (1 to 200).map(i => s"$i#${i * 37}")
    val df = strings.toDF("s")
      .withColumn("native", Md5Hash60.hash60(col("s")))
      .withColumn("ref", composed(col("s")))
    assert(df.filter(col("native") =!= col("ref")).count() === 0)
    // non-negative 60-bit range
    assert(df.filter(col("native") < 0 || col("native") >= (1L << 60)).count() === 0)
  }

  test("null in, null out — same as the composed chain") {
    import spark.implicits._
    val df = Seq(Some("x"), None).toDF("s")
      .withColumn("native", Md5Hash60.hash60(col("s")))
      .withColumn("ref", composed(col("s")))
    assert(df.filter(col("s").isNull && col("native").isNotNull).count() === 0)
    assert(df.filter(col("native") <=> col("ref")).count() === 2)
  }

  test("numeric keys cast to string hash identically (bootstrap/sampling path)") {
    import spark.implicits._
    val df = (1L to 1000L).toDF("k")
      .withColumn("native", Md5Hash60.hash60(col("k").cast("string")))
      .withColumn("ref", composed(col("k").cast("string")))
    assert(df.filter(col("native") =!= col("ref")).count() === 0)
  }

  test("interpreted eval matches codegen (whole-stage off)") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val df = (1L to 200L).map(i => s"w$i").toDF("s")
        .withColumn("native", Md5Hash60.hash60(col("s")))
        .withColumn("ref", composed(col("s")))
      assert(df.filter(col("native") =!= col("ref")).count() === 0)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }
}

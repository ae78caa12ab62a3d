package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "le chat est sur le tapis et la table"),
    (3L, "xyzzy plugh"),
    (4L, "a b? c3 d-4 e")
  ).toDF("doc_id", "text")

  test("token counts: whitespace and BPE-ish") {
    val r = docs.select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.regexTokenCount(col("text")).as("nb")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(r(1L)._1 === 6L)
    // "a b? c3 d-4 e" → a, b, ?, c, 3, d, -, 4, e = 9 BPE-ish tokens
    assert(r(4L)._2 === 9L)
  }

  test("stopword ratio and quality bounded in [0,1]") {
    val en = TextAnalysis.langStopwords.head._2
    val r = docs.select(
      TextAnalysis.stopwordRatio(col("text"), en).as("sr"),
      TextAnalysis.qualityScore(col("text"), en).as("q")).collect()
    r.foreach { row =>
      assert(row.getDouble(0) >= 0 && row.getDouble(0) <= 1)
      assert(row.getDouble(1) >= 0 && row.getDouble(1) <= 1)
    }
  }

  test("language ID picks the language whose stopwords dominate") {
    val r = docs.select(col("doc_id"), TextAnalysis.langId(col("text")).as("l")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(r(1L) === "en")
    assert(r(2L) === "fr")
    // no stopword hits anywhere → all counts 0 → first language in table order
    assert(r(3L) === "en")
  }

  test("fingerprint folds case and whitespace, preserves content") {
    val fps = Seq("The  Cat", "the cat", "the dog").toDF("t")
      .select(TextAnalysis.fingerprint(col("t")).as("f")).collect().map(_.getString(0))
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }

  test("analyze attaches all standard columns") {
    val cols = TextAnalysis.analyze(docs).columns.toSet
    assert(Set("n_tokens", "n_bpe_tokens", "stopword_ratio", "avg_word_len",
      "quality", "lang_pred", "fingerprint").subsetOf(cols))
  }
}

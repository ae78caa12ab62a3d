package graft.functions

import graft.SparkSpec
import graft.llm.Similarity
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("native expression ≡ higher-order-function cosine, bit for bit") {
    val emb = graft.Tables.embeddings(spark, sf)
    val q = emb.limit(1).select(col("embedding").as("q_vec")).head().getAs[scala.collection.Seq[Float]](0)
    val qLit = array(q.toSeq.map(v => lit(v)): _*)
    val cmp = emb.select(
      CosineSimilarity.cosine(col("embedding"), qLit).as("native"),
      Similarity.cosineHof(col("embedding"), qLit).as("hof"))
    assert(cmp.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("known values and null propagation") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),   // orthogonal → 0
      (Seq(2.0f, 0.0f), Seq(4.0f, 0.0f))    // parallel → 1
    ).toDF("a", "b")
    val got = df.select(CosineSimilarity.cosine(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0))
    assert(math.abs(got(0)) < 1e-12 && math.abs(got(1) - 1.0) < 1e-12)
    val withNull = Seq((Some(Seq(1.0f)), None: Option[Seq[Float]])).toDF("a", "b")
      .select(CosineSimilarity.cosine(col("a"), col("b")).as("c")).head()
    assert(withNull.isNullAt(0))
  }

  test("codegen path: usable inside filters and aggregates") {
    val emb = graft.Tables.embeddings(spark, sf).limit(100)
    val self = emb.select(CosineSimilarity.cosine(col("embedding"), col("embedding")).as("c"))
    assert(self.filter(abs(col("c") - 1.0) > 1e-9).count() === 0)
    assert(self.agg(avg("c")).head().getDouble(0) > 0.999)
  }
}

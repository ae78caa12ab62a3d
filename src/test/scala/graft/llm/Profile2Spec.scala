package graft.llm
import graft.SparkSpec
import org.apache.spark.sql.functions._
class Profile2Spec extends SparkSpec {
  test("profile minhash v2 stages at sf0.1") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.1").cache()
    docs.count()
    def t[A](name: String)(f: => A): A = { val t0=System.nanoTime(); val r=f; println(f"[prof] $name ${(System.nanoTime()-t0)/1e9}%.2f s -> $r"); r }
    val hsAll = MinHashDedup.rollingShingleHashes(MinHashDedup.wordHashes(col("text")), 3)
    val base = docs.select(col("doc_id"), hsAll.as("hsAll")).filter(size(col("hsAll")) > 0)
    t("base (hashed shingles)")(base.count())
    val baseM = base.localCheckpoint(false)
    t("base materialize")(baseM.count())
    val signed = baseM.withColumn("sig", MinHashDedup.signatureFromHashes(col("hsAll"), 12))
      .withColumn("hs", array_distinct(col("hsAll"))).drop("hsAll")
    t("signed from baseM")(signed.count())
    val signedM = signed.localCheckpoint(false)
    t("signed materialize")(signedM.count())
    val bands = MinHashDedup.bands(signedM, "doc_id", "sig", 4, 3)
    t("bands")(bands.count())
    val pairs = MinHashDedup.candidatePairs(bands, "doc_id")
    t("pairs")(pairs.count())
    val ver = MinHashDedup.verifyJaccard(pairs, signedM, "doc_id", "hs")
    t("verify")(ver.filter(col("jaccard") >= 0.5).count())
  }
}

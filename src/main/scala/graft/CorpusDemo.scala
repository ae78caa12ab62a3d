package graft

import org.apache.spark.sql.functions._

/** End-to-end training-data pipeline demo — the LLM operator family
  * composed in production order over the synthetic corpus, one runnable
  * command (`sbt "runMain graft.CorpusDemo [sfDir]"`):
  *
  *   profile → quality/lang gates + exact dedup + transitive near-dup
  *   (CorpusPipeline) → benchmark decontamination → context-window
  *   chunking → sequence packing → token-budget mixture sampling →
  *   deterministic shard assignment → BPE vocabulary training + encode.
  *
  * Every stage is an operator with its own oracle-checked query; this main
  * shows they compose — the "a user of the reference could switch" path
  * for the training-data side, as AramDemo is for the ranking side.
  */
object CorpusDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.builder("graft-corpus-demo", "local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = Tables.documents(spark, sfDir)
    println(f"input docs: ${docs.count()}%d")

    // 1. gates + exact dedup + transitive near-dup, cheapest-first
    val (cleaned0, stats) = llm.CorpusPipeline.scrub(docs, "doc_id", "text",
      llm.CorpusPipeline.Config(minQuality = 0.3, keepLangs = Seq("en"), jaccardThreshold = 0.5))
    val cleaned = cleaned0.localCheckpoint(false)
    val s = stats.head()
    println(s"scrub: input=${s.getAs[Long]("n_input")} gates=${s.getAs[Long]("n_after_gates")} " +
      s"exact=${s.getAs[Long]("n_after_exact")} neardup=${s.getAs[Long]("n_after_neardup")}")

    // 2. decontaminate against a held-out "benchmark" (hash-sampled docs)
    val benchmark = llm.Sampling.sampleByKey(docs, "doc_id", 0.01)
      .select("doc_id", "text")
    val decontaminated = llm.Decontaminate
      .decontaminate(cleaned, benchmark, "doc_id", "text", n = 5)
      .localCheckpoint(false)
    println(s"decontaminated: ${decontaminated.count()} (benchmark n=${benchmark.count()})")

    // 3. chunk to context windows, pack into fixed token budgets
    val chunks = llm.TextAnalysis.chunkByTokens(decontaminated, "doc_id", "text",
      maxTokens = 64, overlap = 8)
    val packed = llm.TextAnalysis.packSequences(chunks.drop("chunk_text"), budget = 256)
    println(s"chunks: ${chunks.count()} packed-sequences: " +
      s"${packed.agg(countDistinct(col("seq_id"))).head().getLong(0)}")

    // 4. per-source token-budget mixture + deterministic shards
    val withToks = decontaminated
      .withColumn("toks", llm.TextAnalysis.tokenCount(col("text")))
    val mixed = llm.Sampling.tokenBudget(withToks, "source", "doc_id", "toks", budget = 5000L)
    val sharded = llm.Sampling.deterministicShards(mixed, "doc_id", nShards = 4)
    println(s"mixture sample: ${mixed.count()} docs over " +
      s"${mixed.select("source").distinct().count()} sources, 4 shards: " +
      sharded.groupBy("shard").count().orderBy("shard")
        .collect().map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(" "))

    // 5. BPE vocabulary on the final corpus; encode a sample
    val merges = llm.Bpe.train(spark, mixed, "text", numMerges = 16, minCount = 2)
    val top = merges.orderBy("rank").limit(5)
      .as[(Long, String, String, Long)].collect()
      .map { case (_, l, r, c) => s"$l+$r($c)" }.mkString(" ")
    val sampleToks = llm.Bpe.segment(spark, mixed.limit(3), "doc_id", "text", merges)
      .select(size(col("tokens"))).as[Int].collect()
    println(s"bpe: 16 merges learned, first5: $top; sample docs tokenize to " +
      s"${sampleToks.mkString("/")} tokens")

    spark.stop()
  }
}

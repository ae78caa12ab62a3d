package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import graft.llm.MinHashDedup

/** Continuous corpus dedup: each micro-batch of crawled documents is
  * near-dup-checked against every prior batch via the persisted MinHash
  * signature store, then contributes its own signatures — the streaming
  * form of [[graft.llm.MinHashDedup.incrementalNearDuplicates]], so a
  * crawl pipeline never rebuilds corpus-wide state.
  *
  * Both outputs are batchId-tagged directories (the [[UpsertSink]] delta
  * discipline): an at-least-once replay of a batch ignores its own prior
  * signatures when reading the store and overwrites exactly its own
  * outputs, so the net state is identical however many times Spark
  * re-delivers the batch.
  */
object IncrementalDedup {

  private def priorSigDirs(spark: SparkSession, dir: String, batchId: Long): Seq[String] = {
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) Seq.empty
    else fs.globStatus(new Path(dir, "sigs_*")).toSeq.map(_.getPath)
      .filter(_.getName != s"sigs_$batchId").map(_.toString)
  }

  /** foreachBatch body. Writes `dir/pairs_<batchId>` (near-dup pairs with
    * at least one side in this batch) and `dir/sigs_<batchId>` (this
    * batch's signature rows).
    */
  def processBatch(batch: DataFrame, batchId: Long, dir: String,
      idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 12, numBands: Int = 4,
      threshold: Double = 0.5): Unit = {
    val spark = batch.sparkSession
    val prior = priorSigDirs(spark, dir, batchId)
    val pairs =
      if (prior.isEmpty)
        MinHashDedup.nearDuplicates(batch, idCol, textCol, k, numHashes, numBands, threshold)
      else
        MinHashDedup.incrementalNearDuplicates(batch, spark.read.parquet(prior: _*),
          idCol, textCol, k, numHashes, numBands, threshold)
    pairs.write.mode("overwrite").parquet(s"$dir/pairs_$batchId")
    MinHashDedup.signatures(batch, idCol, textCol, k, numHashes)
      .write.mode("overwrite").parquet(s"$dir/sigs_$batchId")
  }

  /** All near-dup pairs discovered so far, across every processed batch. */
  def pairsSoFar(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/pairs_*")
}

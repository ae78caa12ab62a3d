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
  * discipline): the store view for batch N is strictly `sigs_<id < N>`,
  * so an at-least-once replay sees the same prior state it saw the first
  * time (its own and any later directories are ignored) and overwrites
  * exactly its own outputs — net state is identical however many times
  * Spark re-delivers the batch. Note batch ids restart when a query gets
  * a fresh checkpoint; point it at a fresh output dir too.
  */
object IncrementalDedup {

  private def priorSigDirs(spark: SparkSession, dir: String, batchId: Long): Seq[String] = {
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) Seq.empty
    else fs.globStatus(new Path(dir, "sigs_*")).toSeq.map(_.getPath)
      .filter(p => p.getName.stripPrefix("sigs_").toLongOption.exists(_ < batchId))
      .map(_.toString)
  }

  /** foreachBatch body. Writes `dir/pairs_<batchId>` (near-dup pairs with
    * at least one side in this batch) and `dir/sigs_<batchId>` (this
    * batch's signature rows). The batch is shingled exactly once — the
    * persisted signature table is the same one pair generation consumes.
    */
  def processBatch(batch: DataFrame, batchId: Long, dir: String,
      idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 12, numBands: Int = 4,
      threshold: Double = 0.5): Unit = {
    val spark = batch.sparkSession
    val sigs = MinHashDedup.signatures(batch, idCol, textCol, k, numHashes)
    val prior = priorSigDirs(spark, dir, batchId)
    val pairs =
      if (prior.isEmpty)
        MinHashDedup.pairsFromSignatures(sigs, idCol, numHashes, numBands, threshold)
      else
        MinHashDedup.incrementalPairsFromSigs(sigs, spark.read.parquet(prior: _*),
          idCol, numHashes, numBands, threshold)
    pairs.write.mode("overwrite").parquet(s"$dir/pairs_$batchId")
    sigs.write.mode("overwrite").parquet(s"$dir/sigs_$batchId")
  }

  /** All near-dup pairs discovered so far, across every processed batch;
    * empty (with the pair schema) when no batch has committed yet.
    */
  def pairsSoFar(spark: SparkSession, dir: String): DataFrame = {
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs =
      if (!fs.exists(base)) Seq.empty
      else fs.globStatus(new Path(dir, "pairs_*")).toSeq.map(_.getPath.toString)
    if (dirs.isEmpty) {
      import org.apache.spark.sql.types._
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("id_a", LongType), StructField("id_b", LongType),
          StructField("jaccard", DoubleType))))
    } else spark.read.parquet(dirs: _*)
  }
}

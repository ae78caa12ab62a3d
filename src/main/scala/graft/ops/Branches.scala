package graft.ops

import org.apache.spark.sql.DataFrame

/** Overlap the independent branches of a composed query (guide §2.6
  * "Overlap independent jobs").
  *
  * The composed ledger queries (graph / classifier / corpus / retrieval /
  * drift pipelines) fold several independent sub-analyses over one shared
  * input into a handful of 1-row aggregates and cross-join them. Branches
  * whose construction is fully lazy already overlap inside the final
  * action (the DAG scheduler submits every ready stage), but a branch that
  * runs its own driver-side loop — connected components' pointer jumping,
  * PageRank's per-sweep eager checkpoints, a fit that collects a
  * metadata-sized model — serializes the WHOLE pipeline on its internal
  * actions: round-16 stage profiles showed the composed rows spending most
  * of their wall in back-to-back sub-second stages from different branches
  * that never overlapped.
  *
  * `materialize` runs each branch thunk on its own thread and eagerly
  * materializes the branch result with `localCheckpoint(true)`, so
  * iterative branches interleave their stages on the same scheduler
  * (FIFO: later jobs back-fill the tail of earlier ones — exactly the
  * guide's pattern). Each branch's plan is UNCHANGED — the thunks are the
  * same single-branch DataFrames as before, the checkpoint only cuts
  * lineage after the branch's own final operator — so results are
  * bit-identical to the sequential composition; only the wall-clock
  * overlap changes. Branch results in a composed ledger are aggregate- or
  * candidate-sized by construction, so the eager checkpoint materializes
  * rows the cross-join was about to materialize anyway.
  *
  * Thread-safety: SparkSession supports concurrent actions; job
  * descriptions/groups are thread-local so per-branch failures propagate
  * through `Await.result` exactly like the sequential form (first failure
  * rethrows; the session is untouched).
  */
object Branches {

  def materialize(branches: Seq[() => DataFrame]): Seq[DataFrame] = {
    if (branches.sizeIs <= 1) return branches.map(f => f().localCheckpoint(true))
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(branches.size)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try {
      val fs = branches.map(f => Future(f().localCheckpoint(true)))
      Await.result(Future.sequence(fs), Duration.Inf)
    } finally {
      pool.shutdown(); ()
    }
  }

  /** [[materialize]] for exactly two branches, preserving static types. */
  def materialize2(a: () => DataFrame, b: () => DataFrame): (DataFrame, DataFrame) = {
    val Seq(ra, rb) = materialize(Seq(a, b))
    (ra, rb)
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recursive-hierarchy resolution — the `WITH RECURSIVE` surface (org
  * charts, category trees, thread ancestry) Spark SQL lacks, expressed
  * as data-parallel iteration.
  *
  * The naive translation walks one parent level per round: O(depth)
  * self-joins, each a full shuffle — a 40-deep tree costs 40 passes.
  * Here each round POINTER-JUMPS: every node's known-ancestor pointer is
  * replaced by that ancestor's own pointer, and the walked distance
  * accumulates, so the remaining path HALVES each round — O(log depth)
  * shuffles total (the [[graft.llm.DupClusters]] doubling argument, on a
  * directed forest with depth accounting). Each round is ONE keyed
  * equi-join of the |nodes|-sized state against itself plus a 1-row
  * convergence aggregate; state materializes per round (localCheckpoint)
  * so lineage never stacks.
  *
  * A non-null parent that never appears as a node is treated as an
  * implicit root (the join misses, the pointer stays put) — external
  * attachment points resolve instead of erroring.
  */
object Hierarchy {

  /** Resolve every node of a parent-child forest to (node, root, depth):
    * `root` = the ultimate ancestor (itself for roots), `depth` = edge
    * count to it (0 for roots). `edges`: one row per node with its
    * parent, parent NULL for roots. Cycles don't terminate by
    * convergence; `maxIters` (default 40 ≈ depth 2⁴⁰) bounds the loop
    * and throws rather than looping forever.
    */
  def resolveRoots(edges: DataFrame, nodeCol: String, parentCol: String,
                   maxIters: Int = 40): DataFrame = {
    var st = edges.select(col(nodeCol).as("node"),
        coalesce(col(parentCol), col(nodeCol)).as("anc"),
        when(col(parentCol).isNull, 0L).otherwise(1L).as("dist"))
      .localCheckpoint(false)
    var iters = 0
    var progressed = true
    while (progressed) {
      if (iters >= maxIters)
        throw new IllegalStateException(
          s"Hierarchy.resolveRoots: no convergence after $maxIters rounds — cycle in the parent graph?")
      val lk = st.select(col("node").as("anc"), col("anc").as("__anc2"),
        col("dist").as("__d2"))
      val nxt = st.join(lk, Seq("anc"), "left_outer")
        .select(col("node"),
          coalesce(col("__anc2"), col("anc")).as("anc"),
          (col("dist") + coalesce(col("__d2"), lit(0L))).as("dist"),
          coalesce(col("__d2"), lit(0L)).as("__step"))
        .localCheckpoint(false)
      progressed = nxt.agg(max(col("__step"))).first().getLong(0) > 0
      st = nxt.drop("__step")
      iters += 1
    }
    st.select(col("node").as(nodeCol), col("anc").as("root"),
      col("dist").as("depth"))
  }
}

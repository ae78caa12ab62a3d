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
      // coalesce: max over ZERO rows is null (empty edges input) — that
      // is "converged", not an NPE
      progressed = nxt.agg(coalesce(max(col("__step")), lit(0L)))
        .first().getLong(0) > 0
      st = nxt.drop("__step")
      iters += 1
    }
    st.select(col("node").as(nodeCol), col("anc").as("root"),
      col("dist").as("depth"))
  }

  /** Full ancestor closure of the forest: one row per (node, ancestor)
    * pair including the node itself at dist 0 — the materialization
    * behind subtree rollups ("cost of every org unit including
    * descendants"). Built by path DOUBLING: each round composes the
    * closure with itself (a→b ∘ b→c ⇒ a→c), so path length doubles per
    * round — O(log depth) self-joins to the fixpoint, never a
    * depth-sequential walk. Output size is Σ depths (unique paths in a
    * forest), which is what any closure costs; the rounds each cost one
    * keyed self-join + distinct over that closure, checkpointed.
    */
  def ancestorClosure(edges: DataFrame, nodeCol: String, parentCol: String,
                      maxIters: Int = 40): DataFrame = {
    var c = edges.select(col(nodeCol).as("node"), col(nodeCol).as("anc"),
        lit(0L).as("dist"))
      .unionByName(edges.filter(col(parentCol).isNotNull)
        .select(col(nodeCol).as("node"), col(parentCol).as("anc"),
          lit(1L).as("dist")))
      .localCheckpoint(false)
    var size = c.count()
    var iters = 0
    var grew = true
    while (grew) {
      if (iters >= maxIters)
        throw new IllegalStateException(
          s"Hierarchy.ancestorClosure: no fixpoint after $maxIters rounds — cycle?")
      val hop = c.select(col("anc").as("__mid"), col("node"),
        col("dist").as("__d1"))
      val ext = c.select(col("node").as("__mid"), col("anc"),
        col("dist").as("__d2"))
      val next = c.unionByName(
          hop.join(ext, Seq("__mid"))
            .select(col("node"), col("anc"), (col("__d1") + col("__d2")).as("dist")))
        .distinct()
        .localCheckpoint(false)
      val n = next.count()
      grew = n != size
      c = next; size = n; iters += 1
    }
    c.select(col("node").as(nodeCol), col("anc"), col("dist"))
  }

  /** Subtree rollup: per ancestor — how many descendants-or-self it has
    * and the total of `metric` over them. `metrics`: (nodeCol, metric
    * value) one row per node.
    */
  def subtreeRollup(edges: DataFrame, metrics: DataFrame, nodeCol: String,
                    parentCol: String, metricCol: String): DataFrame = {
    val closure = ancestorClosure(edges, nodeCol, parentCol)
    closure
      .join(metrics.select(col(nodeCol), col(metricCol)), Seq(nodeCol))
      .groupBy(col("anc").as(nodeCol))
      .agg(count(lit(1)).as("subtree_nodes"),
        sum(col(metricCol)).as("subtree_total"))
  }
}

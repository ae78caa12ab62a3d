package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative link-graph ranking (PageRank) in fixed-point integer
  * arithmetic — the crawl-prioritization / source-weighting primitive a
  * web-scale training-data pipeline runs over its domain graph.
  *
  * Why fixed-point: float PageRank sums per-destination contributions in
  * partition order, so two engines (or two runs with different partition
  * counts) disagree in the low bits and the result cannot be hash-compared.
  * Here every quantity is a BIGINT — total mass is scaled to `scaleTotal`,
  * each hop is an integer division, and damping is `(85·x) div 100` — so
  * BIGINT addition is order-free and the result is bit-identical on any
  * engine that implements the same recurrence (the DuckDB oracle unrolls
  * it as chained CTEs). Mass lost to integer truncation is part of the
  * defined semantics, not an error term.
  *
  * Recurrence (iteration t, N = node count, init = scaleTotal div N):
  *   pr_0(v)   = init
  *   pr_t(v)   = (15·init) div 100  +  (85 · Σ_{u→v} (pr_{t-1}(u) div outdeg(u))) div 100
  * Nodes with no in-edges keep the teleport term; dangling nodes (no
  * out-edges) simply leak their mass — callers that want none symmetrize
  * the edge list first (the bundled query does).
  *
  * Scale shape: the edge list is degree-joined, hash-partitioned by `src`
  * ONCE and cached — `InMemoryRelation` preserves the child's
  * `outputPartitioning`, so every iteration's join reuses that layout and
  * only the (node, pr) table (one row per node, two longs wide) moves per
  * round. Lineage is cut every other round with an eager
  * `localCheckpoint`, the same guard as the connected-components loop
  * (`DupClusters`), so plan size stays O(1) in the iteration count.
  */
object GraphRank {

  /** edges: (src BIGINT, dst BIGINT), interpreted as directed. Returns
    * (node BIGINT, pr BIGINT) after `iterations` rounds.
    */
  def pageRankFixedPoint(edges: DataFrame, iterations: Int,
                         scaleTotal: Long = 1000000000000L): DataFrame = {
    require(iterations >= 0, "iterations must be non-negative")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // partitioned once by src; every per-iteration join reuses this layout
    val eDeg = e.join(deg, "src")
      .select("src", "dst", "outdeg")
      .repartition(col("src"))
      .cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)

    val n = nodes.count()
    require(n > 0, "empty graph")
    val init = scaleTotal / n
    val teleport = (15L * init) / 100L

    var ranks = nodes.withColumn("pr", lit(init))
    var i = 0
    while (i < iterations) {
      val inflow = eDeg.join(ranks, eDeg("src") === ranks("node"))
        .select(col("dst").as("node"), expr("pr div outdeg").as("c"))
        .groupBy("node")
        .agg(sum(col("c")).as("inflow"))
      ranks = nodes.join(inflow, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) + expr("(85 * coalesce(inflow, 0L)) div 100")).as("pr"))
      i += 1
      if (i % 2 == 0 && i < iterations) ranks = ranks.localCheckpoint(true)
    }
    ranks
  }
}

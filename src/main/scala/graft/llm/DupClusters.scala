package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Transitive duplicate clustering: connected components over the near-dup
  * pair graph by iterative min-label propagation — upgrades pairwise
  * survivorship (drop b of every (a,b)) to true cluster dedup (one
  * survivor per connected component, however the pairs chain).
  *
  * Each iteration is one join + aggregate (labels flow across edges, every
  * vertex takes the min label it can see), so the whole computation is
  * O(diameter) shuffles — near-dup graphs have tiny diameters (dup
  * clusters are dense), so this converges in a handful of rounds. Lineage
  * is cut per iteration (`localCheckpoint`) — without it the plan doubles
  * every round, which is the classic iterative-DataFrame trap.
  */
object DupClusters {

  /** (id, cluster_id) for every id that appears in `pairs`; cluster_id =
    * the minimum id in the component.
    *
    * Throws `IllegalStateException` if labels have not converged after
    * `maxIter` rounds (a component with diameter > maxIter) — silently
    * returning partially-propagated labels would split clusters. Near-dup
    * graphs have tiny diameters, so the default budget is generous; raise
    * `maxIter` for adversarial chain-shaped graphs.
    */
  def clusters(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // symmetric edge list
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct().localCheckpoint(false)

    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint(false)

    // Convergence check via the label-sum invariant: labels are monotone
    // non-increasing per id (least of own and neighbor min), so the total
    // changed iff any label changed — one cheap aggregate per round instead
    // of a join + count against the previous labels.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)

    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val nbrMin = edges.join(labels, edges("src") === labels("id"))
        .groupBy(col("dst").as("id2")).agg(min(col("label")).as("nbr_min"))
      val next = labels.join(nbrMin, labels("id") === nbrMin("id2"), "left")
        .select(col("id"), least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
        .localCheckpoint(false)
      val s = labelSum(next)
      converged = (s == null && prevSum == null) || (s != null && s.compareTo(prevSum) == 0)
      prevSum = s
      labels = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"DupClusters.clusters did not converge in $maxIter iterations; " +
          "a component's diameter exceeds the budget — raise maxIter")
    labels.select(col("id"), col("label").as("cluster_id"))
  }

  /** Deduplicate a corpus by its near-dup pairs: keep one representative
    * (the min id) per connected component; rows in no pair survive as-is.
    */
  def dropClusters(docs: DataFrame, pairs: DataFrame, idCol: String): DataFrame = {
    val toDrop = clusters(pairs)
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as(idCol))
    // No broadcast hint: the drop set is proportional to the corpus's dup
    // mass (unbounded at 100 TB). AQE picks broadcast-hash when it is in
    // fact small; otherwise this degrades to a shuffled anti-join, which
    // is the plan that survives scale.
    docs.join(toDrop, Seq(idCol), "left_anti")
  }
}

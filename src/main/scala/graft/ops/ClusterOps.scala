package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dedup clustering: connected components over a near-duplicate candidate
  * pair graph (the LSH output), then one canonical document per cluster.
  *
  * This is the step a real training-data pipeline runs AFTER pair
  * generation — near-dup is transitive in practice (A≈B, B≈C ⇒ drop two
  * of the three), so the unit of deduplication is the component, not the
  * pair.
  *
  * Scale design: min-label propagation with a pointer-doubling shortcut —
  * the same primitive as the tree labeler. Per round:
  *   1. relax:    lbl(v) ← min(lbl(v), min over neighbors' lbl)   [1 shuffle]
  *   2. shortcut: lbl(v) ← lbl(lbl(v))                            [1 shuffle]
  * Labels are monotone non-increasing, so Σ lbl is an exact-integer
  * convergence witness; the shortcut makes rounds O(log component
  * diameter), not O(diameter). Every round localCheckpoints (plan-lineage
  * truncation — analysis would otherwise blow up, measured on the tree
  * labeler). The min aggregations combine map-side, so a hub node receives
  * #partitions rows, never its degree.
  */
object ClusterOps {

  /** Connected components of an undirected edge set.
    *
    * @param edges (a, b) candidate pairs, any orientation, self-loops ok
    * @param nodes (id) the full node universe — singletons (no edges)
    *              appear in the output labeled by themselves
    * @return (id, component) where component = min node id reachable
    */
  def connectedComponents(edges: DataFrame, nodes: DataFrame,
      maxRounds: Int = 25): DataFrame = {
    val e = edges.select(col("a").cast("long").as("u"), col("b").cast("long").as("v"))
      .filter(col("u") =!= col("v"))
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      .distinct()
      .localCheckpoint()
    var lbl = nodes.select(col("id").cast("long").as("id"))
      .distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint()
    var prevSum = -1L
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      // relax: pull the min label across each node's neighborhood
      val nbrMin = sym.join(lbl.select(col("id").as("v"), col("lbl").as("nlbl")), "v")
        .groupBy(col("u").as("id"))
        .agg(min(col("nlbl")).as("nmin"))
      val relaxed = lbl.join(nbrMin, Seq("id"), "left")
        .select(col("id"), least(col("lbl"), coalesce(col("nmin"), col("lbl"))).as("lbl"))
      // shortcut: jump to the label's own label (pointer doubling)
      val next = relaxed.alias("x")
        .join(relaxed.select(col("id").as("lbl"), col("lbl").as("ll")).alias("y"),
          Seq("lbl"), "left")
        .select(col("x.id").as("id"), coalesce(col("ll"), col("lbl")).as("lbl"))
        .localCheckpoint()
      val s = next.agg(sum(col("lbl"))).head.getLong(0)
      converged = s == prevSum
      prevSum = s
      lbl = next
      round += 1
    }
    require(converged, s"connected components did not converge in $maxRounds rounds")
    lbl.select(col("id"), col("lbl").as("component"))
  }

  /** One canonical document per cluster: highest quality score wins, ties
    * broken by lowest id (a total order — required for determinism).
    * @param clustered (id, component)
    * @param quality   (id, score)
    * @return (component, n_docs, keep_id, keep_score)
    */
  def canonicalPerCluster(clustered: DataFrame, quality: DataFrame): DataFrame = {
    val joined = clustered.join(quality, "id")
    val w = Window.partitionBy(col("component"))
      .orderBy(col("score").desc, col("id"))
    joined.withColumn("rk", row_number().over(w))
      .withColumn("n_docs", count(lit(1)).over(Window.partitionBy(col("component"))))
      .filter(col("rk") === 1)
      .select(col("component"), col("n_docs"),
        col("id").as("keep_id"), col("score").as("keep_score"))
  }
}

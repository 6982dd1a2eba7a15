package graft.tree

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed tree labeling — the architectural core (SURVEY.md §7.1).
  *
  * The reference stores a pointer graph and answers every query by walking
  * it (GraphExplorer.java traversals). Instead, one ingest-time labeling
  * pass turns the tree into a relational table on which every traversal
  * becomes a join/filter/aggregation Catalyst can optimize:
  *
  *   - descendants(n)   ≡ `pre BETWEEN n.pre AND n.post`
  *   - lineage(n)       ≡ `explode(ancestors)`
  *   - MRCA(S)          ≡ deepest common element of ancestor arrays
  *   - depth limits     ≡ `depth <= n.depth + h`
  *   - tip counts       ≡ precomputed `tip_descendants`
  *     (replaces the reference's edge-stored counter,
  *     IngestSynthesisData.java:435-442)
  *
  * Scale: levels are computed by iterative parent joins (tree-depth
  * iterations, each a shuffle bounded by the level size); `pre` comes from
  * a distributed sort + zipWithIndex (no driver collect); `post` and
  * `tip_descendants` come from one explode + aggregate whose root-key skew
  * is absorbed by partial (map-side) aggregation.
  */
object TreeLabeler {

  /** Label a tree given as an edge list.
    *
    * @param edges DataFrame with columns child_id: Long, parent_id: Long,
    *              child_ord: Int (sibling order; determines DFS order)
    * @return DataFrame: node_id, parent_id (-1 at root), depth (Long),
    *         child_ord, ancestors (Array[Long], root→self inclusive),
    *         pre, post (Long), is_leaf (Boolean), tip_descendants (Long),
    *         n_desc (Long, descendants incl. self)
    */
  def label(spark: SparkSession, edges: DataFrame, maxDepth: Int = 1000): DataFrame = {
    import spark.implicits._

    val e = edges.select(
      col("child_id").cast("long"),
      col("parent_id").cast("long"),
      col("child_ord").cast("int"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // roots: parents that never appear as a child
    val roots = e.select(col("parent_id").as("node_id")).distinct()
      .join(e.select(col("child_id")).distinct(),
        col("node_id") === col("child_id"), "left_anti")
      .select(
        col("node_id"),
        lit(-1L).as("parent_id"),
        lit(0L).as("depth"),
        lit(0).as("child_ord"),
        array(col("node_id")).as("ancestors"),
        array().cast("array<int>").as("ord_path"))

    // localCheckpoint (eager) truncates the logical plan at every level —
    // without it the level-N plan nests all N-1 predecessors, the union is
    // quadratic in depth, and downstream self-joins double it again (plan
    // analysis alone ran minutes/OOM'd on a 12-level tree).
    var levels = List(roots.localCheckpoint())
    var frontier = levels.head
    var d = 0
    var n = frontier.count()
    while (n > 0 && d < maxDepth) {
      val next = frontier.alias("f")
        .join(e.alias("e"), col("f.node_id") === col("e.parent_id"))
        .select(
          col("e.child_id").as("node_id"),
          col("f.node_id").as("parent_id"),
          (col("f.depth") + 1L).as("depth"),
          col("e.child_ord"),
          concat(col("f.ancestors"), array(col("e.child_id"))).as("ancestors"),
          concat(col("f.ord_path"), array(col("e.child_ord"))).as("ord_path"))
        .localCheckpoint()
      n = next.count()
      if (n > 0) levels = next :: levels
      frontier = next
      d += 1
    }
    require(d < maxDepth, s"tree deeper than $maxDepth or cyclic")

    val all = levels.reverse.reduce(_ union _).persist(StorageLevel.MEMORY_AND_DISK)

    // pre = rank in DFS order = lexicographic rank of the sibling-order path.
    // Distributed: range-partitioned sort, then order-preserving zipWithIndex.
    val pre = all.sort(col("ord_path")).select(col("node_id"))
      .rdd.zipWithIndex()
      .map { case (r, idx) => (r.getLong(0), idx) }
      .toDF("node_id", "pre")

    val parents = e.select(col("parent_id").as("node_id")).distinct()
    val withPre = all.join(pre, "node_id")
      .join(parents.withColumn("has_kids", lit(true)), Seq("node_id"), "left_outer")
      .withColumn("is_leaf", coalesce(col("has_kids"), lit(false)) === false)
      .drop("has_kids")
      .persist(StorageLevel.MEMORY_AND_DISK)

    // post / tip counts: every node sends (pre, is_leaf) to all its ancestors
    // (self included). Partial aggregation absorbs the root-key skew.
    val agg = withPre
      .select(explode(col("ancestors")).as("anc"), col("pre"), col("is_leaf"))
      .groupBy(col("anc"))
      .agg(
        max(col("pre")).as("post"),
        sum(when(col("is_leaf"), 1L).otherwise(0L)).as("tip_descendants"),
        count(lit(1)).as("n_desc"))
      .withColumnRenamed("anc", "node_id")

    // Checkpoint the result too: consumers self-join it repeatedly (lineage,
    // subtree, induced), and a truncated plan keeps those joins flat.
    val out = withPre.join(agg, "node_id")
      .select("node_id", "parent_id", "depth", "child_ord", "ancestors",
        "pre", "post", "is_leaf", "tip_descendants", "n_desc")
      .localCheckpoint()
    withPre.unpersist()
    all.unpersist()
    e.unpersist()
    out
  }
}

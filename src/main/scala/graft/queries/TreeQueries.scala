package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.tree.{TreeLabeler, TreeOps}

/** Tree/hierarchy operator surface (SURVEY §2.2 P4, §2.3 J7, §2.4 A1/A2/A4,
  * §2.5 W1, §3.1–3.3) exercised — with exact DuckDB recursive-CTE oracles —
  * on a heap-encoded tree over the customer table: node k's parent is k/2
  * (node_id = c_custkey + 1, root 1). Depth grows with SF (~11 at sf0.01,
  * ~14 at sf0.1), so the iterative labeler runs a realistic number of
  * levels at every scale.
  *
  * The heap encoding also gives the oracles two closed forms that make
  * recursive SQL cheap: depth(k) = length(bin(k)) - 1, and the deepest of a
  * chain of common ancestors = max(id).
  */
object TreeQueries {

  type Q = (SparkSession, String) => DataFrame

  private val cache = new graft.SessionCache[DataFrame]()

  /** Labeled heap tree for a testdata dir, built once per session and
    * cached (the labeling pass is ingest-time work, not query-time work).
    */
  def labeled(s: SparkSession, d: String): DataFrame =
    cache.get(s, d) {
      val edges = Tables.customer(s, d)
        .select((col("c_custkey") + 1L).as("child_id"))
        .filter(col("child_id") > 1L)
        .withColumn("parent_id", expr("child_id div 2"))
        .withColumn("child_ord", (col("child_id") % 2L).cast("int"))
      TreeLabeler.label(s, edges).persist()
    }

  val treeLabels: Q = (s, d) =>
    labeled(s, d).select(col("node_id"), col("parent_id"), col("depth"),
      col("is_leaf"), col("tip_descendants"))

  val treeLineage: Q = (s, d) =>
    TreeOps.lineageWhere(labeled(s, d), col("node_id") <= 40L)
      .select(col("node_id"), col("ancestor_id"), col("ancestor_depth"))

  val treeMrca: Q = (s, d) => {
    import s.implicits._
    val pairs = Seq(37L, 58L, 91L, 100L).toDF("a")
      .crossJoin(Seq(41L, 77L, 89L).toDF("b"))
    TreeOps.mrcaPairs(labeled(s, d), pairs)
  }

  val treeSubtree: Q = (s, d) =>
    TreeOps.subtree(labeled(s, d), rootId = 3L, maxDepth = 5)
      .select(col("node_id"), col("rel_depth"))

  /** The semantic descendant predicate, answered through the optimizer
    * rewrite ([[graft.plans.DescendantIntervalRewrite]]): the anchor's
    * interval is registered (one bounded collect), then the query asks
    * the natural `descendant_of(ancestors, x)` question and the rule
    * turns it into a pushable `pre` range. The oracle walks the heap
    * tree recursively — a fully independent derivation of the clade.
    */
  val treeDescendants: Q = (s, d) => {
    val t = labeled(s, d)
    graft.plans.IntervalCatalog.registerAnchors(t, Seq(5L))
    t.filter(graft.plans.DescendantRewrite
        .descendant_of(col("ancestors"), lit(5L)))
      .select(col("node_id"), col("depth"))
  }

  val treeInduced: Q = (s, d) =>
    TreeOps.induced(labeled(s, d), Seq(22L, 31L, 44L, 45L, 53L, 99L))
      .select(col("node_id"), col("parent_id"), col("is_query"))

  val registry: Map[String, Q] = Map(
    "tree_labels" -> treeLabels,
    "tree_lineage" -> treeLineage,
    "tree_mrca" -> treeMrca,
    "tree_subtree" -> treeSubtree,
    "tree_descendants" -> treeDescendants,
    "tree_induced" -> treeInduced
  )

  val oracle: Map[String, String] = Map(
    "tree_labels" ->
      """WITH RECURSIVE
        |nodes_h AS (SELECT c_custkey + 1 AS node_id FROM customer),
        |parents AS (SELECT DISTINCT node_id // 2 AS p FROM nodes_h WHERE node_id > 1),
        |leaves AS (SELECT node_id FROM nodes_h WHERE node_id NOT IN (SELECT p FROM parents)),
        |anc(leaf, a) AS (
        |  SELECT node_id, node_id FROM leaves
        |  UNION ALL
        |  SELECT leaf, a // 2 FROM anc WHERE a > 1),
        |tips AS (SELECT a AS node_id, count(*) AS tip_descendants FROM anc GROUP BY a),
        |depth(node_id, depth) AS (
        |  SELECT CAST(1 AS BIGINT), CAST(0 AS BIGINT)
        |  UNION ALL
        |  SELECT n.node_id, d.depth + 1 FROM nodes_h n
        |  JOIN depth d ON n.node_id // 2 = d.node_id AND n.node_id > 1)
        |SELECT n.node_id,
        |  CAST(CASE WHEN n.node_id = 1 THEN -1 ELSE n.node_id // 2 END AS BIGINT) AS parent_id,
        |  d.depth,
        |  (n.node_id IN (SELECT node_id FROM leaves)) AS is_leaf,
        |  t.tip_descendants
        |FROM nodes_h n JOIN depth d USING (node_id) JOIN tips t USING (node_id)""".stripMargin,
    "tree_lineage" ->
      """WITH RECURSIVE anc(node_id, ancestor_id) AS (
        |  SELECT c_custkey + 1, c_custkey + 1 FROM customer WHERE c_custkey + 1 <= 40
        |  UNION ALL
        |  SELECT node_id, ancestor_id // 2 FROM anc WHERE ancestor_id > 1)
        |SELECT node_id, ancestor_id,
        |  CAST(length(bin(ancestor_id)) - 1 AS BIGINT) AS ancestor_depth
        |FROM anc""".stripMargin,
    "tree_mrca" ->
      """WITH RECURSIVE
        |q(a, b) AS (SELECT CAST(x AS BIGINT), CAST(y AS BIGINT)
        |  FROM (VALUES (37),(58),(91),(100)) va(x)
        |  CROSS JOIN (VALUES (41),(77),(89)) vb(y)),
        |aanc(a, anc) AS (
        |  SELECT DISTINCT a, a FROM q
        |  UNION ALL
        |  SELECT a, anc // 2 FROM aanc WHERE anc > 1),
        |banc(b, anc) AS (
        |  SELECT DISTINCT b, b FROM q
        |  UNION ALL
        |  SELECT b, anc // 2 FROM banc WHERE anc > 1)
        |SELECT q.a, q.b, max(x.anc) AS mrca_id
        |FROM q JOIN aanc x ON x.a = q.a JOIN banc y ON y.b = q.b AND y.anc = x.anc
        |GROUP BY q.a, q.b""".stripMargin,
    "tree_subtree" ->
      """WITH RECURSIVE d(node_id, rel_depth) AS (
        |  SELECT CAST(3 AS BIGINT), CAST(0 AS BIGINT)
        |  UNION ALL
        |  SELECT c.c_custkey + 1, d.rel_depth + 1 FROM customer c
        |  JOIN d ON (c.c_custkey + 1) // 2 = d.node_id WHERE d.rel_depth < 5)
        |SELECT node_id, rel_depth FROM d""".stripMargin,
    "tree_descendants" ->
      """WITH RECURSIVE d(node_id) AS (
        |  SELECT CAST(5 AS BIGINT)
        |  UNION ALL
        |  SELECT c.c_custkey + 1 FROM customer c
        |  JOIN d ON (c.c_custkey + 1) // 2 = d.node_id)
        |SELECT node_id,
        |  CAST(length(bin(node_id)) - 1 AS BIGINT) AS depth
        |FROM d""".stripMargin,
    "tree_induced" ->
      """WITH RECURSIVE
        |q(tip) AS (SELECT CAST(x AS BIGINT)
        |  FROM (VALUES (22),(31),(44),(45),(53),(99)) v(x)),
        |p(tip, anc, child_on_path) AS (
        |  SELECT tip, tip, CAST(NULL AS BIGINT) FROM q
        |  UNION ALL
        |  SELECT tip, anc // 2, anc FROM p WHERE anc > 1),
        |stats AS (
        |  SELECT anc, count(DISTINCT tip) AS n_tips,
        |         count(DISTINCT child_on_path) AS n_branch,
        |         length(bin(anc)) - 1 AS depth
        |  FROM p GROUP BY anc),
        |m AS (SELECT anc AS mrca_id, depth AS mrca_depth FROM stats
        |  WHERE n_tips = (SELECT count(*) FROM q) ORDER BY depth DESC LIMIT 1),
        |kept AS (
        |  SELECT DISTINCT node_id FROM (
        |    SELECT anc AS node_id FROM stats, m
        |    WHERE (n_branch >= 2 AND depth >= mrca_depth) OR anc = mrca_id
        |    UNION ALL SELECT tip FROM q)),
        |kanc(node_id, anc) AS (
        |  SELECT node_id, node_id // 2 FROM kept WHERE node_id > 1
        |  UNION ALL
        |  SELECT node_id, anc // 2 FROM kanc WHERE anc > 1),
        |par AS (
        |  SELECT k.node_id, max(k.anc) AS parent_id
        |  FROM kanc k JOIN kept ke ON k.anc = ke.node_id, m
        |  WHERE length(bin(k.anc)) - 1 >= m.mrca_depth
        |  GROUP BY k.node_id)
        |SELECT node_id, CAST(coalesce(parent_id, -1) AS BIGINT) AS parent_id,
        |  (node_id IN (SELECT tip FROM q)) AS is_query
        |FROM kept LEFT JOIN par USING (node_id)""".stripMargin
  )
}

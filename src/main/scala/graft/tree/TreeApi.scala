package graft.tree

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.tree.TreeIngest.Ingested

/** The reference's serving endpoints re-expressed over the labeled tables
  * (SURVEY §3; tree_of_life_v3.java): `about`, `node_info`, arguson
  * subtree documents, supporting-studies aggregation. The HTTP layer is
  * out of scope (SURVEY §7.5 non-goals); these return DataFrames/JSON.
  */
object TreeApi {

  /** `mrca` endpoint result (tree_of_life_v3.java:258-363). `ok=false`
    * mirrors the reference's BadIdsException path: the result is still
    * computed from the valid ids, but partial-invalid input is flagged
    * (thrown-after-computing semantics, tree_of_life_v3.java:359-361).
    */
  final case class MrcaResult(
      mrcaOtId: String,
      mrcaName: Option[String],
      nearestTaxonOtId: Option[String], // set when the MRCA itself is unnamed
      nodeIdsNotInTree: Seq[String],
      ottIdsNotInTree: Seq[Long],
      ok: Boolean)

  /** `induced_subtree` endpoint result (tree_of_life_v3.java:403-518). */
  final case class InducedResult(
      newick: String,
      nodeIdsNotInTree: Seq[String],
      ottIdsNotInTree: Seq[Long],
      ok: Boolean)

  /** Resolve request ids (ot_node_id strings and/or ott ids) against the
    * tree: (found internal node ids, node_ids not in tree, ott_ids not in
    * tree) — the P5/J6 partition of SURVEY §3.1 step 3.
    */
  def resolveIds(t: Ingested, nodeIds: Seq[String], ottIds: Seq[Long])
      : (Seq[Long], Seq[String], Seq[Long]) = {
    val byOt = t.nodes.filter(col("ot_node_id").isin(nodeIds: _*))
      .select(col("ot_node_id"), col("node_id")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val byUid = t.nodes.filter(col("tax_uid").isin(ottIds: _*))
      .select(col("tax_uid"), col("node_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val found = (nodeIds.flatMap(byOt.get) ++ ottIds.flatMap(byUid.get)).distinct
    (found, nodeIds.filterNot(byOt.contains), ottIds.filterNot(byUid.contains))
  }

  /** `mrca`: deepest node covering all valid query ids; when unnamed, also
    * the nearest taxon above it (GraphExplorer.java:617-664).
    */
  def mrca(t: Ingested, nodeIds: Seq[String] = Nil, ottIds: Seq[Long] = Nil): MrcaResult = {
    val (found, badNodes, badOtts) = resolveIds(t, nodeIds, ottIds)
    require(found.nonEmpty, "no valid node or ott ids provided")
    val m = TreeOps.mrcaOfSet(t.nodes, found).head().getLong(0)
    val row = t.nodes.filter(col("node_id") === m)
      .select(col("ot_node_id"), col("name")).head()
    val nearest =
      if (row.isNullAt(1))
        Some(TreeOps.mrta(t.nodes, m).select(col("ot_node_id")).head().getString(0))
      else None
    MrcaResult(row.getString(0), Option(row.getString(1)), nearest,
      badNodes, badOtts, ok = badNodes.isEmpty && badOtts.isEmpty)
  }

  /** `induced_subtree`: minimal spanning tree over ≥2 valid ids, as newick
    * with not-in-tree lists (tree_of_life_v3.java:403-518).
    */
  def inducedSubtree(t: Ingested, nodeIds: Seq[String] = Nil,
      ottIds: Seq[Long] = Nil, labelFormat: String = "name_and_id",
      idsForUnnamed: Boolean = false): InducedResult = {
    val (found, badNodes, badOtts) = resolveIds(t, nodeIds, ottIds)
    require(found.size >= 2,
      s"at least 2 valid ids required, got ${found.size}")
    val nwk = TreeOps.inducedNewick(t.nodes, found, labelFormat, idsForUnnamed)
    InducedResult(nwk, badNodes, badOtts, ok = badNodes.isEmpty && badOtts.isEmpty)
  }

  /** `about` (tree_of_life_v3.java:39-122): tree-level metadata plus the
    * root node blob.
    */
  def about(t: Ingested): DataFrame = {
    val rootBlob = t.nodes.filter(col("parent_id") === -1L)
      .select(col("ot_node_id").as("root_ot_node_id"),
        col("name").as("root_name"),
        col("unique_name").as("root_unique_name"),
        col("tax_uid").as("root_tax_uid"),
        col("tip_descendants").as("root_num_tips"))
    t.treeMeta.drop("root_ot_node_id").crossJoin(broadcast(rootBlob))
  }

  /** `node_info` (tree_of_life_v3.java:130-227): taxon blob + num_tips +
    * released annotation fields, optional lineage array ordered
    * nearest→root (W1 semantics, GraphExplorer.java:228-236).
    */
  def nodeInfo(t: Ingested, otNodeId: String, includeLineage: Boolean = false): DataFrame = {
    val base = t.nodes.filter(col("ot_node_id") === otNodeId)
      .select(col("node_id"), col("ot_node_id"), col("name"), col("unique_name"),
        col("tax_uid"), col("tax_rank"), col("tax_sources"),
        col("tip_descendants").as("num_tips"),
        col("supported_by"), col("terminal"), col("partial_path_of"),
        col("resolves"), col("conflicts_with"), col("resolved_by"))
    if (!includeLineage) base.drop("node_id")
    else {
      // lineage: proper ancestors, nearest first
      val lin = TreeOps.lineageWhere(t.nodes, col("ot_node_id") === otNodeId)
        .filter(col("ancestor_id") =!= col("node_id"))
        .join(t.nodes.select(col("node_id").as("ancestor_id"),
          col("ot_node_id").as("anc_ot_id")), "ancestor_id")
        .groupBy(col("node_id"))
        .agg(reverse(array_sort(collect_list(
          struct(col("ancestor_depth"), col("anc_ot_id"))))).as("lin_structs"))
        .select(col("node_id"),
          transform(col("lin_structs"), x => x("anc_ot_id")).as("lineage"))
      base.join(lin, Seq("node_id"), "left_outer").drop("node_id")
    }
  }

  /** Supporting studies for a result subtree (A6, GraphExplorer.java:358-399):
    * distinct annotation sources over the subtree's nodes, resolved to
    * study ids through the source map (J5).
    */
  def supportingStudies(t: Ingested, rootId: Long, maxDepth: Int = -1): DataFrame = {
    val sub = TreeOps.subtree(t.nodes, rootId, maxDepth)
    sub.select(explode(map_keys(coalesce(col("supported_by"),
        map().cast("map<string,string>")))).as("source_id"))
      .distinct()
      .join(broadcast(t.sourceMap), Seq("source_id"), "left_outer")
      .select(col("source_id"), col("study_id"), col("git_sha"))
  }

  /** Arguson subtree document (S6, GraphExplorer.java:342-354): nested JSON
    * with children[] ordered in tree order and a lineage[] on the root.
    * Driver-side assembly under the 25k-tip cap, mirroring the newick path.
    */
  def arguson(t: Ingested, rootId: Long, heightLimit: Int = 5): String = {
    val tips = TreeOps.subtreeTipCount(t.nodes, rootId, heightLimit)
    require(tips <= TreeOps.MaxTipsArguson,
      s"requested tree ($tips tips) is larger than currently allowed (${TreeOps.MaxTipsArguson})")
    val rows = TreeOps.subtree(t.nodes, rootId, heightLimit)
      .select(col("node_id"), col("parent_id"), col("pre"), col("ot_node_id"),
        col("name"), col("unique_name"), col("tax_rank"), col("tax_uid"),
        col("tip_descendants"))
      .collect()

    val byParent = rows.filter(_.getLong(0) != rootId)
      .groupBy(_.getLong(1)).map { case (k, v) => k -> v.sortBy(_.getLong(2)) }
    val byId = rows.map(r => r.getLong(0) -> r).toMap

    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
                  case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString }

    def blob(r: Row, sb: StringBuilder): Unit = {
      sb ++= "{\"node_id\":\"" ++= esc(r.getString(3)) ++= "\""
      sb ++= ",\"num_tips\":" ++= r.getLong(8).toString
      if (!r.isNullAt(4)) {
        sb ++= ",\"taxon\":{\"name\":\"" ++= esc(r.getString(4)) ++= "\""
        sb ++= ",\"unique_name\":\"" ++= esc(Option(r.getString(5)).getOrElse(r.getString(4))) ++= "\""
        if (!r.isNullAt(6)) sb ++= ",\"rank\":\"" ++= esc(r.getString(6)) ++= "\""
        if (!r.isNullAt(7)) sb ++= ",\"ott_id\":" ++= r.getLong(7).toString
        sb += '}'
      }
    }

    // iterative nested assembly (children in pre order)
    val sb = new StringBuilder
    def build(id: Long): Unit = {
      var stack = List((id, 0))
      while (stack.nonEmpty) {
        val (nid, ci) = stack.head
        val kids = byParent.getOrElse(nid, Array.empty[Row])
        if (ci == 0) blob(byId(nid), sb)
        if (ci < kids.length) {
          sb ++= (if (ci == 0) ",\"children\":[" else ",")
          stack = (kids(ci).getLong(0), 0) :: (nid, ci + 1) :: stack.tail
        } else {
          if (kids.nonEmpty) sb += ']'
          sb += '}'
          stack = stack.tail
        }
      }
    }
    build(rootId)

    // lineage of the root, nearest first (arguson includes it)
    val linIds = t.nodes.filter(col("node_id") === rootId)
      .select(col("ancestors")).head().getSeq[Long](0).dropRight(1).reverse
    val linRows = t.nodes.filter(col("node_id").isin(linIds: _*))
      .select(col("node_id"), col("parent_id"), col("pre"), col("ot_node_id"),
        col("name"), col("unique_name"), col("tax_rank"), col("tax_uid"),
        col("tip_descendants"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val linSb = new StringBuilder
    linIds.foreach { id =>
      if (linSb.nonEmpty) linSb += ','
      blob(linRows(id), linSb); linSb += '}'
    }
    val body = sb.result()
    // splice lineage into the root object (before its closing content)
    "{\"arguson\":" + body.patch(body.length - 1,
      ",\"lineage\":[" + linSb.result() + "]}", 1) + "}"
  }
}

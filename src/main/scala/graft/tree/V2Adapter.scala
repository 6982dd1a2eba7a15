package graft.tree

import org.apache.spark.sql.functions._
import graft.functions.MrcaIdCodec
import graft.tree.TreeIngest.Ingested

/** v2 compatibility adapter (SURVEY §2.2 P10 + §3 "v2 adapters";
  * capability reference /root/reference/src/main/java/opentree/plugins/
  * tree_of_life.java:151-262,385-422): v2 speaks numeric node ids —
  * `ott<N>` ⇄ N and `mrcaott<a>ott<b>` ⇄ a + 10^7·b — and flat
  * `mrca_*` / `nearest_taxon_mrca_*` field names with ""-defaults and
  * the unique_name==name → "" quirk.
  */
object V2Adapter {

  import MrcaIdCodec.IdLimit

  /** "ott123" → 123; "mrcaott4ott7" → 4 + 10^7·7 (tree_of_life.java:397-414). */
  def otIdToLong(s: String): Long = s match {
    case x if x.startsWith("mrcaott") =>
      val rest = x.substring("mrcaott".length)
      val i = rest.indexOf("ott")
      rest.substring(0, i).toLong + IdLimit * rest.substring(i + 3).toLong
    case x if x.startsWith("ott") => x.substring(3).toLong
    case other => throw new IllegalArgumentException(s"not an ot node id: $other")
  }

  /** Inverse of [[otIdToLong]] (tree_of_life.java:385-394). */
  def longToOtId(l: Long): String =
    if (l < IdLimit) s"ott$l"
    else s"mrcaott${l % IdLimit}ott${l / IdLimit}"

  /** v2 `mrca`: flat map with numeric ids (tree_of_life.java:151-262). */
  def mrca(t: Ingested, nodeIds: Seq[Long] = Nil, ottIds: Seq[Long] = Nil)
      : Map[String, Any] = {
    val v3 = TreeApi.mrca(t, nodeIds.map(longToOtId), ottIds)

    // taxon blobs ride along on the v3 result — no extra job per blob
    def render(b: TreeApi.TaxonBlob): Map[String, Any] =
      Map("name" -> b.name, "rank" -> b.rank, "unique_name" -> b.uniqueName,
        "ott_id" -> b.ottId.map(x => x: Any).orNull)

    val mrcaLong = otIdToLong(v3.mrcaOtId)
    val base = Map[String, Any](
      "mrca_node_id" -> mrcaLong,
      "tree_id" -> t.treeIdStr,
      "node_ids_not_in_tree" -> v3.nodeIdsNotInTree.map(otIdToLong),
      "ott_ids_not_in_tree" -> v3.ottIdsNotInTree,
      "invalid_node_ids" -> Nil,
      "invalid_ott_ids" -> Nil)

    val taxonFields = v3.mrcaTaxon match {
      case Some(bt) =>
        val b = render(bt)
        Map[String, Any]("ott_id" -> b("ott_id"),
          "mrca_name" -> b("name"), "mrca_rank" -> Option(b("rank")).getOrElse(""),
          // unique_name identical to name renders "" (tree_of_life.java:240-244)
          "mrca_unique_name" ->
            (if (b("unique_name") == b("name")) "" else b("unique_name")))
      case None =>
        Map[String, Any]("ott_id" -> "null", "mrca_name" -> "",
          "mrca_rank" -> "", "mrca_unique_name" -> "")
    }

    val nb = render(v3.nearestTaxon
      .getOrElse(TreeApi.TaxonBlob(null, null, null, None)))
    val nearestFields = Map[String, Any](
      "nearest_taxon_mrca_ott_id" -> nb("ott_id"),
      "nearest_taxon_mrca_name" -> nb("name"),
      "nearest_taxon_mrca_rank" -> Option(nb("rank")).getOrElse(""),
      "nearest_taxon_mrca_unique_name" -> nb("unique_name"),
      "nearest_taxon_mrca_node_id" -> nb("ott_id"))

    base ++ taxonFields ++ nearestFields
  }

  /** v2 `induced_subtree`: numeric-id request, newick + long not-in-tree
    * lists (tree_of_life.java:274-333).
    */
  def inducedSubtree(t: Ingested, nodeIds: Seq[Long] = Nil,
      ottIds: Seq[Long] = Nil): Map[String, Any] = {
    val v3 = TreeApi.inducedSubtree(t, nodeIds.map(longToOtId), ottIds,
      idsForUnnamed = true)
    Map("newick" -> v3.newick,
      "node_ids_not_in_tree" -> v3.nodeIdsNotInTree.map(otIdToLong),
      "ott_ids_not_in_tree" -> v3.ottIdsNotInTree)
  }

  /** v2 `about` (tree_of_life.java:50-138): field renames of the v3 blob —
    * `date`, root fields hoisted flat, numeric root_node_id — plus
    * `study_list` (default true, the v3 source_list resolved through
    * source_id_map in source order).
    */
  def about(t: Ingested, studyList: Boolean = true): Map[String, Any] = {
    val m = TreeApi.about(t).head()
    val base = Map[String, Any](
      "date" -> m.getAs[String]("date_completed"),
      "num_tips" -> m.getAs[Long]("root_num_tips"),
      "num_source_studies" -> m.getAs[Long]("num_source_studies"),
      "taxonomy_version" -> m.getAs[String]("taxonomy_version"),
      "root_node_id" -> otIdToLong(m.getAs[String]("root_ot_node_id")),
      "tree_id" -> t.treeIdStr) ++
      (Option(m.getAs[String]("root_name")) match {
        case Some(nm) => Map[String, Any]("root_taxon_name" -> nm,
          "root_ott_id" -> m.getAs[Long]("root_tax_uid"))
        case None => Map.empty[String, Any]
      })
    if (!studyList) base
    else {
      // annotations without a $.sources field ingest as a null column —
      // treat like the other optional meta fields, not an NPE
      val order = Option(m.getAs[scala.collection.Seq[String]]("sources"))
        .getOrElse(scala.collection.Seq.empty[String])
      base + ("study_list" ->
        order.map(s => t.sourceBlobs.getOrElse(s, Map.empty[String, String]))
          .toList)
    }
  }

  /** v2 `graph/node_info` (plugins/graph.java:45-195): numeric ids, flat
    * taxon fields with `tax_source` as the re-joined "src:id,…" string,
    * `synth_sources`/`tree_sources` blobs from the supported_by +
    * partial_path_of keys, and `draft_tree_lineage` taxonlike blobs with
    * ""-defaults for unnamed nodes. Two jobs: the node row (with its root
    * path), then one fetch for the lineage attributes.
    */
  def nodeInfo(t: Ingested, nodeId: Option[Long] = None,
      ottId: Option[Long] = None, includeLineage: Boolean = false)
      : Map[String, Any] = {
    require(nodeId.isDefined ^ ottId.isDefined,
      "must provide exactly one of node_id or ott_id")
    val pred = nodeId.map(id => col("ot_node_id") === longToOtId(id))
      .getOrElse(col("tax_uid") === ottId.get)
    val hit = t.nodes.filter(pred)
      .select(col("ot_node_id"), col("tip_descendants"), col("name"),
        col("tax_rank"), col("tax_uid"), col("tax_sources"),
        col("supported_by"), col("partial_path_of"), col("ancestors"),
        col("node_id"))
      .collect()
    require(hit.nonEmpty, "node not found in the synthetic tree")
    val r = hit(0)
    def mapKeys(i: Int): Seq[String] =
      if (r.isNullAt(i)) Nil else r.getMap[String, Any](i).keys.toSeq

    // a source may legally appear in BOTH supported_by and
    // partial_path_of — emit each blob once (the reference's
    // unique-sources aggregation, plugins/graph.java)
    val sources = (mapKeys(6) ++ mapKeys(7)).distinct
      .map(sid => t.sourceBlobs.getOrElse(sid, Map.empty[String, String]))
    val base = Map[String, Any](
      "node_id" -> otIdToLong(r.getString(0)),
      "num_tips" -> r.getLong(1),
      "num_synth_tips" -> r.getLong(1),
      "in_synth_tree" -> true,
      "tree_id" -> t.treeIdStr,
      "synth_sources" -> sources,
      "tree_sources" -> sources)
    val taxonFields =
      if (r.isNullAt(2)) Map.empty[String, Any]
      else Map[String, Any]("name" -> r.getString(2),
        "rank" -> Option(r.getString(3)).getOrElse(""),
        "ott_id" -> (if (r.isNullAt(4)) "null" else r.getLong(4)),
        "tax_source" -> (if (r.isNullAt(5)) ""
          else r.getMap[String, String](5)
            .map { case (k, v) => s"$k:$v" }.mkString(",")))

    val lineageFields =
      if (!includeLineage) Map.empty[String, Any]
      else {
        val ancIds = r.getSeq[Long](8).dropRight(1)
        val rows = t.nodes.filter(col("node_id").isin(ancIds: _*))
          .select(col("node_id"), col("ot_node_id"), col("name"),
            col("tax_rank"), col("unique_name"), col("tax_uid"), col("depth"))
          .collect().sortBy(-_.getLong(6)) // nearest first
        val blobs = rows.map { a =>
          val named = !a.isNullAt(2)
          Map[String, Any](
            "node_id" -> otIdToLong(a.getString(1)),
            "name" -> (if (named) a.getString(2) else ""),
            "rank" -> (if (named) Option(a.getString(3)).getOrElse("") else ""),
            "unique_name" -> (if (named) a.getString(4) else ""),
            "ott_id" -> (if (a.isNullAt(5)) "null" else a.getLong(5)))
        }.toList
        Map[String, Any]("draft_tree_lineage" -> blobs)
      }
    base ++ taxonFields ++ lineageFields
  }

  /** v2 `subtree` (tree_of_life.java:336-383): exactly one of node_id /
    * ott_id; v3 doSubtree with name_and_id labels, unnamed nodes
    * unlabeled, no depth limit; out = newick + tree_id.
    */
  def subtree(t: Ingested, nodeId: Option[Long] = None,
      ottId: Option[Long] = None): Map[String, Any] = {
    require(nodeId.isDefined ^ ottId.isDefined,
      "must provide exactly one of node_id or ott_id")
    val pred = nodeId.map(id => col("ot_node_id") === longToOtId(id))
      .getOrElse(col("tax_uid") === ottId.get)
    val hit = t.nodes.filter(pred)
      .select(col("node_id"), col("tip_descendants"), col("pre"),
        col("post"), col("depth")).collect()
    require(hit.nonEmpty, s"node not found in the synthetic tree")
    val r = hit(0)
    val nwk = TreeOps.newick(t.nodes, r.getLong(0), maxDepth = -1,
      labelFormat = "name_and_id", idsForUnnamed = false,
      knownTips = Some(r.getLong(1)),
      rootBounds = Some((r.getLong(2), r.getLong(3), r.getLong(4))))
    Map("newick" -> nwk, "tree_id" -> t.treeIdStr)
  }
}

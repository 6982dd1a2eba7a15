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

    def blob(otId: String): Map[String, Any] = {
      val r = t.nodes.filter(col("ot_node_id") === otId)
        .select(col("name"), col("tax_rank"), col("unique_name"), col("tax_uid"))
        .head()
      Map("name" -> r.getString(0), "rank" -> r.getString(1),
        "unique_name" -> r.getString(2),
        "ott_id" -> (if (r.isNullAt(3)) null else r.getLong(3)))
    }

    val mrcaLong = otIdToLong(v3.mrcaOtId)
    val base = Map[String, Any](
      "mrca_node_id" -> mrcaLong,
      "tree_id" -> t.treeMeta.select(col("tree_id")).head().getString(0),
      "node_ids_not_in_tree" -> v3.nodeIdsNotInTree.map(otIdToLong),
      "ott_ids_not_in_tree" -> v3.ottIdsNotInTree,
      "invalid_node_ids" -> Nil,
      "invalid_ott_ids" -> Nil)

    val taxonFields = v3.mrcaName match {
      case Some(_) =>
        val b = blob(v3.mrcaOtId)
        Map[String, Any]("ott_id" -> b("ott_id"),
          "mrca_name" -> b("name"), "mrca_rank" -> Option(b("rank")).getOrElse(""),
          // unique_name identical to name renders "" (tree_of_life.java:240-244)
          "mrca_unique_name" ->
            (if (b("unique_name") == b("name")) "" else b("unique_name")))
      case None =>
        Map[String, Any]("ott_id" -> "null", "mrca_name" -> "",
          "mrca_rank" -> "", "mrca_unique_name" -> "")
    }

    val nearestOt = v3.nearestTaxonOtId.getOrElse(v3.mrcaOtId)
    val nb = blob(nearestOt)
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
}

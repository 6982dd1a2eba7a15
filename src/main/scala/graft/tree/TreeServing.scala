package graft.tree

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.tree.TreeIngest.Ingested

/** Millisecond point-query serving — the analog of the reference's Lucene
  * exact indexes (GraphBase.java:122-186,431-448): `node_info` / `mrca`
  * resolution for single ids answers from a driver-side hash index with
  * ZERO Spark jobs, instead of paying the ~0.1-0.35 s job-scheduling
  * floor per action. SURVEY §7.5 names exactly this mitigation.
  *
  * The index holds one row per node over the SERVING columns only
  * (ids, taxon fields, interval labels, ancestors, annotation maps) —
  * O(nodes × serving width) driver memory, the same order as the
  * reference's Lucene index files, which it likewise holds beside the
  * graph DB. Build pays ONE collect of the nodes table; every lookup
  * after that is a hash probe. Batch/scan requests (subtree exports,
  * induced over big sets, analytics) stay on the distributed path — the
  * index is the point-query fast path, not a replacement engine.
  */
object TreeServing {

  // field order of the one serving projection (see build())
  private val Cols = Seq("node_id", "ot_node_id", "name", "unique_name",
    "tax_uid", "tax_rank", "tax_sources", "tip_descendants", "depth",
    "pre", "post", "ancestors", "supported_by", "terminal",
    "partial_path_of", "resolves", "conflicts_with", "resolved_by",
    "parent_id")
  private val INodeId = 0; private val IOt = 1; private val IName = 2
  private val IUniq = 3; private val IUid = 4; private val IRank = 5
  private val ITipDesc = 7; private val IDepth = 8
  private val IPre = 9; private val IPost = 10; private val IAnc = 11
  private val IAnnFirst = 12 // supported_by .. resolved_by (6 fields)

  /** The released node_info annotation fields, in blob order. */
  private val AnnFields = Seq("supported_by", "terminal", "partial_path_of",
    "resolves", "conflicts_with", "resolved_by")

  final class Index private[tree] (
      rows: Array[Row],
      byOt: java.util.HashMap[String, Int],
      byUid: java.util.HashMap[Long, Int],
      byId: java.util.HashMap[Long, Int]) {

    def size: Int = rows.length

    private def rowAt(m: java.util.HashMap[_, Int], k: Any): Option[Row] = {
      val i = m.asInstanceOf[java.util.HashMap[Any, Int]].getOrDefault(k, -1)
      if (i < 0) None else Some(rows(i))
    }
    def byOtId(ot: String): Option[Row] = rowAt(byOt, ot)
    def byOttId(uid: Long): Option[Row] = rowAt(byUid, uid)
    def byNodeId(id: Long): Option[Row] = rowAt(byId, id)

    /** (pre, post, depth, tip_descendants) of a node — lets the newick /
      * arguson paths skip their size-guard and root-resolution jobs
      * (TreeOps.newick's knownTips/rootBounds fast-path parameters).
      */
    def bounds(ot: String): Option[(Long, Long, Long, Long)] =
      byOtId(ot).map(r => (r.getLong(IPre), r.getLong(IPost),
        r.getLong(IDepth), r.getLong(ITipDesc)))

    /** (pre, post) by node id — the resolver
      * [[graft.plans.IntervalCatalog.installFrom]] plugs into the
      * descendant-predicate rewrite, so a loaded serving index doubles
      * as the optimizer's anchor table at zero extra driver memory.
      */
    def interval(id: Long): Option[(Long, Long)] =
      byNodeId(id).map(r => (r.getLong(IPre), r.getLong(IPost)))

    // field-for-field the blobOf of TreeApi.mrca (raw column values; the
    // ingest-time J3 rule already falls unique_name back to name)
    private def taxonOf(r: Row): Option[TreeApi.TaxonBlob] =
      Some(TreeApi.TaxonBlob(r.getString(IName), r.getString(IRank),
        r.getString(IUniq),
        if (r.isNullAt(IUid)) None else Some(r.getLong(IUid))))

    /** `node_info` (tree_of_life_v3.java:130-227) as a field map — the
      * exact column set of [[TreeApi.nodeInfo]], no Spark job. Lineage
      * (proper ancestors, nearest first) walks the stored ancestors
      * array through the id index.
      */
    def nodeInfo(otNodeId: String,
        includeLineage: Boolean = false): Option[Map[String, Any]] =
      byOtId(otNodeId).map { r =>
        val base = Map[String, Any](
          "ot_node_id" -> r.getString(IOt),
          "name" -> r.get(IName), "unique_name" -> r.get(IUniq),
          "tax_uid" -> r.get(IUid), "tax_rank" -> r.get(IRank),
          "tax_sources" -> r.get(6), "num_tips" -> r.getLong(ITipDesc)) ++
          AnnFields.zipWithIndex.map { case (f, i) => f -> r.get(IAnnFirst + i) }
        if (!includeLineage) base
        else base + ("lineage" ->
          r.getSeq[Long](IAnc).dropRight(1).reverse
            .flatMap(byNodeId).map(_.getString(IOt)))
      }

    /** `mrca` (tree_of_life_v3.java:258-363) with the same semantics and
      * result type as [[TreeApi.mrca]], entirely on the index: resolve
      * both id spaces, take the last element of the ancestor arrays'
      * common prefix, pull the root-path attributes from the hash maps.
      */
    def mrca(nodeIds: Seq[String] = Nil, ottIds: Seq[Long] = Nil)
        : TreeApi.MrcaResult = {
      val hits = nodeIds.flatMap(byOtId) ++ ottIds.flatMap(byOttId)
      val found = hits.map(r => r.getLong(INodeId) -> r).distinctBy(_._1)
      require(found.nonEmpty, "no valid node or ott ids provided")
      val badNodes = nodeIds.filterNot(byOt.containsKey)
      val badOtts = ottIds.filterNot(byUid.containsKey(_))
      val common = found.map(_._2.getSeq[Long](IAnc).toSeq).reduce { (a, b) =>
        a.zip(b).takeWhile { case (x, y) => x == y }.map(_._1)
      }
      require(common.nonEmpty, "query nodes do not share a root (different trees?)")
      val mrcaRow = byNodeId(common.last).get
      val nearestRow = common.flatMap(byNodeId).filter(!_.isNullAt(IUid))
        .sortBy(-_.getLong(IDepth)).headOption
      val mName = Option(mrcaRow.getString(IName))
      TreeApi.MrcaResult(
        mrcaRow.getString(IOt), mName,
        if (mName.isEmpty) nearestRow.map(_.getString(IOt)) else None,
        badNodes, badOtts, ok = badNodes.isEmpty && badOtts.isEmpty,
        mrcaTaxon = if (mName.isDefined) taxonOf(mrcaRow) else None,
        nearestTaxon = nearestRow.flatMap(taxonOf))
    }
  }

  /** Build the serving index: ONE collect of the serving projection.
    * Call it once per loaded store (the reference builds its Lucene
    * index once at ingest) and serve point queries from the result.
    */
  def build(t: Ingested): Index = build(t.nodes)

  def build(nodes: org.apache.spark.sql.DataFrame): Index = {
    val rows = nodes.select(Cols.map(col): _*).collect()
    val byOt = new java.util.HashMap[String, Int](rows.length * 2)
    val byUid = new java.util.HashMap[Long, Int](rows.length * 2)
    val byId = new java.util.HashMap[Long, Int](rows.length * 2)
    var i = 0
    while (i < rows.length) {
      val r = rows(i)
      byId.put(r.getLong(INodeId), i)
      if (!r.isNullAt(IOt)) byOt.put(r.getString(IOt), i)
      if (!r.isNullAt(IUid)) byUid.put(r.getLong(IUid), i)
      i += 1
    }
    new Index(rows, byOt, byUid, byId)
  }
}

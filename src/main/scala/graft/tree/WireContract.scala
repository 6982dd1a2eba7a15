package graft.tree

import graft.tree.TreeApi.{InducedResult, MrcaResult}

/** Wire-contract reshaping for partial-invalid requests (capability
  * reference /root/reference/src/main/java/opentree/plugins/
  * BadIdsException.java:9-51 and tree_of_life_v3.java:359-361): the
  * reference computes the full result from the valid ids, then throws an
  * HTTP-400 exception that CARRIES the computed payload and formats a
  * message listing the unmatched ids. The engine layer ([[TreeApi]])
  * returns `ok=false` results; this adapter maps them to the
  * (status, message, body) triple an HTTP layer would serialize.
  */
object WireContract {

  /** Exact message grammar of BadIdsException.multipleBadNodeIDsError. */
  def badIdsMessage(ottIds: Seq[Long], nodeIds: Seq[String]): String = {
    val sb = new StringBuilder
    if (ottIds.nonEmpty)
      sb ++= ottIds.mkString("The following OTT ids were not found: [", ", ", "]. ")
    if (nodeIds.nonEmpty)
      sb ++= nodeIds.mkString("The following node ids were not found: [", ", ", "]. ")
    sb.result()
  }

  final case class Response(status: Int, message: Option[String],
      body: Map[String, Any])

  def mrcaResponse(r: MrcaResult): Response = {
    val body = Map[String, Any](
      "mrca" -> Map[String, Any]("node_id" -> r.mrcaOtId),
      ) ++
      (if (r.ottIdsNotInTree.nonEmpty)
        Map("ott_ids_not_in_tree" -> r.ottIdsNotInTree) else Map.empty) ++
      (if (r.nodeIdsNotInTree.nonEmpty)
        Map("node_ids_not_in_tree" -> r.nodeIdsNotInTree) else Map.empty) ++
      (r.nearestTaxon match {
        case Some(t) if r.mrcaName.isEmpty =>
          Map("nearest_taxon" -> Map[String, Any]("name" -> t.name,
            "rank" -> t.rank, "unique_name" -> t.uniqueName,
            "ott_id" -> t.ottId.map(x => x: Any).orNull))
        case _ => Map.empty[String, Any]
      })
    if (r.ok) Response(200, None, body)
    else Response(400,
      Some(badIdsMessage(r.ottIdsNotInTree, r.nodeIdsNotInTree)), body)
  }

  /** v2 endpoints do NOT 400 on partially-bad ids: the reference's v2
    * layer predates BadIdsException and simply returns 200 with the
    * unmatched ids listed in `*_not_in_tree` (ws-tests/
    * test_v2_mrca_no_400.py — bogus ott ids 2/3/5 alongside valid ones
    * still expect a 200 blob). A v2 request only fails when NO id
    * resolves at all (the engine has nothing to compute), which the
    * adapter surfaces as the thrown require — mapped here to a bare 400.
    */
  def v2Response(body: => Map[String, Any]): Response =
    try Response(200, None, body)
    catch {
      case e: IllegalArgumentException =>
        Response(400, Some(e.getMessage), Map.empty)
    }

  def inducedResponse(r: InducedResult): Response = {
    val body = Map[String, Any]("newick" -> r.newick) ++
      (if (r.ottIdsNotInTree.nonEmpty)
        Map("ott_ids_not_in_tree" -> r.ottIdsNotInTree) else Map.empty) ++
      (if (r.nodeIdsNotInTree.nonEmpty)
        Map("node_ids_not_in_tree" -> r.nodeIdsNotInTree) else Map.empty)
    if (r.ok) Response(200, None, body)
    else Response(400,
      Some(badIdsMessage(r.ottIdsNotInTree, r.nodeIdsNotInTree)), body)
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.MrcaIdCodec
import graft.ops.Multimodal
import graft.streaming.EventStreams
import graft.tree.{Nexson, TreeApi, TreeIngest, V2Adapter}

/** Extension-surface queries: batch forms of the streaming operators, the
  * custom-Expression id codec, and the multimodal metadata path.
  */
object ExtQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Sessionization (gaps-and-islands batch form; the streaming twin is
    * EventStreams.sessionize via flatMapGroupsWithState).
    */
  val evSessions: Q = (s, d) =>
    EventStreams.sessionizeBatch(Tables.events(s, d))

  /** v2 id codec round-trip through the native Catalyst expressions. */
  val mrcaCodec: Q = (s, d) =>
    Tables.customer(s, d).filter(col("c_custkey") < 100)
      .select(col("c_custkey"),
        MrcaIdCodec.mrca_pack(col("c_custkey"), col("c_custkey") + 1L).as("packed"))
      .select(col("c_custkey"), col("packed"),
        MrcaIdCodec.mrca_unpack_a(col("packed")).as("back_a"),
        MrcaIdCodec.mrca_unpack_b(col("packed")).as("back_b"))

  /** Multimodal metadata through the binary column + mapPartitions stub. */
  val mmMediaMeta: Q = (s, d) =>
    Multimodal.extractMeta(s, Multimodal.withMedia(Tables.documents(s, d))).toDF()

  private val fixtureCache =
    new java.util.concurrent.ConcurrentHashMap[String, TreeIngest.Ingested]()

  /** The Gavia fixture tree (same files the golden tests use), ingested
    * once per JVM — lets the driver's harness exercise the serving-API
    * path end-to-end (rows-only check; endpoint shapes aren't SQL).
    */
  /** Fixture dir, robust to the harness cwd (falls back to the repo's
    * absolute path when not launched from the repo root).
    */
  private def fixtureDir: String = {
    val rel = "src/test/resources/fixture"
    if (new java.io.File(s"$rel/gavia.tre").exists()) rel
    else "/root/repo/src/test/resources/fixture"
  }

  private def fixture(s: SparkSession): TreeIngest.Ingested =
    fixtureCache.computeIfAbsent("gavia", _ => {
      val fx = fixtureDir
      TreeIngest.ingest(s, s"$fx/gavia.tre", s"$fx/gavia_annotations.json",
        s"$fx/gavia_taxonomy.tsv", treeId = "opentree4.1")
    })

  /** `about` endpoint over the fixture tree (no SQL oracle: rows-only). */
  val apiAbout: Q = (s, _) => TreeApi.about(fixture(s))

  /** `node_info` with lineage over the fixture tree (rows-only). */
  val apiNodeInfo: Q = (s, _) =>
    TreeApi.nodeInfo(fixture(s), "ott1085739", includeLineage = true)
      .drop("tax_sources", "supported_by", "terminal", "partial_path_of",
        "resolves", "conflicts_with", "resolved_by") // map cols: parquet-safe but noisy

  /** `mrca` endpoint over the fixture (rows-only): unnamed MRCA with a
    * nearest-taxon walk, plus the bad-id partition flag.
    */
  val apiMrca: Q = (s, _) => {
    import s.implicits._
    val r = TreeApi.mrca(fixture(s),
      nodeIds = Seq("ott1085739", "ott90560", "ottNOPE"))
    Seq((r.mrcaOtId, r.mrcaName.orNull, r.nearestTaxonOtId.orNull,
      r.nodeIdsNotInTree.mkString(","), r.ok))
      .toDF("mrca_ot_id", "mrca_name", "nearest_taxon", "bad_node_ids", "ok")
  }

  /** `induced_subtree` endpoint over the fixture (rows-only). */
  val apiInduced: Q = (s, _) => {
    import s.implicits._
    val r = TreeApi.inducedSubtree(fixture(s),
      nodeIds = Seq("ott1085739", "ott1057518", "ott90560"),
      idsForUnnamed = true)
    Seq((r.newick, r.ok)).toDF("newick", "ok")
  }

  val registry: Map[String, Q] = Map(
    "ev_sessions" -> evSessions,
    "f10_mrca_codec" -> mrcaCodec,
    "mm_media_meta" -> mmMediaMeta,
    "api_about" -> apiAbout,
    "api_node_info" -> apiNodeInfo,
    "api_mrca" -> apiMrca,
    "api_induced" -> apiInduced,
    "s12_nexson" -> ((s, _) =>
      Nexson.readStudy(s, s"$fixtureDir/study.nexson")),
    "api_v2_mrca" -> ((s, _) => {
      import s.implicits._
      val m = V2Adapter.mrca(fixture(s), nodeIds = Seq(1085739L, 90560L))
      Seq((m("mrca_node_id").asInstanceOf[Long],
        m("nearest_taxon_mrca_name").toString,
        m("nearest_taxon_mrca_ott_id").asInstanceOf[Long],
        m("tree_id").toString))
        .toDF("mrca_node_id", "nearest_taxon_mrca_name",
          "nearest_taxon_mrca_ott_id", "tree_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "ev_sessions" ->
      """WITH e AS (SELECT event_id, user_id, value, ts::TIMESTAMP AS t FROM events),
        |x AS (SELECT *, lag(epoch_us(t)) OVER
        |  (PARTITION BY user_id ORDER BY t, event_id) AS prev_us FROM e),
        |y AS (SELECT *, CASE WHEN prev_us IS NULL
        |  OR epoch_us(t) - prev_us > 600000000 THEN 1 ELSE 0 END AS is_new FROM x),
        |z AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY t, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx FROM y)
        |SELECT user_id, strftime(min(t), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM z GROUP BY user_id, session_idx""".stripMargin,
    "f10_mrca_codec" ->
      """SELECT c_custkey,
        |  c_custkey + 10000000 * (c_custkey + 1) AS packed,
        |  (c_custkey + 10000000 * (c_custkey + 1)) % 10000000 AS back_a,
        |  (c_custkey + 10000000 * (c_custkey + 1)) // 10000000 AS back_b
        |FROM customer WHERE c_custkey < 100""".stripMargin,
    "mm_media_meta" ->
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |    ELSE 'video' END AS kind,
        |  octet_length(encode(text)) AS byte_len,
        |  16 * (octet_length(encode(text)) % 64 + 1) AS width,
        |  9 * (octet_length(encode(text)) % 64 + 1) AS height,
        |  CASE WHEN doc_id % 3 = 0 THEN 1
        |    ELSE octet_length(encode(text)) % 1000 END AS n_frames
        |FROM documents""".stripMargin
  )
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.tree._

class TreeApiSpec extends AnyFunSuite {
  import SparkTestSession._

  import GaviaFixture.fx
  lazy val t = TreeIngest.ingest(spark,
    s"$fx/gavia.tre", s"$fx/gavia_annotations.json", s"$fx/gavia_taxonomy.tsv",
    treeId = "opentree4.1")

  def idOf(ot: String): Long = GaviaFixture.idOf(t, ot)

  test("about: tree metadata + root blob") {
    val a = TreeApi.about(t).head()
    assert(a.getAs[String]("tree_id") == "opentree4.1")
    assert(a.getAs[String]("root_ot_node_id") == "ott803675")
    assert(a.getAs[String]("root_name") == "Gavia")
    assert(a.getAs[Long]("root_num_tips") == 5L)
  }

  test("node_info: taxon blob, num_tips, lineage nearest-first") {
    val ni = TreeApi.nodeInfo(t, "ott1085739", includeLineage = true).head()
    assert(ni.getAs[String]("name") == "Gavia arctica")
    assert(ni.getAs[Long]("num_tips") == 1L)
    assert(ni.getAs[scala.collection.Seq[String]]("lineage").toList ==
      List("mrcaott651474ott1085739", "mrcaott90560ott651474", "ott803675"))
    // unnamed node still has num_tips + annotations
    val mrca = TreeApi.nodeInfo(t, "mrcaott90560ott1057518").head()
    assert(mrca.getAs[Long]("num_tips") == 2L)
    assert(mrca.isNullAt(mrca.fieldIndex("name")))
    // the root has no proper ancestors: lineage is the reference's empty
    // list, never a null the JSON layer would render as null/NPE
    val root = TreeApi.nodeInfo(t, "ott803675", includeLineage = true).head()
    assert(root.getAs[scala.collection.Seq[String]]("lineage").isEmpty)
  }

  test("supporting studies resolve through the source map") {
    val st = TreeApi.supportingStudies(t, idOf("ott803675")).collect()
    val bySrc = st.map(r => r.getString(0) -> r.getString(1)).toMap
    // the study RESOLVES (value checked, not just key presence)
    assert(bySrc.get("pg_01@tree1").contains("pg_01"), bySrc.toString)
    // the taxonomy source has no study: present with a null study_id
    assert(bySrc.contains("ott2.9draft12") && bySrc("ott2.9draft12") == null)
  }

  test("arguson: nested doc with children in tree order and lineage") {
    val j = TreeApi.arguson(t, idOf("mrcaott90560ott651474"), heightLimit = 2)
    assert(j.startsWith("{\"arguson\":{"))
    assert(j.contains("\"node_id\":\"mrcaott90560ott651474\""))
    assert(j.contains("\"children\":["))
    assert(j.contains("\"lineage\":[{\"node_id\":\"ott803675\""))
    assert(j.contains("\"taxon\":{\"name\":\"Gavia immer\""))
    // parses as JSON (use Spark's parser as a neutral check)
    import spark.implicits._
    val parsed = spark.read.json(Seq(j).toDS())
    assert(parsed.columns.contains("arguson"))
  }

  test("arguson height limit bounds the document") {
    val shallow = TreeApi.arguson(t, idOf("ott803675"), heightLimit = 1)
    assert(!shallow.contains("Gavia immer")) // depth-2 tip not included
    assert(shallow.contains("mrcaott90560ott651474"))
  }

  test("edge dump resolves names on both sides") {
    val dump = TreeExports.edgeDump(t.nodes, t.edges).collect()
    assert(dump.length == 8)
    assert(dump.exists(r => r.getAs[String]("src_id") == "ott1057044" &&
      r.getAs[String]("dst_id") == "ott803675"))
  }

  test("dot export") {
    val d = TreeExports.dot(t.nodes, idOf("ott803675"))
    assert(d.startsWith("digraph synth {"))
    assert(d.contains("label=\"ott1057044\""))
    assert(d.linesIterator.count(_.contains("->")) == 8)
  }

  test("graphml export: one node element per subtree node, one edge per child") {
    val x = TreeExports.graphml(t.nodes, idOf("ott803675"))
    assert(x.startsWith("""<?xml version="1.0""""))
    assert(x.linesIterator.count(_.trim.startsWith("<node ")) == 9)
    assert(x.linesIterator.count(_.trim.startsWith("<edge ")) == 8)
    assert(x.contains("""<node id="ott1057044"><data key="d0">Gavia stellata</data></node>"""))
    assert(x.contains("""target="ott803675""""))
    assert(x.endsWith("</graphml>\n"))
  }

  test("effective parents is 1.0 on a tree") {
    val ep = TreeExports.effectiveParents(t.edges).collect()
    assert(ep.nonEmpty)
    assert(ep.forall(_.getAs[Double]("effective_parents") == 1.0))
  }

  test("mrp matrix long form") {
    val m = TreeExports.mrpMatrix(t.nodes)
    // ALL 5 tips present (sum==total and >=1 alone are tautologies a
    // zero-row or tip-dropping matrix would satisfy)
    val cnt = m.groupBy("tip_id").count().collect().map(_.getLong(1))
    assert(cnt.length == 5, s"expected 5 tips, got ${cnt.length}")
    assert(m.count() == cnt.sum && cnt.forall(c => c >= 1 && c <= 3))
  }

  test("mrca endpoint: named mrca, nearest taxon for unnamed, bad-id partition") {
    // two tips under an unnamed mrca → nearest taxon is the genus
    val m1 = TreeApi.mrca(t, nodeIds = Seq("ott1085739", "ott90560"))
    assert(m1.mrcaOtId == "mrcaott90560ott651474")
    assert(m1.mrcaName.isEmpty && m1.nearestTaxonOtId.contains("ott803675"))
    assert(m1.ok)
    // ott_ids resolve through tax_uid; invalid ids are partitioned, ok=false
    val m2 = TreeApi.mrca(t, nodeIds = Seq("ott1057044", "ottDOESNOTEXIST"),
      ottIds = Seq(90560L, 424242L))
    assert(m2.mrcaOtId == "ott803675" && m2.mrcaName.contains("Gavia"))
    assert(m2.nodeIdsNotInTree == Seq("ottDOESNOTEXIST"))
    assert(m2.ottIdsNotInTree == Seq(424242L))
    assert(!m2.ok)
  }

  test("induced_subtree endpoint: newick + not-in-tree lists; <2 valid rejects") {
    val r = TreeApi.inducedSubtree(t,
      nodeIds = Seq("ott1085739", "ott1057518", "ott90560", "ottNOPE"),
      idsForUnnamed = true)
    assert(r.newick == "(Gavia_arctica_ott1085739,(Gavia_immer_ott1057518," +
      "Gavia_adamsii_ott90560)mrcaott90560ott1057518)mrcaott90560ott651474;")
    assert(r.nodeIdsNotInTree == Seq("ottNOPE") && !r.ok)
    intercept[IllegalArgumentException] {
      TreeApi.inducedSubtree(t, nodeIds = Seq("ott1085739"))
    }
  }

  test("newick with branch lengths uses ingested lengths and epsilon rule") {
    val fx2 = java.nio.file.Files.createTempDirectory("blfix")
    java.nio.file.Files.writeString(fx2.resolve("t.tre"),
      "(ott1057044:0.5,(ott1085739:0,ott651474:2.5)mrcaott651474ott1085739:1)ott803675;")
    val ing = TreeIngest.ingestParsed(spark,
      Newick.parse(java.nio.file.Files.readString(fx2.resolve("t.tre"))),
      s"$fx/gavia_annotations.json", s"$fx/gavia_taxonomy.tsv", "opentree4.1")
    val rootId = ing.nodes.filter(col("parent_id") === -1L)
      .select("node_id").head().getLong(0)
    val nwk = TreeOps.newick(ing.nodes, rootId, labelFormat = "id",
      idsForUnnamed = true, withBranchLengths = true)
    assert(nwk == "(ott1057044:0.5,(ott1085739:1.0E-22,ott651474:2.5)" +
      "mrcaott651474ott1085739:1.0)ott803675;")
  }

  test("v2 adapter: id codec and flat mrca/induced reshaping") {
    import graft.tree.V2Adapter
    assert(V2Adapter.otIdToLong("ott803675") == 803675L)
    assert(V2Adapter.otIdToLong("mrcaott90560ott651474") ==
      90560L + 10000000L * 651474L)
    assert(V2Adapter.longToOtId(90560L + 10000000L * 651474L) ==
      "mrcaott90560ott651474")
    assert(V2Adapter.longToOtId(803675L) == "ott803675")

    val m = V2Adapter.mrca(t, nodeIds = Seq(1085739L, 90560L))
    assert(m("mrca_node_id") == 90560L + 10000000L * 651474L)
    assert(m("mrca_name") == "" && m("ott_id") == "null") // unnamed mrca
    assert(m("nearest_taxon_mrca_name") == "Gavia")
    assert(m("nearest_taxon_mrca_ott_id") == 803675L)
    assert(m("tree_id") == "opentree4.1")

    val m2 = V2Adapter.mrca(t, ottIds = Seq(1057044L, 803675L))
    assert(m2("mrca_name") == "Gavia")
    assert(m2("mrca_unique_name") == "") // unique_name == name quirk

    val ind = V2Adapter.inducedSubtree(t,
      nodeIds = Seq(1085739L, 1057518L, 90560L))
    assert(ind("newick").toString.startsWith("(Gavia_arctica_ott1085739"))
  }

  test("nexson study reads relationally and converts to newick") {
    val study = Nexson.readStudy(spark, s"$fx/study.nexson")
    assert(study.count() == 4)
    val row = study.filter(col("child") === "n3").head()
    assert(row.getAs[String]("label") == "Gavia arctica")
    assert(row.getAs[Long]("ott_id") == 1085739L)
    val nwk = Nexson.toNewick(spark, study, "tree1")
    assert(nwk == "(Gavia_stellata,(Gavia_arctica,Gavia_immer));")
    val nwkBl = Nexson.toNewick(spark, study, "tree1", withBranchLengths = true)
    assert(nwkBl == s"(Gavia_stellata:0.7,(Gavia_arctica:${Newick.MinBranchLength}," +
      "Gavia_immer:1.25):0.2);")
    intercept[IllegalArgumentException] {
      Nexson.toNewick(spark, study, "treeNOPE")
    }
  }

  test("nexson root otu label survives toNewick") {
    // the root appears only as an edge SOURCE, so its label must ride the
    // parent side of the otu resolution (NexsonReader labels every node)
    val json =
      """{"nexml": {"otus": {"otu": [
        |  {"@id":"o1","@label":"tipA","meta":[{"@property":"ot:ottId","$":1}]},
        |  {"@id":"o2","@label":"tipB","meta":[{"@property":"ot:ottId","$":2}]},
        |  {"@id":"oR","@label":"Root taxon","meta":[{"@property":"ot:ottId","$":9}]}]},
        |"trees":{"tree":[{"@id":"t1","node":[
        |  {"@id":"n0","@otu":"oR","@root":"true"},
        |  {"@id":"n1","@otu":"o1"},{"@id":"n2","@otu":"o2"}],
        |"edge":[{"@id":"e1","@source":"n0","@target":"n1","@length":1.0},
        |  {"@id":"e2","@source":"n0","@target":"n2","@length":2.0}]}]}}}"""
        .stripMargin
    val f = java.nio.file.Files.createTempFile("graft_nexson_root", ".json")
    java.nio.file.Files.writeString(f, json)
    val study = Nexson.readStudy(spark, f.toString)
    assert(Nexson.toNewick(spark, study, "t1") == "(tipA,tipB)Root_taxon;")
  }

  test("arguson carries annotations, descendant names, and source_id_map") {
    val j = TreeApi.arguson(t, idOf("mrcaott90560ott651474"), heightLimit = 2)
    // unnamed nodes carry descendant_name_list instead of a taxon blob
    assert(j.contains("\"descendant_name_list\":[\"Gavia arctica\",\"Gavia adamsii\"]"))
    // released annotation fields spliced per node (ws-tests/check.py:213-232)
    assert(j.contains("\"supported_by\":{\"pg_01@tree1\":\"node2\"}"))
    assert(j.contains("\"conflicts_with\":{\"pg_02@tree9\":[\"node77\",\"node78\"]}"))
    // document-level source map resolves EVERY source seen in a blob —
    // both sources referenced by the node annotations above must appear
    assert(j.contains("\"source_id_map\":{"))
    assert(j.contains("\"pg_01@tree1\":"), j.take(400))
    assert(j.contains("\"pg_02@tree9\":"), j.take(400))
    // taxonomy-injected support source on the lineage root
    assert(j.contains("\"ott2.9draft12\""))
    import spark.implicits._
    val parsed = spark.read.json(Seq(j).toDS())
    assert(parsed.columns.contains("arguson"))
  }

  test("v2 about: flat renames, numeric root id, study_list in source order") {
    val a = V2Adapter.about(t)
    assert(a("date") == "2026-01-01")
    assert(a("num_tips") == 5L)
    assert(a("num_source_studies") == 2L)
    assert(a("taxonomy_version") == "2.9draft12")
    assert(a("root_node_id") == 803675L)
    assert(a("root_ott_id") == 803675L)
    assert(a("root_taxon_name") == "Gavia")
    assert(a("tree_id") == "opentree4.1")
    val sl = a("study_list").asInstanceOf[List[Map[String, String]]]
    assert(sl == List(
      Map("git_sha" -> "abc123", "tree_id" -> "tree1", "study_id" -> "pg_01"),
      Map("taxonomy" -> "ott2.9draft12")))
    assert(!V2Adapter.about(t, studyList = false).contains("study_list"))
  }

  test("v2 graph/node_info: numeric ids, tax_source string, lineage blobs") {
    // named node by ott_id
    val ni = V2Adapter.nodeInfo(t, ottId = Some(803675L))
    assert(ni("node_id") == 803675L)
    assert(ni("num_tips") == 5L && ni("num_synth_tips") == 5L)
    assert(ni("in_synth_tree") == true)
    assert(ni("name") == "Gavia" && ni("ott_id") == 803675L)
    assert(ni("tax_source") == "ncbi:37040,gbif:2481962")
    assert(ni("tree_id") == "opentree4.1")
    val srcs = ni("synth_sources").asInstanceOf[Seq[Map[String, String]]]
    assert(srcs.contains(Map("taxonomy" -> "ott2.9draft12"))) // injected support
    assert(!ni.contains("draft_tree_lineage"))
    // unnamed node by numeric node_id, with lineage
    val un = V2Adapter.nodeInfo(t,
      nodeId = Some(90560L + 10000000L * 1057518L), includeLineage = true)
    assert(un("node_id") == 90560L + 10000000L * 1057518L)
    assert(!un.contains("name")) // no taxon fields on unnamed nodes
    val lin = un("draft_tree_lineage").asInstanceOf[List[Map[String, Any]]]
    assert(lin.map(_("node_id")) ==
      List(90560L + 10000000L * 651474L, 803675L)) // nearest first
    assert(lin.head("name") == "" && lin.head("ott_id") == "null")
    assert(lin(1)("name") == "Gavia" && lin(1)("ott_id") == 803675L)
    intercept[IllegalArgumentException] { V2Adapter.nodeInfo(t) }
  }

  test("v2 subtree: one of node_id/ott_id, newick + tree_id") {
    val byOtt = V2Adapter.subtree(t, ottId = Some(803675L))
    assert(byOtt("newick") == "(Gavia_stellata_ott1057044,((Gavia_arctica_ott1085739," +
      "Gavia_pacifica_ott651474),(Gavia_immer_ott1057518,Gavia_adamsii_ott90560)))" +
      "Gavia_ott803675;")
    assert(byOtt("tree_id") == "opentree4.1")
    val byNode = V2Adapter.subtree(t,
      nodeId = Some(90560L + 10000000L * 1057518L))
    assert(byNode("newick") ==
      "(Gavia_immer_ott1057518,Gavia_adamsii_ott90560);")
    intercept[IllegalArgumentException] {
      V2Adapter.subtree(t, nodeId = Some(1L), ottId = Some(2L))
    }
    intercept[IllegalArgumentException] { V2Adapter.subtree(t) }
    intercept[IllegalArgumentException] {
      V2Adapter.subtree(t, ottId = Some(424242L))
    }
  }

  test("draft_trees: per-tree metadata projection") {
    val d = TreeApi.draftTrees(t).head()
    assert(d.getAs[String]("synth_id") == "opentree4.1")
    assert(d.getAs[Long]("num_tips") == 5L)
    assert(d.getAs[String]("root_node_id") == "ott803675")
    assert(d.getAs[String]("root_taxon_name") == "Gavia")
    assert(d.getAs[Long]("root_ott_id") == 803675L)
  }

  test("multi-tree store: two synth versions coexist; every query filters by tree") {
    val m = TreeIngest.ingestAll(spark, Seq(
      TreeIngest.TreeSource(s"$fx/gavia.tre", s"$fx/gavia_annotations.json",
        s"$fx/gavia_taxonomy.tsv", "opentree4.1"),
      TreeIngest.TreeSource(s"$fx/gavia2.tre", s"$fx/gavia2_annotations.json",
        s"$fx/gavia_taxonomy.tsv", "opentree5.0")))
    assert(m.treeIds.sorted == Seq("opentree4.1", "opentree5.0"))
    assert(m.nodes.count() == 14) // 9 + 5 nodes, disjoint id spaces
    val t1 = m.tree("opentree4.1")
    val t2 = m.tree("opentree5.0")
    // per-tree about: same root taxon, different tree size + metadata
    val a1 = TreeApi.about(t1).head()
    val a2 = TreeApi.about(t2).head()
    assert(a1.getAs[Long]("root_num_tips") == 5L)
    assert(a2.getAs[Long]("root_num_tips") == 3L)
    assert(a1.getAs[String]("tree_id") == "opentree4.1")
    assert(a2.getAs[String]("tree_id") == "opentree5.0")
    // same ot ids resolve inside each tree independently
    val m1 = TreeApi.mrca(t1, nodeIds = Seq("ott1085739", "ott1057518"))
    assert(m1.mrcaOtId == "mrcaott90560ott651474") // unnamed mrca in the full tree
    val m2 = TreeApi.mrca(t2, nodeIds = Seq("ott1085739", "ott1057518"))
    assert(m2.mrcaOtId == "ott1085739") // immer absent in v5.0 → mrca of the rest
    assert(m2.nodeIdsNotInTree == Seq("ott1057518") && !m2.ok)
    // interval queries stay inside the owning tree (forest labeling blocks)
    val r2 = t2.nodes.filter(col("parent_id") === -1L)
      .select("node_id").head().getLong(0)
    val sub2 = TreeOps.subtree(m.nodes, r2) // over the UNION, no tree filter
    assert(sub2.count() == 5)
    assert(sub2.select("tree_id").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("opentree5.0"))
    // per-tree newick via the v2 surface
    val s2 = V2Adapter.subtree(t2, ottId = Some(803675L))
    assert(s2("newick") ==
      "(Gavia_stellata_ott1057044,(Gavia_arctica_ott1085739," +
      "Gavia_pacifica_ott651474))Gavia_ott803675;")
    assert(s2("tree_id") == "opentree5.0")
  }

  test("wire contract: 400-with-payload carries the computed result and exact message") {
    val r = TreeApi.mrca(t, nodeIds = Seq("ott1085739", "ott90560", "ottNOPE"),
      ottIds = Seq(424242L))
    val resp = WireContract.mrcaResponse(r)
    assert(resp.status == 400)
    assert(resp.message.contains(
      "The following OTT ids were not found: [424242]. " +
      "The following node ids were not found: [ottNOPE]. "))
    // the computed result still rides along (thrown-after-computing)
    assert(resp.body("mrca").asInstanceOf[Map[String, Any]]("node_id") ==
      "mrcaott90560ott651474")
    assert(resp.body("node_ids_not_in_tree") == Seq("ottNOPE"))
    val nt = resp.body("nearest_taxon").asInstanceOf[Map[String, Any]]
    assert(nt("name") == "Gavia" && nt("ott_id") == 803675L)
    // clean request → 200, no message
    val ok = WireContract.mrcaResponse(
      TreeApi.mrca(t, nodeIds = Seq("ott1085739", "ott90560")))
    assert(ok.status == 200 && ok.message.isEmpty)
    // induced variant
    val ir = WireContract.inducedResponse(TreeApi.inducedSubtree(t,
      nodeIds = Seq("ott1085739", "ott1057518", "ottNOPE")))
    assert(ir.status == 400 && ir.body("newick").toString.nonEmpty)
  }

  test("wire contract: v2 mrca returns 200 with partial bad ids, where v3 400s") {
    // the reference's v2 layer has no BadIdsException — bogus ids alongside
    // valid ones still produce a 200 blob with the unmatched ids listed
    // (ws-tests/test_v2_mrca_no_400.py: ott_ids [1084532, 3826, 2, 3, 5])
    val ottIds = Seq(1085739L, 90560L, 424242L)
    val v2 = WireContract.v2Response(V2Adapter.mrca(t, ottIds = ottIds))
    assert(v2.status == 200 && v2.message.isEmpty)
    assert(v2.body("ott_ids_not_in_tree") == Seq(424242L))
    assert(v2.body("mrca_node_id") ==
      V2Adapter.otIdToLong("mrcaott90560ott651474"))
    assert(v2.body("invalid_ott_ids") == Nil)
    // the SAME request through the v3 contract is a 400
    val v3 = WireContract.mrcaResponse(TreeApi.mrca(t, ottIds = ottIds))
    assert(v3.status == 400)
    // v2 only 400s when nothing resolves at all
    val none = WireContract.v2Response(V2Adapter.mrca(t, ottIds = Seq(424242L)))
    assert(none.status == 400 && none.body.isEmpty)
  }

  test("source_tree serves the preprocessed artifact for study_id + tree_id") {
    val base = java.nio.file.Files.createTempDirectory("srctrees")
    val d = base.resolve("v4.1/trees")
    java.nio.file.Files.createDirectories(d)
    java.nio.file.Files.writeString(d.resolve("pg_01_tree1.tre"),
      "(a,(b,c));\n")
    val r = TreeApi.sourceTree(t, base.toString, "pg_01", "tree1")
    assert(r("newick") == "(a,(b,c));")
    assert(r("synth_id") == "opentree4.1")
    intercept[IllegalArgumentException] {
      TreeApi.sourceTree(t, base.toString, "pg_99", "tree9")
    }
    intercept[IllegalArgumentException] {
      TreeApi.sourceTree(t, base.toString, "pg_01", "tree1", format = "arguson")
    }
    // ids are request input interpolated into a path: traversal and glob
    // characters must be refused before any filesystem access
    for ((s, tr) <- Seq(("..", ".._.."), ("pg_01/..", "tree1"),
        ("pg_01", "*"), ("pg{1", "tree1")))
      intercept[IllegalArgumentException] {
        TreeApi.sourceTree(t, base.toString, s, tr)
      }
  }

  test("source_tree via injectable transport: URL shape, re-served " +
      "newick, reference error mapping") {
    // a stored tree re-served through the endpoint shape: serialize the
    // fixture subtree, hand it to a hermetic fetcher, get it back parsed
    val stored = "(a:1.0,(b:2.0,c:3.0)bc:0.5)root;"
    var seenUrl: String = null
    val fetch: String => Option[String] = { url =>
      seenUrl = url
      if (url.endsWith("/pg_01_tree1.tre")) Some(stored + "\n") else None
    }
    val r = TreeApi.sourceTreeVia(t, fetch,
      "http://files.example.org/preprocessed", "pg_01", "tree1")
    assert(r("newick") == stored)
    assert(r("synth_id") == "opentree4.1")
    // the URL layout the reference constructs: base/v<version>/trees/
    assert(seenUrl ==
      "http://files.example.org/preprocessed/v4.1/trees/pg_01_tree1.tre")
    // the served newick is valid — it round-trips the parser
    assert(graft.tree.Newick.parse(r("newick").toString).nonEmpty)
    // fetch failure (any cause) maps to the reference's invalid-id error
    intercept[IllegalArgumentException] {
      TreeApi.sourceTreeVia(t, fetch, "http://files.example.org/preprocessed",
        "pg_99", "tree9")
    }
    // an empty body is a missing artifact, not an empty tree
    intercept[IllegalArgumentException] {
      TreeApi.sourceTreeVia(t, _ => Some(""),
        "http://files.example.org/preprocessed", "pg_01", "tree1")
    }
    // the id whitelist guards the URL exactly as it guards the path
    intercept[IllegalArgumentException] {
      TreeApi.sourceTreeVia(t, fetch, "http://files.example.org/preprocessed",
        "pg_01/..", "tree1")
    }
  }

  test("taxonomy → newick round-trips through the parser") {
    val tax = TreeIngest.readTaxonomy(spark, s"$fx/gavia_taxonomy.tsv")
    val nwk = TreeExports.taxonomyToNewick(spark, tax)
    assert(nwk.endsWith("Gavia_ott803675;"))
    val parsed = Newick.parse(nwk)
    assert(parsed.length == 6 && parsed.count(_.parentId == 0L) == 5)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.tree._

/** Distributed newick assembly: golden-equal to the driver builder on the
  * fixture (every label/branch/depth variant), and past the reference's
  * 100k-tip cap on a synthetic tree where the driver builder is the
  * uncapped comparison oracle.
  */
class NewickScaleSpec extends AnyFunSuite {
  import SparkTestSession._

  import GaviaFixture.fx
  lazy val ingested = TreeIngest.ingest(spark,
    s"$fx/gavia.tre", s"$fx/gavia_annotations.json", s"$fx/gavia_taxonomy.tsv",
    treeId = "opentree4.1")
  lazy val nodes = ingested.nodes

  def idOf(ot: String): Long = GaviaFixture.idOf(ingested, ot)

  test("token stream equals the driver builder on every variant") {
    val root = idOf("ott803675")
    val variants = Seq(
      ("name_and_id", true, false, -1),
      ("name_and_id", false, false, -1),
      ("name", false, false, -1),
      ("id", true, false, -1),
      ("name_and_id", true, true, -1),  // with branch lengths
      ("name_and_id", true, false, 1))  // depth-limited
    variants.foreach { case (fmt, unnamed, bls, d) =>
      val driver = TreeOps.newick(nodes, root, maxDepth = d,
        labelFormat = fmt, idsForUnnamed = unnamed, withBranchLengths = bls)
      val dist = TreeOps.newickFromTokens(TreeOps.newickTokens(nodes, root,
        maxDepth = d, labelFormat = fmt, idsForUnnamed = unnamed,
        withBranchLengths = bls))
      assert(dist == driver, s"variant ($fmt, $unnamed, $bls, $d)")
    }
  }

  test("distributed sink writes ordered parts that concatenate to the string") {
    val root = idOf("ott803675")
    val toks = TreeOps.newickTokens(nodes, root, idsForUnnamed = true)
    val dir = java.nio.file.Files.createTempDirectory("graft_nwk").toString
    TreeOps.newickWrite(toks, dir)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    // Files.readString: closes the handle and reads UTF-8 (Source.fromFile
    // leaks until GC and uses the platform charset, which would corrupt
    // non-ASCII labels against the UTF-8 parquet/driver string)
    val joined = parts.map(f =>
      java.nio.file.Files.readString(f.toPath)
        .replace("\r", "").replace("\n", "")).mkString
    assert(joined == TreeOps.newick(nodes, root, idsForUnnamed = true))
  }

  test("distributed arguson equals the driver builder at several heights") {
    val root = idOf("ott803675")
    Seq(1, 2, 5, -1).foreach { h =>
      val driver = TreeApi.arguson(ingested, root, heightLimit = h)
      val dist = TreeApi.argusonUncapped(ingested, root, heightLimit = h)
      assert(dist == driver, s"heightLimit=$h")
    }
    // also from an interior root, where the lineage array is non-empty
    val mid = idOf("mrcaott90560ott651474")
    assert(TreeApi.argusonUncapped(ingested, mid, 5) ==
      TreeApi.arguson(ingested, mid, 5))
  }

  test("arguson sink writes ordered parts that concatenate to the body") {
    val root = idOf("ott803675")
    val dir = java.nio.file.Files.createTempDirectory("graft_arg").toString
    TreeApi.argusonWrite(ingested, root, dir)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    // Files.readString: closes the handle and reads UTF-8 (Source.fromFile
    // leaks until GC and uses the platform charset, which would corrupt
    // non-ASCII labels against the UTF-8 parquet/driver string)
    val joined = parts.map(f =>
      java.nio.file.Files.readString(f.toPath)
        .replace("\r", "").replace("\n", "")).mkString
    assert(joined == TreeOps.newickFromTokens(
      TreeApi.argusonTokens(ingested, root)))
    assert(joined.startsWith("{\"node_id\":"))
  }

  test("assembles past the 100k-tip cap, equal to the uncapped driver builder") {
    // heap tree: 260k nodes, 130k tips — over the reference's cap
    val n = 260000L
    val edges = spark.range(2L, n + 1).toDF("child_id")
      .withColumn("parent_id", expr("child_id div 2"))
      .withColumn("child_ord", (col("child_id") % 2L).cast("int"))
    val labeled = TreeLabeler.label(spark, edges)
      .withColumn("name", concat(lit("n"), col("node_id")))
      .withColumn("ot_node_id", concat(lit("ott"), col("node_id")))
      .withColumn("tax_uid", col("node_id"))
    val rootId = 1L

    // the capped driver path refuses...
    val ex = intercept[IllegalArgumentException] {
      TreeOps.newick(labeled, rootId, labelFormat = "name")
    }
    assert(ex.getMessage.contains("larger than currently allowed"))

    // ...the token path has no cap, and the uncapped driver builder agrees
    val dist = TreeOps.newickFromTokens(
      TreeOps.newickTokens(labeled, rootId, labelFormat = "name"))
    val driver = TreeOps.newick(labeled, rootId, labelFormat = "name",
      cap = Long.MaxValue)
    assert(dist.length == driver.length)
    assert(dist == driver)
    // one "(" per internal node: ids 1..130000 have a child 2i <= 260000
    assert(dist.count(_ == '(') == 130000)

    // arguson past ITS cap (25k) too: driver refuses, token path serves
    val nodes2 = labeled
      .withColumn("unique_name", lit(null).cast("string"))
      .withColumn("tax_rank", lit(null).cast("string"))
      .withColumn("supported_by", lit(null).cast("map<string,string>"))
      .withColumn("terminal", lit(null).cast("map<string,string>"))
      .withColumn("partial_path_of", lit(null).cast("map<string,string>"))
      .withColumn("resolves", lit(null).cast("map<string,string>"))
      .withColumn("conflicts_with", lit(null).cast("map<string,array<string>>"))
      .withColumn("resolved_by", lit(null).cast("map<string,array<string>>"))
    val empty = spark.range(0).toDF("x")
    val t2 = TreeIngest.Ingested(nodes2, empty, empty, empty)
    val exA = intercept[IllegalArgumentException] {
      TreeApi.arguson(t2, rootId, heightLimit = -1)
    }
    assert(exA.getMessage.contains("larger than currently allowed"))
    val arg = TreeApi.argusonUncapped(t2, rootId, heightLimit = -1)
    assert(arg.startsWith("{\"arguson\":{\"node_id\":"))
    assert(arg.endsWith("}"))
    assert("\"node_id\":\"".r.findAllIn(arg).length == 260000)
    assert(arg.count(_ == '{') == arg.count(_ == '}'))
  }
}

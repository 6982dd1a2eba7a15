package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.tree._

/** The driver-side point-query index ([[TreeServing]]) must answer
  * exactly what the relational endpoints answer — same fields, same
  * bad-id partitions — and must answer WITHOUT a Spark job, far under
  * the job-scheduling floor (the reference's Lucene-hit anchor,
  * GraphBase.java:431-448).
  */
class TreeServingSpec extends AnyFunSuite {
  import SparkTestSession._
  import GaviaFixture.fx

  lazy val t = TreeIngest.ingest(spark,
    s"$fx/gavia.tre", s"$fx/gavia_annotations.json", s"$fx/gavia_taxonomy.tsv",
    treeId = "opentree4.1")
  lazy val idx = TreeServing.build(t)

  test("index covers every node through all three key spaces") {
    assert(idx.size == t.nodes.count())
    val r = t.nodes.select("node_id", "ot_node_id", "tax_uid", "pre",
      "post", "depth", "tip_descendants").collect()
    r.foreach { row =>
      val id = row.getLong(0)
      assert(idx.byNodeId(id).isDefined)
      assert(idx.byOtId(row.getString(1)).exists(_.getLong(0) == id))
      if (!row.isNullAt(2))
        assert(idx.byOttId(row.getLong(2)).exists(_.getLong(0) == id))
      assert(idx.bounds(row.getString(1)).contains(
        (row.getLong(3), row.getLong(4), row.getLong(5), row.getLong(6))))
    }
  }

  test("mrca parity with the endpoint, including bad-id partitions") {
    val requests = Seq(
      (Seq("ott1085739", "ott90560"), Seq.empty[Long]),
      (Seq("ott1085739", "ott90560", "ottNOPE"), Seq.empty[Long]),
      (Seq("ott1057044"), Seq.empty[Long]),          // single id → itself
      (Seq.empty[String], Seq(1085739L, 651474L)),   // ott-id space
      (Seq("mrcaott90560ott1057518"), Seq(1085739L, 99999999L)))
    requests.foreach { case (nodeIds, ottIds) =>
      assert(idx.mrca(nodeIds, ottIds) == TreeApi.mrca(t, nodeIds, ottIds),
        s"mismatch for $nodeIds / $ottIds")
    }
  }

  test("nodeInfo parity with the endpoint columns, lineage included") {
    Seq("ott1085739", "mrcaott90560ott1057518", "ott803675").foreach { id =>
      val df = TreeApi.nodeInfo(t, id, includeLineage = true)
      val row = df.head()
      val m = idx.nodeInfo(id, includeLineage = true).get
      df.columns.zipWithIndex.foreach { case (c, i) =>
        val got = m(c) match {
          case s: Seq[_] => s
          case x => x
        }
        val want = row.get(i) match {
          case s: scala.collection.Seq[_] => s.toSeq
          case x => x
        }
        assert(got == want, s"$id.$c: index=$got endpoint=$want")
      }
    }
    assert(idx.nodeInfo("ottNOPE").isEmpty)
  }

  test("a loaded index doubles as the descendant-rewrite's anchor " +
      "catalog: clade query over the REAL tree, zero extra collects") {
    import graft.plans.{DescendantRewrite, IntervalCatalog}
    IntervalCatalog.clear()
    IntervalCatalog.installFrom(idx) // resolver only — no Spark job
    val root = t.nodes.filter(col("parent_id") === -1L)
      .select(col("node_id")).head().getLong(0)
    val viaRewrite = t.nodes.filter(DescendantRewrite
        .descendant_of(col("ancestors"), lit(root)))
      .select(col("node_id"))
    // the rule must have found the interval through the index resolver
    assert(!viaRewrite.queryExecution.optimizedPlan.toString
      .contains("array_contains"))
    val got = viaRewrite.collect().map(_.getLong(0)).toSet
    val want = t.nodes.filter(array_contains(col("ancestors"), root))
      .select(col("node_id")).collect().map(_.getLong(0)).toSet
    assert(got == want && got.size == idx.size) // root's clade = whole tree
    IntervalCatalog.clear()
  }

  test("warm lookups stay far under the Spark job floor") {
    val ids = Seq("ott1085739", "ott90560", "ott803675", "ott1057044")
    ids.foreach(idx.nodeInfo(_)) // warm
    idx.mrca(nodeIds = ids)
    val n = 2000
    val t0 = System.nanoTime()
    var i = 0
    while (i < n) {
      idx.nodeInfo(ids(i % 4))
      idx.mrca(nodeIds = ids)
      i += 1
    }
    val perLookupMs = (System.nanoTime() - t0) / 1e6 / (2.0 * n)
    // the job floor this path replaces is ~100-350 ms; a hash probe must
    // be orders of magnitude under it (generous bound to stay unflaky)
    assert(perLookupMs < 1.0, s"warm lookup took $perLookupMs ms")
  }
}

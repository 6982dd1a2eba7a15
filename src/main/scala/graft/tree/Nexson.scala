package graft.tree

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** NexSON (badgerfish NeXML-JSON) study reader (SURVEY §2.1 S12;
  * capability reference /root/reference/src/main/java/jade/tree/deprecated/
  * NexsonReader.java:66-411): `{"data": {"nexml": {"otus": {"otu": [...]},
  * "trees": {"tree": [{"node": [...], "edge": [...]}]}}}}` — the `data`
  * wrapper is optional (curated studies carry it, raw nexml does not).
  *
  * Output is relational: one row per edge with otu labels and `ot:ottId`s
  * resolved, ready for [[TreeLabeler.label]] or [[Nexson.toNewick]].
  */
object Nexson {

  /** Read a study file → edge rows:
    * (tree_id, child, parent, child_ord, branch_length, label, ott_id,
    * parent_label). Node ids are the nexml string ids; `label`/`ott_id`
    * resolve the CHILD's otu, `parent_label` the parent's (so the root —
    * which appears only as a source — keeps its otu label too).
    */
  def readStudy(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("multiLine", "true").json(path)
    val nexml = if (raw.columns.contains("data")) raw.select(col("data.nexml").as("nexml"))
                else raw.select(col("nexml"))

    val otus = nexml
      .select(explode(col("nexml.otus.otu")).as("otu"))
      .select(col("otu.@id").as("otu_id"), col("otu.@label").as("label"),
        // meta: [{"@property": "ot:ottId", "$": 123}, ...]
        element_at(filter(col("otu.meta"),
          m => m("@property") === "ot:ottId"), 1)("$")
          .cast("long").as("ott_id"))

    val trees = nexml.select(explode(col("nexml.trees.tree")).as("t"))
    val nodes = trees.select(col("t.@id").as("tree_id"),
        explode(col("t.node")).as("n"))
      .select(col("tree_id"), col("n.@id").as("node_id"),
        col("n.@otu").as("otu_id"))
    val edges = trees.select(col("t.@id").as("tree_id"),
        posexplode(col("t.edge")).as(Seq("ord", "e")))
      .select(col("tree_id"), col("e.@target").as("child"),
        col("e.@source").as("parent"), col("ord").cast("int").as("child_ord"),
        col("e.@length").cast("double").as("branch_length"))

    edges
      .join(nodes.select(col("tree_id"), col("node_id").as("child"),
        col("otu_id")), Seq("tree_id", "child"), "left_outer")
      .join(broadcast(otus), Seq("otu_id"), "left_outer")
      .join(nodes.select(col("tree_id"), col("node_id").as("parent"),
        col("otu_id").as("p_otu")), Seq("tree_id", "parent"), "left_outer")
      .join(broadcast(otus.select(col("otu_id").as("p_otu"),
        col("label").as("parent_label"))), Seq("p_otu"), "left_outer")
      .select(col("tree_id"), col("child"), col("parent"), col("child_ord"),
        col("branch_length"), col("label"), col("ott_id"),
        col("parent_label"))
  }

  /** nexson2newick (MainRunner.java:374-429): serialize one study tree.
    * Labels are scrubbed otu labels where present, else the nexml node id.
    */
  def toNewick(spark: SparkSession, study: DataFrame, treeId: String,
      withBranchLengths: Boolean = false): String = {
    val rows = study.filter(col("tree_id") === treeId).collect()
    require(rows.nonEmpty, s"no tree '$treeId' in study")
    val children = rows.groupBy(_.getAs[String]("parent"))
      .map { case (p, es) =>
        p -> es.sortBy(_.getAs[Int]("child_ord")).map(_.getAs[String]("child")).toSeq }
    val kids = rows.map(_.getAs[String]("child")).toSet
    val root = rows.map(_.getAs[String]("parent")).distinct
      .filterNot(kids.contains) match {
        case Array(r) => r
        case other => throw new IllegalStateException(
          s"expected one root, got ${other.mkString(",")}")
      }
    // the root appears only on the parent side of edges, so its otu label
    // rides the parent_label column (NexsonReader labels every node)
    val rootLabel = rows.find(_.getAs[String]("parent") == root)
      .flatMap(r => Option(r.getAs[String]("parent_label")))
      .map(Newick.scrub).getOrElse("")
    val labels = rows.map { r =>
      r.getAs[String]("child") -> (Option(r.getAs[String]("label"))
        .map(Newick.scrub).getOrElse(""))
    }.toMap + (root -> rootLabel)
    val bls: Map[String, Option[Double]] = rows.map { r =>
      r.getAs[String]("child") ->
        (if (withBranchLengths && !r.isNullAt(r.fieldIndex("branch_length")))
          Some(r.getAs[Double]("branch_length")) else None)
    }.toMap + (root -> None)

    // map string ids to longs for the shared serializer
    val idx = (rows.map(_.getAs[String]("child")) :+ root)
      .distinct.zipWithIndex.map { case (s, i) => s -> i.toLong }.toMap
    val rev = idx.map(_.swap)
    Newick.serialize(idx(root),
      id => children.getOrElse(rev(id), Seq.empty).map(idx),
      id => labels(rev(id)),
      id => bls(rev(id)))
  }
}

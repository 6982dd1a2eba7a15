package graft.tree

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Export utilities (SURVEY §2.1 S8–S13). The heavy lifting is relational;
  * string templates (DOT/GraphML) render driver-side over bounded inputs,
  * as in the reference's exporters (GraphExporter.java).
  */
object TreeExports {

  /** Cap-guarded driver materialization shared by the string exporters:
    * the limit bounds what ever reaches the driver (collect-then-require
    * would OOM on exactly the oversized input the cap exists to refuse);
    * one extra row past the cap is enough to prove the violation, and
    * when the input fits the cap the limit is a row-preserving no-op.
    */
  private def boundedCollect(df: DataFrame, cap: Long,
      what: String): Array[org.apache.spark.sql.Row] = {
    require(cap >= 1 && cap < Int.MaxValue, s"cap $cap out of range")
    val rows = df.limit(cap.toInt + 1).collect()
    require(rows.length <= cap, s"$what exceeds cap $cap rows/nodes")
    rows
  }

  /** S10: CSV-ready edge dump — edges resolved to node names
    * (GraphExporter.java:543-575). Caller appends `.write.csv(...)`.
    */
  def edgeDump(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val n = nodes.select(col("node_id"), col("ot_node_id"), col("name"))
    edges
      .join(n.select(col("node_id").as("child_id"),
        col("ot_node_id").as("src_id"), col("name").as("src_name")), "child_id")
      .join(n.select(col("node_id").as("parent_id"),
        col("ot_node_id").as("dst_id"), col("name").as("dst_name")), "parent_id")
      .select(col("src_id"), col("dst_id"), col("src_name"), col("dst_name"),
        col("tree_id"), col("branch_length"))
  }

  /** S8: Graphviz DOT of a bounded subtree (GraphExporter.java:202-295). */
  def dot(nodes: DataFrame, rootId: Long, maxDepth: Int = -1,
      cap: Long = 10000): String = {
    // cap enforced BEFORE materialization: collect-then-require would OOM
    // the driver on the very input the cap exists to refuse. limit(cap+1)
    // bounds what ever reaches the driver; when the subtree fits the cap
    // the limit is a no-op, so output is unchanged and deterministic.
    val sub = boundedCollect(TreeOps.subtree(nodes, rootId, maxDepth)
      .select(col("node_id"), col("parent_id"), col("ot_node_id")),
      cap, "subtree")
    val sb = new StringBuilder("digraph synth {\n")
    sub.foreach { r =>
      sb ++= s"""  n${r.getLong(0)} [label="${r.getString(2)}"];\n"""
    }
    sub.filter(_.getLong(0) != rootId).foreach { r =>
      sb ++= s"  n${r.getLong(0)} -> n${r.getLong(1)} [label=\"SYNTHCHILDOF\"];\n"
    }
    sb ++= "}\n"
    sb.result()
  }

  /** Distributed twin of [[dot]]: the DOT body as a row per statement
    * (node declarations + SYNTHCHILDOF edges), built entirely
    * executor-side — wrap with the `digraph synth {`/`}` header/footer at
    * the sink to recover the exact [[dot]] output with no cap.
    */
  def dotLines(nodes: DataFrame, rootId: Long, maxDepth: Int = -1): DataFrame = {
    val sub = TreeOps.subtree(nodes, rootId, maxDepth)
    val nodeLines = sub.select(concat(lit("  n"), col("node_id"),
      lit(" [label=\""), col("ot_node_id"), lit("\"];")).as("line"))
    val edgeLines = sub.filter(col("node_id") =!= lit(rootId))
      .select(concat(lit("  n"), col("node_id"), lit(" -> n"),
        col("parent_id"), lit(" [label=\"SYNTHCHILDOF\"];")).as("line"))
    nodeLines.unionByName(edgeLines)
  }

  /** S9: GraphML XML of a bounded subtree (GraphExporter.java:96-200 —
    * the reference's exportGraphML; node labels carry the ot id and name,
    * edges the synth-child relation). Same bounded-collect shape as [[dot]].
    */
  def graphml(nodes: DataFrame, rootId: Long, maxDepth: Int = -1,
      cap: Long = 10000): String = {
    def esc(s: String): String = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;")
    val sub = boundedCollect(TreeOps.subtree(nodes, rootId, maxDepth)
      .select(col("node_id"), col("parent_id"), col("ot_node_id"),
        col("name")),
      cap, "subtree")
    val sb = new StringBuilder(
      """<?xml version="1.0" encoding="UTF-8"?>""" + "\n" +
        """<graphml xmlns="http://graphml.graphdrawing.org/xmlns">""" + "\n" +
        """  <key id="d0" for="node" attr.name="name" attr.type="string"/>""" + "\n" +
        """  <graph id="synth" edgedefault="directed">""" + "\n")
    sub.foreach { r =>
      val name = Option(r.getString(3)).getOrElse("")
      sb ++= s"""    <node id="${esc(r.getString(2))}">""" +
        s"""<data key="d0">${esc(name)}</data></node>\n"""
    }
    val ots = sub.map(r => r.getLong(0) -> r.getString(2)).toMap
    sub.filter(_.getLong(0) != rootId).foreach { r =>
      sb ++= s"""    <edge source="${esc(ots(r.getLong(0)))}"""" +
        s""" target="${esc(ots(r.getLong(1)))}"/>\n"""
    }
    sb ++= "  </graph>\n</graphml>\n"
    sb.result()
  }

  /** S9/A8: effective number of parents per child node — inverse Simpson
    * index 1/Σ pᵢ² over the child's parent-edge distribution
    * (GraphExporter.java:302-307). Degenerates to 1.0 on trees; meaningful
    * on multi-parent graphs (e.g. pre-synthesis alignment graphs).
    */
  def effectiveParents(edges: DataFrame): DataFrame = {
    val counts = edges.groupBy(col("child_id"), col("parent_id"))
      .agg(count(lit(1)).cast("double").as("cnt"))
    val tot = counts.groupBy(col("child_id")).agg(sum(col("cnt")).as("tot"))
    counts.join(tot, "child_id")
      .groupBy(col("child_id"))
      .agg(round(lit(1.0) / sum((col("cnt") / col("tot")) * (col("cnt") / col("tot"))), 6)
        .as("effective_parents"))
  }

  /** S11: MRP membership matrix in long form — (tip, clade, 1) for every
    * internal clade containing the tip (GraphExporter.java:577-632; the
    * reference materializes the dense 0/1 matrix, which at scale is the
    * wrong shape — pivot downstream if a dense dump is really needed).
    */
  def mrpMatrix(nodes: DataFrame): DataFrame =
    nodes.filter(col("is_leaf"))
      .select(col("node_id").as("tip_id"), explode(col("ancestors")).as("clade_id"))
      .filter(col("clade_id") =!= col("tip_id"))

  /** S13: taxonomy TSV → newick (MainRunner.java:250-367), rooted at the
    * row whose parent is absent (reference falls back to "cellular
    * organisms"/93302). Children are emitted in uid order.
    */
  def taxonomyToNewick(spark: SparkSession, taxonomy: DataFrame,
      cap: Long = 1000000): String = {
    val rows = boundedCollect(
      taxonomy.select(col("tax_uid"), col("parent_uid"), col("name")),
      cap, "taxonomy")
    val uids = rows.map(_.getLong(0)).toSet
    val roots = rows.filter(r => r.isNullAt(1) || !uids.contains(r.getLong(1)))
    require(roots.length == 1,
      s"expected a single root, found ${roots.length}")
    val root = roots.head.getLong(0)
    val children = rows.filter(r => !r.isNullAt(1) && uids.contains(r.getLong(1)))
      .groupBy(_.getLong(1)).map { case (k, v) =>
        k -> v.map(_.getLong(0)).sorted.toSeq }
    val names = rows.map(r => r.getLong(0) ->
      (Newick.scrub(Option(r.getString(2)).getOrElse("")) + "_ott" + r.getLong(0))).toMap
    Newick.serialize(root, id => children.getOrElse(id, Seq.empty), names)
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.tree.TreeIngest

/** Single source for the Gavia fixture constants shared by the tree
  * suites: the golden newick, the fixture path, and the ot→node_id
  * lookup. One definition so an intentional golden update cannot be
  * applied to one suite and leave a sibling asserting a stale string.
  */
object GaviaFixture {
  val fx = "src/test/resources/fixture"

  val GoldenGavia: String =
    "(Gavia_stellata_ott1057044,((Gavia_arctica_ott1085739,Gavia_pacifica_ott651474)" +
    "mrcaott651474ott1085739,(Gavia_immer_ott1057518,Gavia_adamsii_ott90560)" +
    "mrcaott90560ott1057518)mrcaott90560ott651474)Gavia_ott803675;"

  def idOf(t: TreeIngest.Ingested, ot: String): Long =
    t.nodes.filter(col("ot_node_id") === ot).select("node_id")
      .head().getLong(0)
}

package graft

import org.apache.spark.sql.functions._

/** Point-query serving probe (BASELINE.md "interactive latency" anchor):
  * builds the driver-side [[graft.tree.TreeServing]] index over the
  * heap-encoded tree at the configured SF — ot-attribute columns
  * synthesized deterministically so the serving projection is full-width
  * — then measures WARM single-id node_info / pairwise mrca lookups.
  * The reference answers these from Lucene exact indexes in milliseconds
  * (GraphBase.java:431-448); this path must answer with NO Spark job,
  * so the probe requires the per-lookup time to sit far under the
  * ~100 ms job floor it replaces. One JSON line on stdout.
  */
object ServeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val served = queries.TreeQueries.labeled(spark, sfDir)
      .withColumn("ot_node_id", concat(lit("ott"), col("node_id")))
      .withColumn("tax_uid", col("node_id"))
      .withColumn("name", concat(lit("taxon "), col("node_id")))
      .withColumn("unique_name", col("name"))
      .withColumn("tax_rank", lit("species"))
      .withColumn("tax_sources", map(lit("src"), col("node_id").cast("string")))
      .withColumn("supported_by", map(lit("tree1"), col("ot_node_id")))
      .withColumn("terminal", lit(null).cast("map<string,string>"))
      .withColumn("partial_path_of", lit(null).cast("map<string,string>"))
      .withColumn("resolves", lit(null).cast("map<string,string>"))
      .withColumn("conflicts_with", lit(null).cast("map<string,array<string>>"))
      .withColumn("resolved_by", lit(null).cast("map<string,array<string>>"))
    val t0 = System.nanoTime()
    val idx = tree.TreeServing.build(served)
    val buildSec = (System.nanoTime() - t0) / 1e9
    val n = idx.size // heap ids are contiguous 1..n
    val rnd = new scala.util.Random(42)
    def someId(): Long = 1L + rnd.nextInt(n)
    // each round: one node_info + one pairwise mrca, all from the index
    def round(k: Int): (Long, Double) = {
      var found = 0L
      val t1 = System.nanoTime()
      var i = 0
      while (i < k) {
        val a = someId(); val b = someId()
        if (idx.nodeInfo(s"ott$a").nonEmpty) found += 1
        if (idx.mrca(ottIds = Seq(a, b)).mrcaOtId.nonEmpty) found += 1
        i += 1
      }
      (found, (System.nanoTime() - t1) / 1e3 / (2.0 * k))
    }
    round(2000) // warm (JIT + map residency)
    val (found, avgMicros) = round(10000)
    require(found == 20000L, s"probe lookups failed: $found/20000")
    require(avgMicros < 100000.0, // the bar: well under the 100 ms floor
      s"point lookup averaged $avgMicros µs — not a fast path")
    println(s"""{"metric":"serve_point_query","value":$avgMicros,"unit":"micros_per_lookup","index_nodes":$n,"build_sec":$buildSec,"sf":"$sfDir"}""")
    spark.stop()
  }
}

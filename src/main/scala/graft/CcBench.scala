package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.ClusterOps

/** One-off connected-components scale benchmark: random near-dup-shaped
  * graph of N nodes and ~N edges (a big corpus whose candidate pairs
  * arrive from LSH — many tiny clusters plus a few long chains), report
  * rounds-to-converge wall time. Usage: runMain graft.CcBench [nNodes]
  */
object CcBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic pseudo-random edges: node i links to a hash-derived
    // partner within a window of 1000 ids — cluster sizes follow the
    // random-graph regime below the giant-component threshold. The last
    // (possibly short) window wraps within itself so every partner stays
    // inside the node universe for any n.
    val edges = spark.range(0L, n).toDF("a")
      .withColumn("w0", (col("a") / 1000L).cast("long") * 1000L)
      .withColumn("wlen", least(lit(1000L), lit(n) - col("w0")))
      .withColumn("b", col("w0") + pmod(xxhash64(col("a")), col("wlen")))
      .filter(col("a") =!= col("b"))
      .select(col("a"), col("b"))
    val nodes = spark.range(0L, n).toDF("id")

    val t0 = System.nanoTime()
    val cc = ClusterOps.connectedComponents(edges, nodes)
    val nComp = cc.select(countDistinct(col("component"))).head.getLong(0)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"{" + f""""nodes":$n,"components":$nComp,"sec":$secs%.1f""" + "}")
    spark.stop()
  }
}

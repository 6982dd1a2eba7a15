package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tree.TreeLabeler

/** One-off ingest-scale benchmark: label a synthetic heap tree of N nodes
  * (depth log₂ N) and report wall time — calibrates the labeling pass
  * against the reference's "2.4M-tip tree ingest in minutes" target
  * (BASELINE.md). Usage: runMain graft.IngestBench [nNodes]
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2400000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val edges = spark.range(2L, n + 1).toDF("child_id")
      .withColumn("parent_id", expr("child_id div 2"))
      .withColumn("child_ord", (col("child_id") % 2L).cast("int"))

    val t0 = System.nanoTime()
    val labeled = TreeLabeler.label(spark, edges)
    val rows = labeled.count()
    val secs = (System.nanoTime() - t0) / 1e9
    val tips = labeled.filter(col("node_id") === 1L)
      .select(col("tip_descendants")).head().getLong(0)
    println(s"""{"metric":"ingest_label","value":$secs,"unit":"sec","nodes":$rows,"tips":$tips}""")
    spark.stop()
  }
}

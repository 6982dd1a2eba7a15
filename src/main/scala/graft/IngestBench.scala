package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tree.TreeLabeler

/** One-off ingest-scale benchmark: label a synthetic tree of N nodes and
  * report wall time — calibrates the labeling pass against the
  * reference's "2.4M-tip tree ingest in minutes" target (BASELINE.md).
  *
  * Shapes: `heap` (default — balanced, depth log₂ N, the realistic
  * phylogeny proxy) and `combD` (a depth-D spine with the remaining
  * nodes as leaves spread evenly along it, e.g. `comb1024`) — the
  * pathological-depth case that would cost D sequential rounds in a
  * frontier-at-a-time design; pointer doubling must label it in
  * ⌈log₂ D⌉ rounds. Usage: runMain graft.IngestBench [nNodes] [shape]
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2400000L)
    val shape = args.lift(1).getOrElse("heap")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(cpus)

    val edges = if (shape.startsWith("comb")) {
      // spine 1..d (node i's parent is i-1); leaves n/d per spine node
      val d = shape.drop(4).toLong
      require(d >= 2 && d < n, s"comb depth $d out of range for n=$n")
      val spine = spark.range(2L, d + 1).toDF("child_id")
        .withColumn("parent_id", col("child_id") - 1L)
        .withColumn("child_ord", lit(0))
      val leaves = spark.range(d + 1, n + 1).toDF("child_id")
        .withColumn("parent_id", (col("child_id") - d - 1L) % d + 1L)
        .withColumn("child_ord",
          (((col("child_id") - d - 1L) / d) + 1L).cast("int"))
      spine.unionByName(leaves)
    } else
      spark.range(2L, n + 1).toDF("child_id")
        .withColumn("parent_id", expr("child_id div 2"))
        .withColumn("child_ord", (col("child_id") % 2L).cast("int"))

    val t0 = System.nanoTime()
    val labeled = TreeLabeler.label(spark, edges)
    val rows = labeled.count()
    val secs = (System.nanoTime() - t0) / 1e9
    val tips = labeled.filter(col("node_id") === 1L)
      .select(col("tip_descendants")).head().getLong(0)

    // serving-store economics: pay the bucketed write once, then every new
    // session loads in seconds instead of re-paying the labeling pass
    val storeDir = java.nio.file.Files.createTempDirectory("graft_store_bench").toString
    val ing = graft.tree.TreeIngest.Ingested(
      labeled.withColumn("tree_id", lit("bench")),
      edges.withColumn("branch_length", lit(null).cast("double"))
        .withColumn("tree_id", lit("bench")),
      spark.range(1).select(lit("bench").as("tree_id")),
      spark.range(0).select(lit("").as("source_id"), lit("").as("git_sha"),
        lit("").as("source_tree_id"), lit("").as("study_id"),
        lit("").as("taxonomy"), lit("bench").as("tree_id")))
    val tS = System.nanoTime()
    graft.tree.TreeStore.save(ing, storeDir)
    val saveSecs = (System.nanoTime() - tS) / 1e9
    val tL = System.nanoTime()
    val loadedRows = graft.tree.TreeStore.load(spark, storeDir).nodes.count()
    val loadSecs = (System.nanoTime() - tL) / 1e9
    require(loadedRows == rows)

    // incremental append: a 1%-sized new synthesis version into the big
    // store — the cost must track the NEW tree, not the store
    val m = (n / 100L).max(1000L)
    val base = n + 1L
    val edges2 = spark.range(2L, m + 1).toDF("k")
      .select((col("k") + base).as("child_id"),
        (expr("k div 2") + base).as("parent_id"),
        (col("k") % 2L).cast("int").as("child_ord"))
    val tA = System.nanoTime()
    val labeled2 = TreeLabeler.label(spark, edges2)
    val ing2 = graft.tree.TreeIngest.Ingested(
      labeled2.withColumn("tree_id", lit("bench2")),
      edges2.withColumn("branch_length", lit(null).cast("double"))
        .withColumn("tree_id", lit("bench2")),
      spark.range(1).select(lit("bench2").as("tree_id")),
      spark.range(0).select(lit("").as("source_id"), lit("").as("git_sha"),
        lit("").as("source_tree_id"), lit("").as("study_id"),
        lit("").as("taxonomy"), lit("bench2").as("tree_id")))
    graft.tree.TreeStore.appendIngested(spark, storeDir, ing2)
    val appendSecs = (System.nanoTime() - tA) / 1e9
    val total2 = graft.tree.TreeStore.load(spark, storeDir, persistNodes = false)
      .nodes.count()
    require(total2 == rows + m, s"$total2 != $rows + $m")

    println(s"""{"metric":"ingest_label","value":$secs,"unit":"sec","nodes":$rows,"tips":$tips,"store_save_sec":$saveSecs,"store_load_sec":$loadSecs,"append_nodes":$m,"append_sec":$appendSecs}""")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.plans.{DescendantRewrite, IntervalCatalog}
import graft.tree.TreeLabeler

/** The descendant-rewrite payoff, measured where it lives: a parquet
  * scan. Label an n-node heap tree (the real [[TreeLabeler]] pass),
  * persist it, then answer the same clade-membership question two ways
  * over the cold store — `array_contains(ancestors, x)` (decodes the
  * widest column for every row, no row-group pruning possible) versus
  * the optimizer-rewritten `descendant_of(ancestors, x)` (two long
  * comparisons on `pre`, pushed to the scan; ancestors never read).
  * Self-verifying: both forms must count the same clade, and the clade
  * sizes must match the interval arithmetic. Usage: runMain
  * graft.DescBench [n]
  */
object DescBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(cpus)

    val edges = spark.range(2L, n + 1)
      .select(col("id").as("child_id"), expr("id div 2").as("parent_id"),
        (col("id") % 2L).cast("int").as("child_ord"))
    def time[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val v = body
      println(f"""{"which":"$name","sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
      v
    }
    val labeled = time(s"label_$n")(TreeLabeler.label(spark, edges))
    val dir = java.nio.file.Files.createTempDirectory("graft_descb").toString
    labeled.write.mode("overwrite").parquet(dir)
    val nodes = spark.read.parquet(dir)
    nodes.count() // warm file listing + footers

    // anchors spanning three clade magnitudes: ~n/4, ~n/1024, a near-leaf
    val anchors = Seq(5L, 1027L, n / 2 - 1)
    IntervalCatalog.clear()
    IntervalCatalog.registerAnchors(nodes, anchors)
    // an unresolved anchor would silently degrade descendant_of to
    // array_contains and the "interval" timing would measure nothing
    anchors.foreach(a => require(IntervalCatalog.lookup(a).isDefined,
      s"anchor $a not in the $n-node tree — pick anchors that exist"))
    for (a <- anchors) {
      val viaContains = time(s"contains_$a")(
        nodes.filter(array_contains(col("ancestors"), a)).count())
      val viaInterval = time(s"interval_$a")(
        nodes.filter(DescendantRewrite.descendant_of(col("ancestors"), lit(a)))
          .count())
      require(viaContains == viaInterval,
        s"clade mismatch at $a: $viaContains vs $viaInterval")
      println(s"""{"anchor":$a,"clade":$viaInterval,"agree":true}""")
    }
    spark.stop()
  }
}

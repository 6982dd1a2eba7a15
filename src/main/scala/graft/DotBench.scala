package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Microbenchmark: codegen'd DotProduct vs the interpreted
  * aggregate(zip_with(...)) fold it replaced, on a corpus-scale scoring
  * shape (100k vecs x 256 dims, full scan sum). Usage: runMain graft.DotBench
  */
object DotBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(cpus)
    val dims = 256
    val vecs = spark.range(0L, 100000L).toDF("id")
      .withColumn("a", transform(sequence(lit(0), lit(dims - 1)),
        d => pmod(xxhash64(col("id"), d), lit(1000L)).cast("double") / 1000.0))
      .withColumn("b", transform(sequence(lit(0), lit(dims - 1)),
        d => pmod(xxhash64(col("id") + 7L, d), lit(1000L)).cast("double") / 1000.0))
      .localCheckpoint()

    def time(name: String, c: org.apache.spark.sql.Column): Unit = {
      vecs.select(sum(c)).head() // warm
      val t0 = System.nanoTime()
      val v = vecs.select(sum(c)).head().getDouble(0)
      println(f"""{"which":"$name","sec":${(System.nanoTime() - t0) / 1e9}%.2f,"sum":$v%.3f}""")
    }
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    time("hof_interpreted", hof)
    time("codegen_dot", graft.functions.VectorExprs.dot_product(col("a"), col("b")))
    val eq = vecs.select((hof === graft.functions.VectorExprs.dot_product(
      col("a"), col("b"))).as("e")).filter(!col("e")).count()
    println(s"""{"mismatches":$eq}""")
    spark.stop()
  }
}

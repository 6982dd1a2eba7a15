package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.VectorOps

/** Iteration-cost guard for Lloyd's loop: 20+ rounds on a synthetic corpus
  * must run in flat per-round time. Bare `localCheckpoint` chains
  * `originStats` through each round's joins (digit count growing with the
  * round number — the exact failure ClusterOps.flatten exists for), which
  * shows up here as late rounds dwarfing early ones. The probe fails if
  * that regression returns.
  */
class KmScaleProbe extends AnyFunSuite {
  import SparkTestSession._

  test("kmeans rounds stay flat through 20 iterations") {
    val dims = 8
    val corpus = spark.range(0L, 2000L).toDF("id")
      .withColumn("vec", transform(sequence(lit(0), lit(dims - 1)),
        d => pmod(xxhash64(col("id"), d), lit(1000L)).cast("double") / 1000.0))
    val seeds = corpus.filter(col("id") < 8)
      .select(col("id").as("cid"), col("vec").as("cvec"))

    var cents = seeds
    val roundSecs = (0 until 20).map { _ =>
      val t0 = System.nanoTime()
      cents = VectorOps.kmeansCentroids(corpus, cents, 1)
      cents.count()
      (System.nanoTime() - t0) / 1e9
    }
    val early = roundSecs.take(5).sorted.apply(2) // median of first 5
    val lateMax = roundSecs.takeRight(5).max
    assert(lateMax < early * 6 + 1.0,
      s"late rounds regressed: $roundSecs")
    assert(cents.count() > 0)
  }
}

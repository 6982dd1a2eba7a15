package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SketchOps

/** KMV distinct-count sketch: exact below k, accurate above it, and
  * partition-order independent (the property that makes it oracle-checkable
  * where HLL is not).
  */
class SketchSpec extends AnyFunSuite {
  import SparkTestSession._

  test("exact branch: groups with fewer than k distinct values") {
    val df = spark.range(0L, 1000L).toDF("v")
      .withColumn("key", col("v") % 4L)
      .withColumn("dup", explode(sequence(lit(0), lit(2)))) // 3x duplicates
    val r = df.groupBy(col("key"))
      .agg(SketchOps.kmvDistinct(col("v"), k = 512).as("est"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // 250 distinct per key < k=512: estimate IS the exact distinct count
    assert(r.values.forall(_ == 250.0), r)
  }

  test("count-min never undercounts, is exact at ample width, and is " +
      "partition-order independent") {
    val toks = Tables.documents(spark, sf).filter(col("doc_id") < 100)
      .select(explode(graft.ops.TextOps.tokensCol(col("text"))).as("item"))
    val exact = toks.groupBy("item").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def estimates(width: Int, parts: Int): Map[String, Long] = {
      val sk = SketchOps.cmSketch(toks.repartition(parts), "item", 3, width)
      SketchOps.cmEstimate(sk, toks.distinct(), "item")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    // narrow sketch: overestimates allowed, undercounts never
    val narrow = estimates(16, 4)
    assert(narrow.keySet == exact.keySet)
    assert(narrow.forall { case (t, e) => e >= exact(t) },
      narrow.filter { case (t, e) => e < exact(t) })
    assert(narrow.exists { case (t, e) => e > exact(t) },
      "width 16 should actually collide on this fixture")
    // counters are sums: the sketch is identical under any partitioning
    assert(estimates(16, 1) == narrow && estimates(16, 16) == narrow)
    // ample width: every estimate collapses to the exact count
    val wide = estimates(1 << 14, 4)
    assert(wide.forall { case (t, e) => e == exact(t) },
      wide.filter { case (t, e) => e != exact(t) }.take(5))
  }

  test("estimation branch: within KMV error bounds, reproducible across partitionings") {
    val n = 20000L
    val df = spark.range(0L, n).toDF("v").withColumn("key", lit(1L))
    def est(parts: Int): Double =
      df.repartition(parts).groupBy(col("key"))
        .agg(SketchOps.kmvDistinct(col("v"), k = 64).as("est"))
        .head().getDouble(1)
    val e8 = est(8)
    // stderr ~ 1/sqrt(k-2) ~ 12.7%; assert a generous 4-sigma band
    assert(math.abs(e8 - n) / n < 0.5, s"estimate $e8 for $n")
    // merge order must not matter: different partitionings, same estimate
    assert(est(1) == e8 && est(32) == e8)
  }
}

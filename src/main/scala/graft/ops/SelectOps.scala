package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact distributed order statistics — the kth smallest element of a
  * long column without a global sort.
  *
  * The built-in exact `percentile` is an object aggregate that buffers
  * every value in one executor's memory, and a `row_number() OVER
  * (ORDER BY v)` rank is a single-partition sort of the corpus: both
  * are scale-killers at 100 TB. The sampled quantiles
  * ([[SketchOps]]) bound error probabilistically; this operator is the
  * EXACT complement for when the number must be right (billing
  * cutoffs, SLA percentiles, dataset split thresholds).
  *
  * Shape: radix bisection over the value domain. Values map to
  * unsigned order by flipping the sign bit; three histogram passes
  * (21 + 21 + 22 bits) narrow each requested rank to its bucket, then
  * to its exact value. Every pass is one `groupBy(bucket).count()` —
  * a shuffle of BUCKET COUNTS (≤2^21 rows per active prefix), never of
  * data — and the driver walks the sorted histogram to split ranks
  * into residuals. Work: ≤3 column-pruned scans of the input
  * regardless of size; driver memory is bounded by the histogram
  * width, independent of row count. No sort, no per-group buffering,
  * no value ever collected except the answers.
  */
object SelectOps {

  /** The kth (1-indexed) smallest values of `valueCol` for every k in
    * `ks`, as k → value. Nulls are excluded (SQL aggregate
    * convention); requires 1 <= k <= count of non-null rows.
    */
  def kthSmallestLong(df: DataFrame, valueCol: String,
      ks: Seq[Long]): Map[Long, Long] = {
    require(ks.nonEmpty, "no ranks requested")
    // sign-bit flip: unsigned order of u == signed order of v
    val u = df.select(col(valueCol).cast("long")
      .bitwiseXOR(lit(Long.MinValue)).as("u"))
      .filter(col("u").isNotNull)

    // (prefix value, prefix shift, ranks within this prefix as k→resid)
    var groups: Seq[(Long, Int, Seq[(Long, Long)])] =
      Seq((0L, 64, ks.distinct.map(k => k -> k)))
    var answers = Map.empty[Long, Long]

    for (shift <- Seq(43, 22, 0) if groups.nonEmpty) {
      val pruned =
        if (groups.exists(_._2 >= 64)) u
        else u.filter(groups.map { case (p, ps, _) =>
          shiftrightunsigned(col("u"), ps) === lit(p)
        }.reduce(_ || _))
      val counts = pruned
        .groupBy(shiftrightunsigned(col("u"), shift).as("b"))
        .agg(count(lit(1)).as("c"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .sortWith((a, b) => java.lang.Long.compareUnsigned(a._1, b._1) < 0)

      groups = groups.flatMap { case (prefix, pShift, ranks) =>
        val mine =
          if (pShift >= 64) counts
          else counts.filter { case (b, _) => (b >>> (pShift - shift)) == prefix }
        var seen = 0L
        var remaining = ranks.sortBy(_._2)
        val next = scala.collection.mutable.Map
          .empty[Long, scala.collection.mutable.ListBuffer[(Long, Long)]]
        for ((b, c) <- mine if remaining.nonEmpty) {
          val (inB, after) = remaining.partition(r =>
            r._2 > seen && r._2 <= seen + c)
          inB.foreach { case (k, r) =>
            if (shift == 0) answers += k -> (b ^ Long.MinValue)
            else next.getOrElseUpdate(b,
              scala.collection.mutable.ListBuffer()) += (k -> (r - seen))
          }
          remaining = after
          seen += c
        }
        require(remaining.isEmpty,
          s"rank out of range: ${remaining.map(_._1).mkString(",")} " +
            s"(only $seen rows in scope)")
        next.toSeq.map { case (b, rs) => (b, shift, rs.toSeq) }
      }
    }
    answers
  }

  /** Exact integer percentiles as a small result frame (p, rank, value):
    * rank = max(1, ⌈p·n/100⌉), computed with integer arithmetic only —
    * `ceil(0.9 * n)` in IEEE doubles can land one past the true rank,
    * and a rank that differs by one between engines is an oracle
    * mismatch, so no doubles are involved anywhere.
    */
  def exactPercentilesLong(df: DataFrame, valueCol: String,
      ps: Seq[Int]): DataFrame = {
    require(ps.forall(p => p >= 0 && p <= 100), s"percentiles ∈ [0,100]: $ps")
    val spark = df.sparkSession
    val n = df.filter(col(valueCol).isNotNull).count()
    require(n > 0, "exact percentiles of an empty input")
    val ranks = ps.distinct.map(p => p -> math.max(1L, (p * n + 99L) / 100L))
    val byK = kthSmallestLong(df, valueCol, ranks.map(_._2))
    val rows = ranks.sortBy(_._1).map { case (p, k) => Row(p, k, byK(k)) }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava),
      StructType(Seq(StructField("p", IntegerType, nullable = false),
        StructField("rank", LongType, nullable = false),
        StructField("value", LongType, nullable = false))))
  }
}

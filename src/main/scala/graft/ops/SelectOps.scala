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
      ks: Seq[Long]): Map[Long, Long] =
    kthSmallestLongByGroup(df.withColumn("__g", lit(1)), "__g", valueCol,
      Map(1 -> ks))(1)

  /** The grouped kernel: per group key, the kth smallest values for
    * that group's requested ranks — ALL groups resolved in the same
    * ≤3 histogram passes (`groupBy(group, bucket).count()`), not a
    * scan per group. Driver memory: Σ active-prefix histogram widths.
    * Group keys must be non-null (filter first; a null group has no
    * SQL grouping identity here).
    */
  def kthSmallestLongByGroup[G](df: DataFrame, groupCol: String,
      valueCol: String, ks: Map[G, Seq[Long]]): Map[G, Map[Long, Long]] = {
    require(ks.nonEmpty && ks.values.forall(_.nonEmpty), "no ranks requested")
    // sign-bit flip: unsigned order of u == signed order of v
    val u = df.select(col(groupCol).as("g"), col(valueCol).cast("long")
      .bitwiseXOR(lit(Long.MinValue)).as("u"))
      .filter(col("u").isNotNull && col("g").isNotNull)

    // (group, prefix value, prefix shift, ranks in prefix as k→resid)
    var groups: Seq[(G, Long, Int, Seq[(Long, Long)])] =
      ks.toSeq.map { case (g, gks) =>
        (g, 0L, 64, gks.distinct.map(k => k -> k))
      }
    var answers = Map.empty[G, Map[Long, Long]]
      .withDefaultValue(Map.empty)

    for (shift <- Seq(43, 22, 0) if groups.nonEmpty) {
      val pruned =
        if (groups.exists(_._3 >= 64)) u
        else u.filter(groups.map { case (g, p, ps, _) =>
          col("g") === lit(g) && shiftrightunsigned(col("u"), ps) === lit(p)
        }.reduce(_ || _))
      val counts = pruned
        .groupBy(col("g"), shiftrightunsigned(col("u"), shift).as("b"))
        .agg(count(lit(1)).as("c"))
        .collect()
        .map(r => (r.get(0), r.getLong(1), r.getLong(2)))
        .sortWith((a, b) => java.lang.Long.compareUnsigned(a._2, b._2) < 0)

      groups = groups.flatMap { case (g, prefix, pShift, ranks) =>
        val mine = counts.filter { case (cg, b, _) =>
          cg == g && (pShift >= 64 || (b >>> (pShift - shift)) == prefix)
        }
        var seen = 0L
        var remaining = ranks.sortBy(_._2)
        val next = scala.collection.mutable.Map
          .empty[Long, scala.collection.mutable.ListBuffer[(Long, Long)]]
        for ((_, b, c) <- mine if remaining.nonEmpty) {
          val (inB, after) = remaining.partition(r =>
            r._2 > seen && r._2 <= seen + c)
          inB.foreach { case (k, r) =>
            if (shift == 0)
              answers += g -> (answers(g) + (k -> (b ^ Long.MinValue)))
            else next.getOrElseUpdate(b,
              scala.collection.mutable.ListBuffer()) += (k -> (r - seen))
          }
          remaining = after
          seen += c
        }
        require(remaining.isEmpty,
          s"rank out of range for group $g: " +
            s"${remaining.map(_._1).mkString(",")} (only $seen rows in scope)")
        next.toSeq.map { case (b, rs) => (g, b, shift, rs.toSeq) }
      }
    }
    answers
  }

  /** Per-group exact percentiles (group, p, rank, value) — every group
    * resolved in the same three passes; the group-count pass that
    * derives ranks is the only extra job. rank = max(1, ⌈p·n/100⌉),
    * computed with integer arithmetic only — `ceil(0.9 * n)` in IEEE
    * doubles can land one past the true rank, and a rank that differs
    * by one between engines is an oracle mismatch, so no doubles are
    * involved anywhere.
    */
  def exactPercentilesLongByGroup(df: DataFrame, groupCol: String,
      valueCol: String, ps: Seq[Int]): DataFrame = {
    require(ps.forall(p => p >= 0 && p <= 100), s"percentiles ∈ [0,100]: $ps")
    val spark = df.sparkSession
    val ns = df.filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(col(groupCol)).count()
      .collect().map(r => r.get(0) -> r.getLong(1)).toMap
    require(ns.nonEmpty, "exact percentiles of an empty input")
    val ranksPer = ns.map { case (g, n) =>
      g -> ps.distinct.map(p => p -> math.max(1L, (p * n + 99L) / 100L))
    }
    val byG = kthSmallestLongByGroup(df, groupCol, valueCol,
      ranksPer.map { case (g, prs) => g -> prs.map(_._2) })
    val rows = (for {
      (g, prs) <- ranksPer.toSeq
      (p, k) <- prs
    } yield Row(g, p, k, byG(g)(k))).sortBy(r => (r.get(0).toString, r.getInt(1)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava),
      StructType(Seq(
        StructField(groupCol, df.schema(groupCol).dataType, nullable = true),
        StructField("p", IntegerType, nullable = false),
        StructField("rank", LongType, nullable = false),
        StructField("value", LongType, nullable = false))))
  }

  /** Exact selection over DOUBLE columns: the values ride through
    * [[graft.functions.OrderBits]]'s IEEE order-preserving bits
    * transform (codegen'd, two long ops), the long kernel runs
    * unchanged, and the winning longs map bijectively back to the
    * exact doubles they came from — so the reported percentile is
    * bit-identical to a value in the data, never an interpolation.
    * NaN sorts above +∞ on both engines; nulls are excluded.
    */
  def kthSmallestDouble(df: DataFrame, valueCol: String,
      ks: Seq[Long]): Map[Long, Double] =
    kthSmallestLong(
      df.select(graft.functions.OrderBits.toBitsCol(col(valueCol))
        .as(valueCol)),
      valueCol, ks)
      .map { case (k, v) => k -> graft.functions.OrderBits.fromBits(v) }

  /** (p, rank, value) percentiles of a double column — integer rank
    * rule, exact data values out.
    */
  def exactPercentilesDouble(df: DataFrame, valueCol: String,
      ps: Seq[Int]): DataFrame =
    percentileFrame(df, valueCol, ps, DoubleType,
      ks => kthSmallestDouble(df, valueCol, ks))

  /** Ungrouped form: (p, rank, value) with the same integer rank rule. */
  def exactPercentilesLong(df: DataFrame, valueCol: String,
      ps: Seq[Int]): DataFrame =
    percentileFrame(df, valueCol, ps, LongType,
      ks => kthSmallestLong(df, valueCol, ks))

  /** The one place the rank rule and the (p, rank, value) frame are
    * assembled — long and double forms must never drift apart on
    * either.
    */
  private def percentileFrame(df: DataFrame, valueCol: String,
      ps: Seq[Int], valueType: DataType,
      kth: Seq[Long] => Map[Long, _]): DataFrame = {
    require(ps.forall(p => p >= 0 && p <= 100), s"percentiles ∈ [0,100]: $ps")
    val spark = df.sparkSession
    val n = df.filter(col(valueCol).isNotNull).count()
    require(n > 0, "exact percentiles of an empty input")
    val ranks = ps.distinct.map(p => p -> math.max(1L, (p * n + 99L) / 100L))
    val byK = kth(ranks.map(_._2))
    val rows = ranks.sortBy(_._1).map { case (p, k) => Row(p, k, byK(k)) }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava),
      StructType(Seq(StructField("p", IntegerType, nullable = false),
        StructField("rank", LongType, nullable = false),
        StructField("value", valueType, nullable = false))))
  }
}

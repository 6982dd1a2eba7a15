package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact distributed order statistics — the kth smallest element of a
  * long or double column without a global sort.
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
  * unsigned order by flipping the sign bit (doubles first ride the
  * bijective IEEE order-bits transform, [[graft.functions.OrderBits]]);
  * a handful of histogram passes narrow each requested rank to its
  * bucket, then to its exact value. Every pass is one
  * `groupBy(group, bucket).count()` — a shuffle of BUCKET COUNTS,
  * never of data — and the driver walks the per-(group, prefix)
  * histograms to split ranks into residuals. Between passes the input
  * is pruned with a BROADCAST SEMI-JOIN against the tiny frame of
  * still-active (group, prefix) pairs — one row per unresolved
  * branch — never a synthesized literal predicate, so 10⁵-group
  * requests cost a small-side broadcast, not a 10⁵-term analysis-time
  * OR-chain.
  *
  * Driver memory is the only non-distributed state and it is bounded
  * by construction: pass widths ADAPT to the group count so the
  * worst-case per-pass histogram stays ≤ 2^24 (group, bucket) count
  * pairs — more groups buys narrower (more numerous) passes, e.g.
  * ≤4 groups → 3 scans of 22-bit buckets; 10⁴ groups → 7 scans of
  * ≤10-bit buckets — and beyond [[GroupsPerRound]] groups the group
  * set is processed in bounded ROUNDS (each a full pass set over its
  * slice of groups, the input scan pruned to the slice by the same
  * broadcast semi-join), so the heap bound holds all the way to
  * [[MaxGroups]] at the honest price of more scans, never more
  * driver memory. Work is O(passes · rounds) column-pruned scans of
  * the input regardless of row count; no sort, no per-group
  * buffering, no value ever collected except the answers.
  */
object SelectOps {

  /** Hard cap on distinct groups per request: each group costs a few
    * driver-side map entries (its ranks, residuals, and one output row
    * per percentile), so the driver footprint is O(groups), not O(rows).
    * 2^21 groups ≈ hundreds of MB of driver maps — beyond that the
    * per-group answer set itself is big data and belongs in a frame
    * (use [[SketchOps.sampledQuantiles]] or aggregate first).
    */
  val MaxGroups: Int = 1 << 21

  private val integralTypes: Set[DataType] =
    Set(ByteType, ShortType, IntegerType, LongType)

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
    * histogram passes (`groupBy(group, bucket).count()`), not a scan
    * per group. Group keys must be non-null (filter first; a null
    * group has no SQL grouping identity here).
    *
    * The value column must be integral (byte/short/int/long): a double
    * silently truncated by a long cast would return wrong order
    * statistics without error, so floating-point columns are refused
    * here — use [[kthSmallestDoubleByGroup]], which preserves exact
    * IEEE order.
    */
  def kthSmallestLongByGroup[G](df: DataFrame, groupCol: String,
      valueCol: String, ks: Map[G, Seq[Long]]): Map[G, Map[Long, Long]] = {
    val vt = df.schema(valueCol).dataType
    require(integralTypes.contains(vt),
      s"kthSmallestLongByGroup requires an integral value column; " +
        s"'$valueCol' is $vt — use kthSmallestDoubleByGroup for " +
        "floating-point columns (exact IEEE order, no truncation)")
    // sign-bit flip: unsigned order of u == signed order of v
    val u = df.select(col(groupCol).as("g"), col(valueCol).cast("long")
      .bitwiseXOR(lit(Long.MinValue)).as("u"))
      .filter(col("u").isNotNull && col("g").isNotNull)
    selectBits(u, ks, df.schema(groupCol).dataType)
      .map { case (g, m) =>
        g -> m.map { case (k, b) => k -> (b ^ Long.MinValue) }
      }
  }

  /** Grouped exact selection over DOUBLE (or float) columns: values
    * ride [[graft.functions.OrderBits]]'s order-preserving bits
    * transform (codegen'd, two long ops), the long kernel runs
    * unchanged, and the winning longs map bijectively back to the
    * exact doubles they came from — the reported value is always a
    * datum, never an interpolation. NaN sorts above +∞ on both
    * engines; nulls are excluded. Floats widen exactly to doubles, so
    * 32-bit columns share the path.
    */
  def kthSmallestDoubleByGroup[G](df: DataFrame, groupCol: String,
      valueCol: String, ks: Map[G, Seq[Long]]): Map[G, Map[Long, Double]] = {
    val vt = df.schema(valueCol).dataType
    require(vt == DoubleType || vt == FloatType,
      s"kthSmallestDoubleByGroup requires a double/float value column; " +
        s"'$valueCol' is $vt")
    val u = df.select(col(groupCol).as("g"),
      graft.functions.OrderBits.toBitsCol(col(valueCol).cast("double"))
        .bitwiseXOR(lit(Long.MinValue)).as("u"))
      .filter(col("u").isNotNull && col("g").isNotNull)
    selectBits(u, ks, df.schema(groupCol).dataType)
      .map { case (g, m) =>
        g -> m.map { case (k, b) =>
          k -> graft.functions.OrderBits.fromBits(b ^ Long.MinValue)
        }
      }
  }

  /** Groups resolved per round: 2^15 · 2^8 (minimum width) = 2^23
    * histogram rows worst case, inside the 2^24-pair budget at
    * width = bits + 1. Requests beyond this split into rounds —
    * more scans, never more driver heap.
    */
  val GroupsPerRound: Int = 1 << 15

  /** The shared bisection kernel over a pre-encoded frame
    * `(g, u: long)` where UNSIGNED order of `u` is the value order.
    * Returns g → (k → winning u). See the object doc for the pass
    * plan, pruning shape, and round split.
    */
  private def selectBits[G](uIn: DataFrame, ks: Map[G, Seq[Long]],
      gType: DataType): Map[G, Map[Long, Long]] = {
    require(ks.nonEmpty && ks.values.forall(_.nonEmpty), "no ranks requested")
    require(ks.size <= MaxGroups,
      s"${ks.size} groups exceeds MaxGroups=$MaxGroups — driver state is " +
        "O(groups); aggregate or sample beyond this")
    if (ks.size <= GroupsPerRound) selectBitsRound(uIn, ks, gType)
    else ks.toSeq.grouped(GroupsPerRound)
      .map(chunk => selectBitsRound(uIn, chunk.toMap, gType))
      .reduce(_ ++ _)
  }

  private def integralBox(g: Any): Option[Long] = g match {
    case b: java.lang.Byte    => Some(b.longValue)
    case s: java.lang.Short   => Some(s.longValue)
    case i: java.lang.Integer => Some(i.longValue)
    case l: java.lang.Long    => Some(l.longValue)
    case _ => None
  }

  /** Caller group keys normalized to the group column's EXTERNAL type:
    * `Map(5 -> …)` (a Scala Int) against a LongType column must equal
    * the collected `java.lang.Long(5)` — without this the broadcast
    * frame fails with an obscure "not a valid external type" encoder
    * error, or worse, the histogram lookup misses every group and dies
    * with a misleading "rank out of range … only 0 rows in scope".
    * Integral keys convert EXACTLY (a lossy narrow is refused loudly);
    * all other types pass through and must already match.
    */
  private def keyNormalizer(gType: DataType): Any => Any = {
    def narrowed(to: String, fits: Long => Boolean,
        box: Long => Any): Any => Any =
      g => integralBox(g).map { n =>
        require(fits(n), s"group key $n does not fit the group column's " +
          s"$to type")
        box(n)
      }.getOrElse(g)
    gType match {
      case LongType    => g => integralBox(g).map(Long.box).getOrElse(g)
      case IntegerType =>
        narrowed("int", n => n == n.toInt, n => Int.box(n.toInt))
      case ShortType   =>
        narrowed("short", n => n == n.toShort, n => Short.box(n.toShort))
      case ByteType    =>
        narrowed("byte", n => n == n.toByte, n => Byte.box(n.toByte))
      case _ => identity
    }
  }

  private def selectBitsRound[G](uIn: DataFrame, ks: Map[G, Seq[Long]],
      gType: DataType): Map[G, Map[Long, Long]] = {
    val spark = uIn.sparkSession
    val ext = keyNormalizer(gType)

    // Adaptive pass plan: worst-case driver histogram per pass is
    // nGroups · 2^width rows; shrink the bucket width until
    // nGroups · 2^bits ≤ 2^23 (so ≤ 2^24 pairs at width = bits + 1),
    // floored at 8 bits (≤ 8 passes). GroupsPerRound caps nGroups so
    // the floor never breaks the budget.
    var bits = 21
    while (bits > 8 && (ks.size.toLong << bits) > (1L << 23)) bits -= 1
    val passes = math.ceil(64.0 / (bits + 1)).toInt
    val width = math.ceil(64.0 / passes).toInt
    val shifts = (1 until passes).map(i => 64 - i * width) :+ 0

    // active branches: (group, prefix value at prevShift, ranks as
    // k → residual-rank-within-prefix)
    var branches: Seq[(G, Long, Seq[(Long, Long)])] =
      ks.toSeq.map { case (g, gks) => (g, 0L, gks.distinct.map(k => k -> k)) }
    var prevShift = 64
    var answers = Map.empty[G, Map[Long, Long]].withDefaultValue(Map.empty)

    for (shift <- shifts if branches.nonEmpty) {
      // tiny frame of still-active (group, prefix) branches — one row
      // each; broadcast semi-join, never a synthesized OR-chain over
      // groups. Pass 1 prunes on GROUP alone, which also bounds the
      // histogram by the REQUESTED groups — without it the first
      // collect scales with the groups present in the DATA, which may
      // dwarf the request (and would break the per-round budget)
      val active = branches.map { case (g, p, _) => Row(ext(g), p) }
      val pf = spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .SeqHasAsJava(active).asJava),
        StructType(Seq(StructField("pg", gType, nullable = true),
          StructField("pp", LongType, nullable = false))))
      val joinCond =
        if (prevShift >= 64) uIn("g") === pf("pg")
        else uIn("g") === pf("pg") &&
          shiftrightunsigned(uIn("u"), prevShift) === pf("pp")
      val pruned = uIn.join(broadcast(pf), joinCond, "left_semi")
      val counts = pruned
        .groupBy(col("g"), shiftrightunsigned(col("u"), shift).as("b"))
        .agg(count(lit(1)).as("c"))
        .collect()
      // one hash-grouping of the histogram by (group, prefix) — each
      // branch then reads only its own sorted slice (no per-branch
      // rescan of the full histogram)
      val pShift = prevShift
      val byBranch: Map[(Any, Long), Array[(Long, Long)]] = counts
        .map(r => (r.get(0), r.getLong(1), r.getLong(2)))
        .groupBy { case (g, b, _) =>
          (g, if (pShift >= 64) 0L else b >>> (pShift - shift))
        }
        .map { case (key, rs) =>
          key -> rs.map { case (_, b, c) => (b, c) }
            .sortWith((a, b) => java.lang.Long.compareUnsigned(a._1, b._1) < 0)
        }

      branches = branches.flatMap { case (g, prefix, ranks) =>
        val mine = byBranch.getOrElse(
          (ext(g), if (pShift >= 64) 0L else prefix),
          Array.empty[(Long, Long)])
        var seen = 0L
        var remaining = ranks.sortBy(_._2)
        val next = scala.collection.mutable.Map
          .empty[Long, scala.collection.mutable.ListBuffer[(Long, Long)]]
        for ((b, c) <- mine if remaining.nonEmpty) {
          val (inB, after) = remaining.partition(r =>
            r._2 > seen && r._2 <= seen + c)
          inB.foreach { case (k, r) =>
            if (shift == 0) answers += g -> (answers(g) + (k -> b))
            else next.getOrElseUpdate(b,
              scala.collection.mutable.ListBuffer()) += (k -> (r - seen))
          }
          remaining = after
          seen += c
        }
        require(remaining.isEmpty,
          s"rank out of range for group $g: " +
            s"${remaining.map(_._1).mkString(",")} (only $seen rows in scope)")
        next.toSeq.map { case (b, rs) => (g, b, rs.toSeq) }
      }
      prevShift = shift
    }
    answers
  }

  /** Per-group exact percentiles (group, p, rank, value) — every group
    * resolved in the same shared passes; the group-count pass that
    * derives ranks is the only extra job. rank = max(1, ⌈p·n/100⌉),
    * computed with integer arithmetic only — `ceil(0.9 * n)` in IEEE
    * doubles can land one past the true rank, and a rank that differs
    * by one between engines is an oracle mismatch, so no doubles are
    * involved anywhere.
    */
  def exactPercentilesLongByGroup(df: DataFrame, groupCol: String,
      valueCol: String, ps: Seq[Int]): DataFrame =
    groupedPercentileFrame(df, groupCol, valueCol, ps, LongType,
      rk => kthSmallestLongByGroup(df, groupCol, valueCol, rk)
        .map { case (g, m) => g -> m.map { case (k, v) => k -> (v: Any) } })

  /** Per-group exact DOUBLE percentiles — the grouped kernel composed
    * with the order-bits transform; same integer rank rule, exact data
    * values out.
    */
  def exactPercentilesDoubleByGroup(df: DataFrame, groupCol: String,
      valueCol: String, ps: Seq[Int]): DataFrame =
    groupedPercentileFrame(df, groupCol, valueCol, ps, DoubleType,
      rk => kthSmallestDoubleByGroup(df, groupCol, valueCol, rk)
        .map { case (g, m) => g -> m.map { case (k, v) => k -> (v: Any) } })

  /** Exact selection over DOUBLE columns (ungrouped form). */
  def kthSmallestDouble(df: DataFrame, valueCol: String,
      ks: Seq[Long]): Map[Long, Double] =
    kthSmallestDoubleByGroup(df.withColumn("__g", lit(1)), "__g", valueCol,
      Map(1 -> ks))(1)

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

  /** Natural order on collected group keys: external Spark types are
    * Comparable (String, boxed numerics, Date/Timestamp), so 9 < 10
    * for numeric keys — never the `toString` order that put "10"
    * before "9". Mixed/exotic key classes fall back to string order
    * (output order only; values are unaffected).
    */
  private val groupOrdering: Ordering[Any] = new Ordering[Any] {
    def compare(a: Any, b: Any): Int = (a, b) match {
      case (x: java.lang.Comparable[_], y)
          if y != null && x.getClass == y.getClass =>
        x.asInstanceOf[java.lang.Comparable[Any]].compareTo(y)
      case _ => String.valueOf(a).compareTo(String.valueOf(b))
    }
  }

  /** The one place the grouped rank rule and the (group, p, rank,
    * value) frame are assembled — long and double forms must never
    * drift apart. Driver state here is O(groups): one count row, a
    * ranks seq, and |ps| output rows per group (bounded by
    * [[MaxGroups]] inside the kernel).
    */
  private def groupedPercentileFrame(df: DataFrame, groupCol: String,
      valueCol: String, ps: Seq[Int], valueType: DataType,
      kth: Map[Any, Seq[Long]] => Map[Any, Map[Long, Any]]): DataFrame = {
    require(ps.forall(p => p >= 0 && p <= 100), s"percentiles ∈ [0,100]: $ps")
    val spark = df.sparkSession
    val ns = df.filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(col(groupCol)).count()
      .collect().map(r => (r.get(0): Any) -> r.getLong(1)).toMap
    require(ns.nonEmpty, "exact percentiles of an empty input")
    val ranksPer = ns.map { case (g, n) =>
      g -> ps.distinct.map(p => p -> math.max(1L, (p * n + 99L) / 100L))
    }
    val byG = kth(ranksPer.map { case (g, prs) => g -> prs.map(_._2) })
    val rows = (for {
      (g, prs) <- ranksPer.toSeq
      (p, k) <- prs
    } yield Row(g, p, k, byG(g)(k)))
      .sortBy(r => (r.get(0), r.getInt(1)))(
        Ordering.Tuple2(groupOrdering, Ordering.Int))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava),
      StructType(Seq(
        StructField(groupCol, df.schema(groupCol).dataType, nullable = true),
        StructField("p", IntegerType, nullable = false),
        StructField("rank", LongType, nullable = false),
        StructField("value", valueType, nullable = false))))
  }

  /** Ungrouped frame assembly — same rank rule, no group column. */
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

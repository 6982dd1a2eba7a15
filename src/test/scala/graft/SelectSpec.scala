package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SelectOps

/** Exact order statistics (radix bisection) against the sorted ground
  * truth: adversarial value sets (negatives, Long extremes, heavy
  * ties, single element), every rank, null exclusion, out-of-range
  * ranks refused, and the gate's integer rank rule.
  */
class SelectSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def check(vs: Seq[Long], ks: Seq[Long]): Unit = {
    val got = SelectOps.kthSmallestLong(vs.toDF("v"), "v", ks)
    val sorted = vs.sorted
    ks.foreach(k => assert(got(k) == sorted((k - 1).toInt),
      s"k=$k of $vs: got ${got(k)}, want ${sorted((k - 1).toInt)}"))
  }

  test("every rank of an adversarial value set matches the sorted truth") {
    val vs = Seq(Long.MinValue, Long.MinValue + 1, -7L, -7L, -1L, 0L, 0L,
      0L, 1L, 42L, 42L, 1L << 45, Long.MaxValue - 1, Long.MaxValue)
    check(vs, 1L to vs.length.toLong)
    check(Seq(5L), Seq(1L))
    check(Seq.fill(100)(3L), Seq(1L, 50L, 100L)) // all-ties
  }

  test("randomized cross-check, bucket-boundary-heavy values") {
    val rnd = new scala.util.Random(7)
    // values clustered AT the 21/42-bit radix boundaries, where an
    // off-by-one in the prefix walk would misattribute whole buckets
    val vs = Seq.fill(500)(rnd.nextLong()) ++
      Seq.fill(200)((rnd.nextInt(4).toLong - 2L) << 43) ++
      Seq.fill(200)((rnd.nextInt(4).toLong - 2L) << 22) ++
      Seq.fill(100)(rnd.nextInt(16).toLong - 8L)
    check(vs, Seq(1L, 2L, 499L, 500L, 501L, 999L, 1000L))
  }

  test("nulls are excluded; out-of-range ranks are refused") {
    val df = Seq(Some(10L), None, Some(20L), None, Some(30L))
      .toDF("v")
    assert(SelectOps.kthSmallestLong(df, "v", Seq(3L))(3L) == 30L)
    intercept[IllegalArgumentException] {
      SelectOps.kthSmallestLong(df, "v", Seq(4L))
    }
  }

  test("exact percentiles: integer rank rule, endpoints are min and max") {
    val vs = (1L to 1000L).map(i => i * 3)
    val out = SelectOps.exactPercentilesLong(vs.toDF("v"), "v",
        Seq(1, 50, 90, 99, 100))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1) == (10L, 30L))       // ceil(1*1000/100)=10 → 10th = 30
    assert(out(50) == (500L, 1500L))
    assert(out(100) == (1000L, 3000L)) // max
    assert(out(99) == (990L, 2970L))
  }

  test("grouped kernel: per-group answers equal per-group sorted truth, " +
      "one shared pass set") {
    val rnd = new scala.util.Random(11)
    val data = (for (g <- Seq("a", "b", "c"); _ <- 1 to 300)
      yield (g, rnd.nextLong() >> rnd.nextInt(40))).toSeq
    val df = data.toDF("g", "v")
    val ks = Map("a" -> Seq(1L, 150L, 300L), "b" -> Seq(7L), "c" -> Seq(299L))
    val got = SelectOps.kthSmallestLongByGroup(df, "g", "v", ks)
    for ((g, gks) <- ks; k <- gks) {
      val sorted = data.filter(_._1 == g).map(_._2).sorted
      assert(got(g)(k) == sorted((k - 1).toInt), s"group $g k=$k")
    }
    // a rank past one group's size must name THAT group in the error
    val err = intercept[IllegalArgumentException] {
      SelectOps.kthSmallestLongByGroup(df, "g", "v", Map("b" -> Seq(301L)))
    }
    assert(err.getMessage.contains("group b"))
  }

  test("gate sk_exact_pct_group: per-source p99 bounded by that source's max") {
    val got = graft.queries.TrainingQueries
      .registry("sk_exact_pct_group")(spark, sf)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(3)))
    val maxes = Tables.documents(spark, sf)
      .groupBy(col("source")).agg(max(col("n_chars").cast("long")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty && maxes.size > 1)
    got.foreach { case (src, _, v) => assert(v <= maxes(src), src) }
    // within a source, values monotone in p
    got.groupBy(_._1).values.foreach { rows =>
      val vs = rows.sortBy(_._2).map(_._3)
      assert(vs.sameElements(vs.sorted))
    }
  }

  test("double selection: order-bits round-trip, IEEE edge values, " +
      "sorted-truth equality") {
    import graft.functions.OrderBits
    // the transform is a bijection that preserves order on edge values
    val edge = Seq(Double.NegativeInfinity, -1.7e308, -2.5, -Double.MinPositiveValue,
      -0.0, 0.0, Double.MinPositiveValue, 1.0, 2.5, 1.7e308,
      Double.PositiveInfinity)
    edge.foreach(d => assert(OrderBits.fromBits(OrderBits.toBits(d)) == d ||
      (d.isNaN && OrderBits.fromBits(OrderBits.toBits(d)).isNaN)))
    edge.sliding(2).foreach { case Seq(a, b) =>
      assert(OrderBits.toBits(a) < OrderBits.toBits(b), s"$a !< $b")
    case _ => }
    assert(OrderBits.toBits(Double.NaN) > OrderBits.toBits(Double.PositiveInfinity))
    // a NEGATIVE-payload NaN (legal in foreign parquet) must canonicalize
    // and still sort above +∞, not below -∞ as raw bits would put it
    val negNaN = java.lang.Double.longBitsToDouble(0xFFF8000000000000L)
    assert(OrderBits.toBits(negNaN) == OrderBits.toBits(Double.NaN))
    val poisoned = SelectOps.kthSmallestDouble(
      Seq(1.0, 2.0, negNaN).toDF("v"), "v", Seq(1L, 3L))
    assert(poisoned(1L) == 1.0 && poisoned(3L).isNaN)

    val rnd = new scala.util.Random(13)
    val vs = Seq.fill(400)(rnd.nextGaussian() * math.pow(10, rnd.nextInt(8) - 4)) ++
      Seq(-0.0, 0.0, Double.NegativeInfinity, Double.PositiveInfinity)
    val got = SelectOps.kthSmallestDouble(vs.toDF("v"), "v",
      Seq(1L, 7L, 200L, 404L))
    val sorted = vs.sorted
    Seq(1L, 7L, 200L, 404L).foreach { k =>
      val want = sorted((k - 1).toInt)
      assert(got(k) == want ||
        java.lang.Double.doubleToRawLongBits(got(k)) ==
          java.lang.Double.doubleToRawLongBits(want), s"k=$k")
    }
  }

  test("grouped doubles: per-group answers equal per-group sorted truth; " +
      "type-aware output order puts group 9 before 10") {
    val rnd = new scala.util.Random(17)
    val data = (for (g <- Seq(2L, 9L, 10L); _ <- 1 to 200)
      yield (g, rnd.nextGaussian() * math.pow(10, rnd.nextInt(6) - 3))).toSeq
    val df = data.toDF("g", "v")
    val ks = Map(2L -> Seq(1L, 100L, 200L), 9L -> Seq(37L), 10L -> Seq(199L))
    val got = SelectOps.kthSmallestDoubleByGroup(df, "g", "v", ks)
    for ((g, gks) <- ks; k <- gks) {
      val sorted = data.filter(_._1 == g).map(_._2).sorted
      assert(got(g)(k) == sorted((k - 1).toInt), s"group $g k=$k")
    }
    // numeric group keys order numerically in the assembled frame
    val frame = SelectOps.exactPercentilesDoubleByGroup(df, "g", "v", Seq(50))
      .collect().map(_.getLong(0))
    assert(frame.sameElements(Array(2L, 9L, 10L)))
  }

  test("caller group keys coerce exactly to the column's external type") {
    // Map(5 -> …) with Scala Int keys against a LongType group column:
    // the broadcast frame and the collected histogram carry
    // java.lang.Long — without normalization the lookup misses every
    // group and dies with a misleading rank-out-of-range
    val df = Seq((5L, 10L), (5L, 20L), (9L, 7L)).toDF("g", "v")
    val got = SelectOps.kthSmallestLongByGroup(df, "g", "v",
      Map(5 -> Seq(2L), 9 -> Seq(1L))) // Int keys, LongType column
    assert(got(5)(2L) == 20L && got(9)(1L) == 7L)
    // and the reverse: Long keys against an IntegerType column
    val dfi = Seq((5, 10L), (9, 7L)).toDF("g", "v")
    val goti = SelectOps.kthSmallestLongByGroup(dfi, "g", "v",
      Map(5L -> Seq(1L), 9L -> Seq(1L)))
    assert(goti(5L)(1L) == 10L && goti(9L)(1L) == 7L)
    // a lossy narrow is refused loudly, never silently truncated
    intercept[IllegalArgumentException] {
      SelectOps.kthSmallestLongByGroup(dfi, "g", "v",
        Map((1L << 40) -> Seq(1L)))
    }
  }

  test("an integral kernel refuses a double column instead of truncating") {
    val df = Seq(("a", 1.9), ("a", 2.1)).toDF("g", "v")
    val err = intercept[IllegalArgumentException] {
      SelectOps.kthSmallestLongByGroup(df, "g", "v", Map("a" -> Seq(1L)))
    }
    assert(err.getMessage.contains("kthSmallestDoubleByGroup"))
  }

  test("10^4 groups resolve through broadcast-pruned passes, no literal " +
      "OR-chain, in bounded time") {
    val n = 10000
    // 3 rows per group, values salted per group so buckets spread
    val df = spark.range(n.toLong * 3).selectExpr(
      "id % 10000 AS g", "(id % 10000) * 1000 + (id div 10000) * 37 AS v")
    val ks = (0L until n.toLong).map(g => g -> Seq(2L)).toMap
    val t0 = System.nanoTime()
    val got = SelectOps.kthSmallestLongByGroup(df, "g", "v", ks)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(got.size == n)
    // 2nd smallest of {g*1000, g*1000+37, g*1000+74} is g*1000+37
    Seq(0L, 1L, 4999L, 9999L).foreach(g => assert(got(g)(2L) == g * 1000 + 37))
    // the old OR-chain would spend minutes in analysis; the broadcast
    // path is a handful of small jobs
    assert(secs < 120, s"10^4-group selection took $secs s")
  }

  test("gate sk_exact_pct_dbl_group: matches the window truth per event type") {
    val got = graft.queries.TrainingQueries
      .registry("sk_exact_pct_dbl_group")(spark, sf)
      .collect().map(r => ((r.getString(0), r.getInt(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    val evs = Tables.events(spark, sf)
      .filter(col("value").isNotNull && col("event_type").isNotNull)
      .select(col("event_type"), (col("value") + lit(0.0)).as("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (t, rs) => t -> rs.map(_._2).sorted }
    assert(got.nonEmpty && evs.size > 1)
    for ((t, vs) <- evs; p <- Seq(50, 90, 99)) {
      val rank = math.max(1L, (p * vs.length + 99L) / 100L)
      val (gotRank, gotV) = got((t, p))
      assert(gotRank == rank && gotV == vs((rank - 1).toInt), s"$t p$p")
    }
  }

  test("a request past GroupsPerRound splits into rounds with answers " +
      "identical to the single-round truth") {
    val n = SelectOps.GroupsPerRound + 7 // forces exactly 2 rounds
    val df = spark.range(n.toLong * 2).selectExpr(
      s"id % $n AS g", s"(id % $n) * 10 + (id div $n) * 3 AS v")
    val ks = (0L until n.toLong).map(g => g -> Seq(2L)).toMap
    val got = SelectOps.kthSmallestLongByGroup(df, "g", "v", ks)
    assert(got.size == n)
    // 2nd smallest of {g*10, g*10+3} is g*10+3 — check both rounds' ends
    Seq(0L, 1L, SelectOps.GroupsPerRound.toLong - 1L,
        SelectOps.GroupsPerRound.toLong, n.toLong - 1L)
      .foreach(g => assert(got(g)(2L) == g * 10 + 3, s"group $g"))
  }

  test("pass 1 is bounded by the REQUESTED groups, not the data's") {
    // 1M distinct data groups, 3 requested: the first histogram must
    // prune to the request (a collect scaling with the data's group
    // count would be a driver bomb on a real corpus)
    val df = spark.range(1000000L).selectExpr("id AS g", "id * 7 AS v")
    val got = SelectOps.kthSmallestLongByGroup(df, "g", "v",
      Map(5L -> Seq(1L), 99999L -> Seq(1L), 999999L -> Seq(1L)))
    assert(got(5L)(1L) == 35L && got(999999L)(1L) == 6999993L)
  }

  test("float32 columns ride the double path via exact widening") {
    val vs = Seq(1.5f, -2.25f, 0.1f, 3.75f, Float.MaxValue, -0.0f)
    val df = vs.toDF("v").select(col("v").cast("float").as("v"))
    assert(df.schema("v").dataType ==
      org.apache.spark.sql.types.FloatType)
    val got = SelectOps.kthSmallestDouble(df, "v", Seq(1L, 3L, 6L))
    val sorted = vs.map(_.toDouble).sorted
    assert(got(1L) == sorted(0) && got(3L) == sorted(2) &&
      got(6L) == sorted(5))
  }

  test("gate sk_exact_pct: p100 is the true max, ranks are monotone") {
    val got = graft.queries.TrainingQueries.registry("sk_exact_pct")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val trueMax = Tables.documents(spark, sf)
      .agg(max(col("n_chars").cast("long"))).head().getLong(0)
    assert(got.last._3 == trueMax)
    assert(got.map(_._2).sameElements(got.map(_._2).sorted))
    assert(got.map(_._3).sameElements(got.map(_._3).sorted))
  }
}

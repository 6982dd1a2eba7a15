package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TemporalOps

/** As-of join semantics on adversarial fixtures — equal-instant
  * inclusion, tie-breaking, unmatched rows, null hygiene — plus the
  * plan-shape guarantee the union+window formulation exists for: ONE
  * exchange, no candidate-pair join.
  */
class TemporalSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val views = Seq(
    // user 1: two views before the click, one exactly AT it, one after
    (1L, 10L, "2024-01-01 10:00:00"),
    (1L, 11L, "2024-01-01 10:05:00"),
    (1L, 12L, "2024-01-01 10:10:00"),
    (1L, 13L, "2024-01-01 11:00:00"),
    // user 2: only a LATER view — click must stay unmatched
    (2L, 20L, "2024-01-01 12:00:00"),
    // user 3: two views at the SAME instant — larger id must win
    (3L, 30L, "2024-01-01 09:00:00"),
    (3L, 31L, "2024-01-01 09:00:00"))
    .toDF("user_id", "view_id", "t")
    .select(col("user_id"), col("view_id"), to_timestamp(col("t")).as("view_ts"))

  private val clicks = Seq(
    (1L, 100L, "2024-01-01 10:10:00"), // equal instant: view 12 matches
    (2L, 200L, "2024-01-01 11:00:00"), // before user 2's only view
    (3L, 300L, "2024-01-01 09:30:00"), // after the tied pair
    (4L, 400L, "2024-01-01 10:00:00")) // user with no views at all
    .toDF("user_id", "click_id", "t")
    .select(col("user_id"), col("click_id"), to_timestamp(col("t")).as("click_ts"))

  private def run(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame): Map[Long, Option[Long]] =
    TemporalOps.asofJoin(l, r, "user_id", "view_ts", "click_ts", "view_id")
      .select(col("click_id"), col("matched.view_id"))
      .collect()
      .map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap

  test("as-of semantics: <= inclusion, largest-tie wins, unmatched is null") {
    val got = run(views, clicks)
    assert(got == Map(
      100L -> Some(12L), // the equal-instant view, not the 10:05 one
      200L -> None,      // a later view is NOT a prior view
      300L -> Some(31L), // tie at 09:00 → larger view_id
      400L -> None))     // no views for this user at all
  }

  test("null keys and null timestamps match nothing and break nothing") {
    val dirtyViews = views.unionByName(
      Seq((Option.empty[Long], 90L, "2024-01-01 00:00:00"))
        .toDF("user_id", "view_id", "t")
        .select(col("user_id"), col("view_id"),
          to_timestamp(col("t")).as("view_ts")))
      .unionByName(
        Seq((4L, 91L)).toDF("user_id", "view_id")
          .select(col("user_id"), col("view_id"),
            lit(null).cast("timestamp").as("view_ts")))
    val dirtyClicks = clicks.unionByName(
      Seq((Option.empty[Long], 500L, "2024-01-01 10:00:00"))
        .toDF("user_id", "click_id", "t")
        .select(col("user_id"), col("click_id"),
          to_timestamp(col("t")).as("click_ts")))
    // the null-key view must not become "earliest ever" for anyone, the
    // null-ts view must not attach to user 4, and the null-key click
    // must vanish rather than crash the window sort
    assert(run(dirtyViews, dirtyClicks) == run(views, clicks))
  }

  private def runStatic(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame): Map[Long, Option[Long]] = {
    val snap = TemporalOps.asofSnapshot(l, "user_id", "view_ts", "view_id")
    TemporalOps.asofJoinStreamStatic(r, snap, "user_id", "click_ts")
      .select(col("click_id"), col("matched.view_id"))
      .collect()
      .map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
  }

  test("snapshot + stream-static join equals asofJoin on the adversarial " +
      "fixture, dirty rows included") {
    assert(runStatic(views, clicks) == run(views, clicks))
    // same null hygiene: re-run with the dirty unions from the null test
    val dirtyViews = views.unionByName(
      Seq((4L, 91L)).toDF("user_id", "view_id")
        .select(col("user_id"), col("view_id"),
          lit(null).cast("timestamp").as("view_ts")))
    val dirtyClicks = clicks.unionByName(
      Seq((Option.empty[Long], 500L, "2024-01-01 10:00:00"))
        .toDF("user_id", "click_id", "t")
        .select(col("user_id"), col("click_id"),
          to_timestamp(col("t")).as("click_ts")))
    assert(runStatic(dirtyViews, dirtyClicks) == run(views, clicks))
    // snapshot validity intervals abut exactly: one interval per
    // surviving (key, instant), losers of the equal-instant tie dropped
    val snap = TemporalOps.asofSnapshot(views, "user_id", "view_ts", "view_id")
      .collect()
    assert(snap.count(r => r.getLong(0) == 3L) == 1) // tie collapsed
    assert(snap.forall(r => r.isNullAt(2) ||
      r.getTimestamp(1).before(r.getTimestamp(2))))
  }

  test("the stream-static shape plans an EQUALITY join with a range " +
      "residual — never a nested loop") {
    // the key equality must be extracted as the join key (hash/merge
    // join); a BNLJ here would evaluate every (right, snapshot) pair —
    // exactly the per-key cross product the snapshot form exists to avoid
    val snap = TemporalOps.asofSnapshot(views, "user_id", "view_ts",
      "view_id")
    val df = TemporalOps.asofJoinStreamStatic(clicks, snap,
      "user_id", "click_ts")
    df.collect()
    import org.apache.spark.sql.execution.joins.{
      BroadcastNestedLoopJoinExec, CartesianProductExec, BaseJoinExec}
    val all = PlanWalk.nodes(df.queryExecution.executedPlan)
    assert(!all.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]) &&
      !all.exists(_.isInstanceOf[CartesianProductExec]),
      df.queryExecution.executedPlan.toString)
    val joins = all.collect { case j: BaseJoinExec => j }
    assert(joins.nonEmpty &&
      joins.forall(_.leftKeys.nonEmpty),
      "key equality must be extracted as the join key:\n" +
        df.queryExecution.executedPlan.toString)
  }

  test("the snapshot persists as a self-identifying store and serves " +
      "identically after reload") {
    val snap = TemporalOps.asofSnapshot(views, "user_id", "view_ts",
      "view_id")
    val dir = java.nio.file.Files.createTempDirectory("graft_asof_store")
      .toString
    TemporalOps.saveSnapshot(snap, dir)
    val loaded = TemporalOps.loadSnapshot(spark, dir)
    def res(s: org.apache.spark.sql.DataFrame) =
      TemporalOps.asofJoinStreamStatic(clicks, s, "user_id", "click_ts")
        .select(col("click_id"), col("matched.view_id"))
        .collect().map(x => x.getLong(0) ->
          (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    assert(res(loaded) == run(views, clicks))
    // a non-store directory is refused, as is a non-snapshot frame
    val empty = java.nio.file.Files.createTempDirectory("graft_not_asof")
      .toString
    intercept[IllegalStateException](TemporalOps.loadSnapshot(spark, empty))
    intercept[IllegalArgumentException](TemporalOps.saveSnapshot(views, dir))
    // a newer store-format version is refused, not misread
    graft.StoreUtil.writeMarker(spark, dir, TemporalOps.SnapshotManifest,
      """{"version":2,"layout":"asof-snapshot"}""")
    val e = intercept[IllegalStateException](
      TemporalOps.loadSnapshot(spark, dir))
    assert(e.getMessage.contains("v2"), e.getMessage)
  }

  test("a frame that is not an asofSnapshot is refused") {
    intercept[IllegalArgumentException] {
      TemporalOps.asofJoinStreamStatic(clicks, views, "user_id", "click_ts")
    }
  }

  test("the plan carries ONE exchange — no join, no candidate pairs") {
    val df = TemporalOps.asofJoin(views, clicks,
      "user_id", "view_ts", "click_ts", "view_id")
    df.collect()
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val all = PlanWalk.nodes(df.queryExecution.executedPlan)
    assert(all.count(_.isInstanceOf[ShuffleExchangeLike]) == 1,
      df.queryExecution.executedPlan.toString)
    assert(!all.exists(_.isInstanceOf[BaseJoinExec]),
      "as-of must not plan a join:\n" +
        df.queryExecution.executedPlan.toString)
  }

  // ---- point-in-interval join ----

  private val ivFixture = Seq(
    (1L, "2024-01-01 10:00:00", "2024-01-01 10:30:00"), // base
    (1L, "2024-01-01 10:20:00", "2024-01-01 11:00:00"), // overlaps the base
    (1L, "2024-01-02 00:00:00", "2024-01-02 09:00:00"), // spans 36 chunks
    (2L, "2024-01-01 10:00:00", "2024-01-01 10:30:00"), // other key, same times
    (5L, "1969-12-31 23:30:00", "1970-01-01 00:30:00")) // crosses the epoch
    .toDF("user_id", "s", "e")
    .select(col("user_id"), to_timestamp(col("s")).as("st"),
      to_timestamp(col("e")).as("en"))

  private val ptFixture = Seq(
    (1L, 1000L, "2024-01-01 10:25:00"), // inside BOTH overlapping → 2 rows
    (1L, 1001L, "2024-01-01 10:00:00"), // exact start — inclusive
    (1L, 1002L, "2024-01-01 11:00:00"), // exact end — inclusive
    (1L, 1003L, "2024-01-01 12:00:00"), // outside everything → dropped
    (1L, 1004L, "2024-01-02 05:07:00"), // deep inside the long interval
    (2L, 2000L, "2024-01-01 10:25:00"), // must match key 2 only
    (3L, 3000L, "2024-01-01 10:25:00"), // key with no intervals → dropped
    (5L, 5000L, "1969-12-31 23:59:00"), // negative-micros chunk arithmetic
    (5L, 5001L, "1970-01-01 00:00:00")) // epoch-exact
    .toDF("user_id", "event_id", "t")
    .select(col("user_id"), col("event_id"), to_timestamp(col("t")).as("t"))

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.select(col("event_id"), unix_micros(col("st")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  test("point-in-interval: inclusive bounds, overlap duplication, key " +
      "scoping, epoch crossing — equal to the naive non-equi join") {
    // 15-min chunks force the long interval through 36 chunk keys
    val got = TemporalOps.pointInIntervalJoin(ptFixture, ivFixture,
      "user_id", "t", "st", "en", chunkSeconds = 900)
    val naive = ptFixture.alias("p").join(ivFixture.alias("i"),
      col("p.user_id") === col("i.user_id") &&
        col("p.t") >= col("i.st") && col("p.t") <= col("i.en"))
      .select(col("p.user_id"), col("event_id"), col("t"), col("st"), col("en"))
    assert(pairsOf(got) == pairsOf(naive))
    val matched = got.select(col("event_id")).collect().map(_.getLong(0))
    assert(matched.count(_ == 1000L) == 2) // overlap duplicates, both ways
    assert(!matched.contains(1003L) && !matched.contains(3000L))
    assert(matched.contains(5000L) && matched.contains(5001L))
  }

  test("auto-tuned chunkSeconds equals every manual setting; the width " +
      "snaps to the median span's power of two") {
    // fixture spans: 30 min, 40 min, 9 h, 30 min, 1 h → median 40 min
    // (2400 s) → next power of two 4096 s
    assert(TemporalOps.autoChunkSeconds(ivFixture, "st", "en") == 4096L)
    val auto = TemporalOps.pointInIntervalJoin(ptFixture, ivFixture,
      "user_id", "t", "st", "en")
    val manual = TemporalOps.pointInIntervalJoin(ptFixture, ivFixture,
      "user_id", "t", "st", "en", chunkSeconds = 900)
    assert(pairsOf(auto) == pairsOf(manual))
    // overlap join: auto (max of both sides) equals manual too
    val l = ivFixture
    val r = ivFixture.select(col("user_id"), col("st").as("rst"),
      col("en").as("ren"))
    def ov(df: org.apache.spark.sql.DataFrame) = df
      .select(unix_micros(col("st")), unix_micros(col("rst")))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq.sorted
    assert(ov(TemporalOps.intervalOverlapJoin(l, r, "user_id",
        "st", "en", "rst", "ren")) ==
      ov(TemporalOps.intervalOverlapJoin(l, r, "user_id",
        "st", "en", "rst", "ren", chunkSeconds = 900)))
    // degenerate interval sides fall back instead of dividing by zero
    assert(TemporalOps.autoChunkSeconds(
      ivFixture.filter(col("user_id") === -1L), "st", "en") == 3600L)
  }

  test("point-in-interval: null key/timestamp rows drop like BETWEEN") {
    val dirtyPts = ptFixture.unionByName(Seq((99L, 9999L))
      .toDF("user_id", "event_id")
      .withColumn("t", lit(null).cast("timestamp")))
    val dirtyIvs = ivFixture.unionByName(Seq(Tuple1(98L)).toDF("user_id")
      .withColumn("st", lit(null).cast("timestamp"))
      .withColumn("en", to_timestamp(lit("2024-01-01 10:00:00"))))
      // an INVERTED interval must match nothing, not crash sequence()
      .unionByName(Seq(Tuple1(1L)).toDF("user_id")
        .withColumn("st", to_timestamp(lit("2024-01-02 10:00:00")))
        .withColumn("en", to_timestamp(lit("2024-01-01 10:00:00"))))
    val clean = TemporalOps.pointInIntervalJoin(ptFixture, ivFixture,
      "user_id", "t", "st", "en", 900)
    val dirty = TemporalOps.pointInIntervalJoin(dirtyPts, dirtyIvs,
      "user_id", "t", "st", "en", 900)
    assert(pairsOf(dirty) == pairsOf(clean))
  }

  test("point-in-interval plans an EQUI join — no nested loop, no " +
      "cartesian product") {
    val df = TemporalOps.pointInIntervalJoin(ptFixture, ivFixture,
      "user_id", "t", "st", "en", 900)
    df.collect()
    import org.apache.spark.sql.execution.joins._
    val all = PlanWalk.nodes(df.queryExecution.executedPlan)
    assert(!all.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]) &&
      !all.exists(_.isInstanceOf[CartesianProductExec]),
      df.queryExecution.executedPlan.toString)
    assert(all.exists(n => n.isInstanceOf[BroadcastHashJoinExec] ||
      n.isInstanceOf[SortMergeJoinExec] ||
      n.isInstanceOf[ShuffledHashJoinExec]),
      df.queryExecution.executedPlan.toString)
  }

  test("interval-overlap plans an EQUI join and the gate's pairs are " +
      "mutual containments both ways") {
    import org.apache.spark.sql.execution.joins._
    val l = ivFixture.select(col("user_id"), col("st").as("lst"),
      col("en").as("len"))
    val r = ivFixture.select(col("user_id"), col("st").as("rst"),
      col("en").as("ren"))
    val df = TemporalOps.intervalOverlapJoin(l, r, "user_id",
      "lst", "len", "rst", "ren", chunkSeconds = 900)
    df.collect()
    val all = PlanWalk.nodes(df.queryExecution.executedPlan)
    assert(!all.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]) &&
      !all.exists(_.isInstanceOf[CartesianProductExec]),
      df.queryExecution.executedPlan.toString)
    // self-join: every interval overlaps itself exactly once, plus the
    // one genuinely overlapping pair of key 1, both directions
    assert(df.count() == ivFixture.count() + 2)
    // the gate runs end-to-end and every emitted pair truly overlaps
    val gate = graft.queries.ExtQueries.evOverlapJoin(spark, sf)
    assert(gate.count() > 0)
  }

  test("gate ev_interval_join: every guarded event lands in exactly one " +
      "session, and that session contains it") {
    val ev = Tables.events(spark, sf).filter(col("event_id").isNotNull &&
      col("ts").isNotNull && col("user_id").isNotNull &&
      col("value").isNotNull)
    val got = graft.queries.ExtQueries.evIntervalJoin(spark, sf)
    assert(got.count() == ev.count()) // non-overlap ⇒ exactly one each
    assert(got.filter(col("ev_ts") < col("session_start")).count() == 0)
  }

  test("gate ev_asof: every click appears exactly once, lag_sec >= 0, " +
      "and matches agree with the attribution range join where both apply") {
    val asof = graft.queries.ExtQueries.evAsof(spark, sf)
    val nClicks = Tables.events(spark, sf)
      .filter(col("event_type") === "click").count()
    assert(asof.count() == nClicks)
    assert(asof.filter(col("lag_sec") < 0).count() == 0)
    // when the as-of view lies within the attribution window, that
    // (view, click) pair must be among the range join's pairs — last
    // touch is a subset of every touch
    val att = graft.queries.ExtQueries.evAttribution(spark, sf)
      .select(col("view_id"), col("click_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lastTouch = asof
      .filter(col("view_id").isNotNull && col("lag_sec") <= 30L * 60L)
      .select(col("view_id"), col("click_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lastTouch.subsetOf(att))
    assert(lastTouch.nonEmpty)
  }
}

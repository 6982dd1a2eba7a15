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

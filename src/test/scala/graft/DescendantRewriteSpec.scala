package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{DescendantIntervalRewrite, DescendantRewrite, IntervalCatalog}
import graft.queries.TreeQueries

/** The descendant-predicate → interval-filter rewrite (SURVEY §7.4):
  * semantics preservation in both modes (rewritten / degraded), the
  * scan-level payoff (PushedFilters on `pre`, ancestors array dropped
  * from ReadSchema), and the SQL registration.
  */
class DescendantRewriteSpec extends AnyFunSuite {
  import SparkTestSession._

  private def labeled = TreeQueries.labeled(spark, sf)

  private def descOf(anchor: Long) = labeled.filter(
    DescendantRewrite.descendant_of(col("ancestors"), lit(anchor)))
    .select(col("node_id"))

  private def byContains(anchor: Long) = labeled
    .filter(array_contains(col("ancestors"), anchor)).select(col("node_id"))

  private def optimized(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  test("registered anchor: predicate becomes a pre-interval, rows unchanged") {
    IntervalCatalog.clear()
    IntervalCatalog.registerAnchors(labeled, Seq(5L))
    val df = descOf(5L)
    val plan = optimized(df)
    assert(!plan.contains("array_contains"), plan)
    assert(!plan.contains("descendant_of"), plan)
    assert(plan.contains("pre#"), plan)
    val got = df.collect().map(_.getLong(0)).sorted
    val want = byContains(5L).collect().map(_.getLong(0)).sorted
    assert(got.nonEmpty && got.sameElements(want))
    // self-inclusive, like the ancestor arrays (root→self INCLUSIVE)
    assert(got.contains(5L))
  }

  test("unregistered anchor / non-literal anchor degrade to array_contains") {
    IntervalCatalog.clear()
    val df = descOf(7L)
    assert(optimized(df).contains("array_contains"), optimized(df))
    assert(df.collect().map(_.getLong(0)).sorted
      .sameElements(byContains(7L).collect().map(_.getLong(0)).sorted))
    // column anchor: rewrite cannot apply, semantics must still hold
    IntervalCatalog.registerAnchors(labeled, Seq(5L))
    val colAnchor = labeled
      .withColumn("probe", col("node_id") - col("node_id") + 5L)
      .filter(DescendantRewrite.descendant_of(col("ancestors"), col("probe")))
      .select(col("node_id"))
    assert(optimized(colAnchor).contains("array_contains"))
    assert(colAnchor.collect().map(_.getLong(0)).sorted
      .sameElements(byContains(5L).collect().map(_.getLong(0)).sorted))
  }

  test("over parquet, the interval reaches PushedFilters and the ancestors " +
      "array leaves ReadSchema") {
    IntervalCatalog.clear()
    IntervalCatalog.registerAnchors(labeled, Seq(5L))
    val dir = java.nio.file.Files.createTempDirectory("graft_desc").toString
    labeled.write.mode("overwrite").parquet(dir)
    val nodes = spark.read.parquet(dir)
    val df = nodes.filter(DescendantRewrite
        .descendant_of(col("ancestors"), lit(5L)))
      .select(col("node_id"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("GreaterThanOrEqual(pre,"), p)
    assert(p.contains("LessThanOrEqual(pre,"), p)
    assert(!p.contains("ancestors"), p) // pruned from the scan entirely
    assert(df.count() === byContains(5L).count())
  }

  test("SQL surface: descendant_of resolves via the session extensions " +
      "and the rule rewrites it") {
    IntervalCatalog.clear()
    IntervalCatalog.registerAnchors(labeled, Seq(5L))
    labeled.createOrReplaceTempView("desc_nodes")
    val df = spark.sql(
      "SELECT node_id FROM desc_nodes WHERE descendant_of(ancestors, 5L)")
    assert(!optimized(df).contains("array_contains"))
    assert(df.collect().map(_.getLong(0)).sorted
      .sameElements(byContains(5L).collect().map(_.getLong(0)).sorted))
  }

  test("the rewrite refuses a foreign 'pre': a join partner's pre column " +
      "must never be bound when the labeled table's own pre is gone") {
    IntervalCatalog.clear()
    IntervalCatalog.registerAnchors(labeled, Seq(5L))
    import spark.implicits._
    // the other side carries its OWN long 'pre' plus a flag; the OR
    // keeps the filter above the join, and the labeled side's pre is
    // projected away — the only in-scope pre is the foreign one
    val other = Seq((1L, 999999L, true), (2L, 0L, false))
      .toDF("k", "pre", "flag")
    val lhs = labeled.select(col("node_id"), col("ancestors"),
      (col("node_id") % 2L + 1L).as("k"))
    val joined = lhs.join(other, "k")
      .filter(DescendantRewrite.descendant_of(col("ancestors"), lit(5L)) ||
        col("flag"))
    // the optimizer may fold the filter into the join condition (where
    // the rule leaves the marker alone) or keep a Filter (where it must
    // degrade to contains) — either way, NO interval comparison may
    // appear: binding the foreign pre would be silently wrong rows
    val plan = optimized(joined)
    assert(plan.contains("descendant_of") || plan.contains("array_contains"),
      plan)
    assert(!plan.contains(">="), plan)
    // and the rows are the contains-semantics rows
    val direct = lhs.join(other, "k")
      .filter(array_contains(col("ancestors"), 5L) || col("flag"))
    assert(joined.count() == direct.count())
  }

  test("only the 'ancestors' column rewrites: an arbitrary array column " +
      "keeps membership semantics even when the anchor is cataloged") {
    IntervalCatalog.clear()
    IntervalCatalog.registerAnchors(labeled, Seq(5L))
    val decoy = labeled.withColumn("other_ids",
      array(col("node_id"), col("node_id") * 1000L))
    val df = decoy.filter(DescendantRewrite
        .descendant_of(col("other_ids"), lit(5L)))
      .select(col("node_id"))
    assert(optimized(df).contains("array_contains"), optimized(df))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(5L))
  }

  test("SQL int literal coerces like array_contains and still rewrites") {
    IntervalCatalog.clear()
    IntervalCatalog.registerAnchors(labeled, Seq(5L))
    labeled.createOrReplaceTempView("desc_nodes_c")
    val df = spark.sql(
      "SELECT node_id FROM desc_nodes_c WHERE descendant_of(ancestors, 5)")
    assert(!optimized(df).contains("array_contains"), optimized(df))
    assert(df.count() == byContains(5L).count())
  }

  test("rule object is a no-op on plans without the marker") {
    val plan = byContains(5L).queryExecution.analyzed
    assert(DescendantIntervalRewrite(plan) fastEquals plan)
  }
}

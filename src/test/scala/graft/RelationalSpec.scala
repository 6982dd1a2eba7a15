package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Relational

object SparkTestSession {
  lazy val spark: SparkSession = GraftSession.build("4")
  val sf = "/root/testdata/sf0.001"
}

/** Shared executed-plan traversal for the plan-lock tests: ONE place
  * that knows how AQE nests the final plan (adaptive root, QueryStage
  * leaf wrappers), so a Spark upgrade that changes the wrapping is
  * fixed once instead of silently weakening whichever spec's copy was
  * missed.
  */
object PlanWalk {
  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

  /** Every node of the executed plan, AQE wrappers unwrapped. */
  def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: nodes(a.executedPlan)
    case q: QueryStageExec => q +: nodes(q.plan)
    case other => other +: other.children.flatMap(nodes)
  }

  def collect[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] =
    nodes(p).collect(pf)
}

class RelationalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("every registered query runs and yields a non-empty schema") {
    Relational.registry.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.schema.nonEmpty, s"$name has empty schema")
      assert(df.count() >= 0, s"$name failed to execute")
    }
  }

  test("every oracle has a query; every query has an oracle") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o -- q}")
    assert((q -- o).isEmpty, s"queries without oracles: ${q -- o}")
  }

  test("q1_agg aggregates the full lineitem table") {
    val df = Relational.q1Agg(spark, sf)
    val total = df.agg(org.apache.spark.sql.functions.sum("count_order"))
      .head().getLong(0)
    assert(total == Tables.lineitem(spark, sf).count())
  }

  test("o2_topk is ordered desc and limited to 10") {
    val rows = Relational.o2Topk(spark, sf).collect()
    assert(rows.length == 10)
    val bals = rows.map(_.getAs[Double]("c_acctbal"))
    assert(bals.zip(bals.tail).forall { case (a, b) => a >= b })
  }

  test("p5_id_partition marks existing and missing customer ids") {
    val rows = Relational.p5IdPartition(spark, sf).collect()
    assert(rows.length == 201)
    // sf0.001 has 150 customers, so ids 1400..1600 are all missing there
    assert(rows.forall(!_.getAs[Boolean]("found")))
  }

  test("set operations are consistent: except ∩ intersect = ∅") {
    val ex = Relational.set1Except(spark, sf)
    val in = Relational.set2Intersect(spark, sf)
    assert(ex.intersect(in).count() == 0)
  }
}

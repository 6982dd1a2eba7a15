package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.LongType

/** The descendant-predicate → interval-filter rewrite SURVEY §7.4 plans
  * as the custom-Catalyst capstone of the labeling scheme.
  *
  * A user asks "rows under clade X" the natural way — `descendant_of(
  * ancestors, X)`, i.e. membership in the root→self ancestor array the
  * reference answers with a Neo4j rootward walk per row
  * (GraphExplorer.java:643-645 wraps the same containment question).
  * Evaluated literally, that predicate must READ the ancestors array —
  * the widest column in the nodes table — for every row, and no scan
  * pruning is possible: parquet keeps min/max stats for scalars, not
  * array membership.
  *
  * But the labeler's DFS intervals ([[graft.tree.TreeLabeler]]) carry
  * the same answer in scalar form: `array_contains(ancestors, x)` ≡
  * `pre BETWEEN x.pre AND x.post` (ancestor arrays are root→self
  * INCLUSIVE, and `pre` ranks are globally unique — each tree owns a
  * contiguous block, so the equivalence holds even in multi-tree
  * stores). [[DescendantIntervalRewrite]] performs that substitution in
  * the optimizer whenever the anchor is a literal whose interval the
  * driver-side [[IntervalCatalog]] knows: the filter becomes two long
  * comparisons that (a) reach the parquet scan as `PushedFilters` —
  * row-group min/max on `pre` skip everything outside the clade, the
  * moral equivalent of partition pruning for subtrees — and (b) free
  * column pruning to drop the ancestors array from `ReadSchema`
  * entirely. At 100 TB the difference is reading ~|clade|/|corpus| of
  * one long column versus decoding every ancestor array in the table.
  *
  * When the catalog misses (unknown anchor, non-literal anchor, no
  * `pre` column in scope, or the rule was never injected) the predicate
  * degrades to plain `array_contains` — same rows, just without the
  * scan pruning — so the rewrite is a pure optimization, never a
  * semantics switch. Contract: install the catalog from the SAME
  * labeled table the query scans (intervals are a property of one
  * labeling pass), and expect `ancestors`/`pre` to be non-null, which
  * the labeler guarantees.
  */
object DescendantRewrite {

  /** Column-API form: `nodes.filter(descendant_of($"ancestors", lit(x)))`. */
  def descendant_of(ancestors: Column, anchor: Column): Column =
    ColumnBridge.column(DescendantOf(ColumnBridge.expression(ancestors),
      ColumnBridge.expression(anchor)))
}

/** Driver-side anchor→(pre, post) resolution for the rewrite. The rule
  * runs on the driver at optimization time, so this is exactly where an
  * external index belongs — the same place the reference keeps its
  * Lucene index beside the graph (GraphBase.java:122-186). Two ways in:
  * a bounded collect of just the anchor rows ([[registerAnchors]] —
  * request-sized, never a corpus scan), or zero extra work when a
  * serving index is already loaded ([[installFrom]] resolves through
  * [[graft.tree.TreeServing.Index]]'s existing hash maps).
  */
object IntervalCatalog {
  private val anchors =
    new java.util.concurrent.ConcurrentHashMap[Long, (Long, Long)]()
  @volatile private var resolver: Long => Option[(Long, Long)] = _ => None

  /** Collect (pre, post) for the given node ids only and remember them. */
  def registerAnchors(labeled: org.apache.spark.sql.DataFrame,
      ids: Seq[Long]): Unit = {
    import org.apache.spark.sql.functions.col
    labeled.filter(col("node_id").isin(ids: _*))
      .select(col("node_id"), col("pre"), col("post")).collect()
      .foreach(r => anchors.put(r.getLong(0), (r.getLong(1), r.getLong(2))))
  }

  /** Resolve through an already-built serving index (no Spark job). */
  def installFrom(index: graft.tree.TreeServing.Index): Unit =
    resolver = index.interval(_)

  def lookup(uid: Long): Option[(Long, Long)] =
    Option(anchors.get(uid)).orElse(resolver(uid))

  def clear(): Unit = { anchors.clear(); resolver = _ => None }
}

/** The semantic marker predicate. Standalone (rule not injected) it IS
  * `array_contains` — eval and codegen delegate to the battle-tested
  * built-in — so queries are correct with or without the optimizer
  * extension; the rule only decides HOW it executes. A marker type,
  * rather than pattern-matching raw `ArrayContains`, keeps the rewrite
  * opt-in: it can never hijack an unrelated user filter that happens to
  * probe an array column on a table with a `pre` field.
  */
case class DescendantOf(left: Expression, right: Expression)
    extends BinaryExpression with Predicate {

  private lazy val contains = ArrayContains(left, right)

  override def checkInputDataTypes(): TypeCheckResult =
    contains.checkInputDataTypes()
  override def nullable: Boolean = contains.nullable
  override def eval(input: InternalRow): Any = contains.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = contains.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override def prettyName: String = "descendant_of"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Optimizer rule: inside a Filter, replace `descendant_of(anc, lit)`
  * with `pre >= lo AND pre <= hi` when the catalog knows `lit`'s
  * interval and the child exposes an unambiguous long `pre`; degrade to
  * `array_contains` otherwise. Injected via
  * [[graft.functions.GraftExtensions]]; idempotent (one pass eliminates
  * every DescendantOf in filters), so fixpoint batches terminate.
  */
object DescendantIntervalRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) if cond.exists(_.isInstanceOf[DescendantOf]) =>
      val pres = child.output.filter(a =>
        a.name == "pre" && a.dataType == LongType)
      val newCond = cond transformUp {
        case DescendantOf(anc, anchor) =>
          (anchor, pres) match {
            case (Literal(uid: Long, LongType), Seq(pre)) =>
              IntervalCatalog.lookup(uid) match {
                case Some((lo, hi)) =>
                  And(GreaterThanOrEqual(pre, Literal(lo)),
                    LessThanOrEqual(pre, Literal(hi)))
                case None => ArrayContains(anc, anchor)
              }
            case _ => ArrayContains(anc, anchor)
          }
      }
      Filter(newCond, child)
  }
}

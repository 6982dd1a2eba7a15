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
  *
  * SCOPE CONTRACT: the catalog is process-global and keyed by node id
  * alone, so it serves ONE labeling at a time. Within a single store
  * that is automatic (the labeler's ids and DFS ranks are globally
  * unique across its trees); when switching between independently
  * labeled tables in one session (as the test fixtures do), `clear()`
  * and re-register before querying, and don't interleave lazy
  * descendant_of plans across the switch — optimization reads the
  * catalog at ACTION time, not at DataFrame construction.
  */
object IntervalCatalog {
  private val anchors =
    new java.util.concurrent.ConcurrentHashMap[Long, (Long, Long)]()
  @volatile private var resolver: Long => Option[(Long, Long)] = _ => None

  /** Collect (pre, post) for the given node ids only and remember them.
    * An id re-registered with DIFFERENT bounds is the signature of the
    * scope-contract violation above — two independently labeled tables
    * sharing ids in one session without `clear()` — and a stale
    * interval substituted into a rewrite returns wrong rows silently,
    * so the collision is logged loudly (the new bounds win, matching
    * last-writer semantics; the warning is the tripwire).
    */
  def registerAnchors(labeled: org.apache.spark.sql.DataFrame,
      ids: Seq[Long]): Unit = {
    import org.apache.spark.sql.functions.col
    labeled.filter(col("node_id").isin(ids: _*))
      .select(col("node_id"), col("pre"), col("post")).collect()
      .foreach { r =>
        val (id, iv) = (r.getLong(0), (r.getLong(1), r.getLong(2)))
        val prev = anchors.put(id, iv)
        if (prev != null && prev != iv)
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"IntervalCatalog: node $id re-registered with different " +
              s"bounds ($prev -> $iv) — two labelings are sharing one " +
              "catalog; call IntervalCatalog.clear() when switching " +
              "labeled tables or descendant_of rewrites may use stale " +
              "intervals")
      }
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
    extends BinaryExpression with Predicate
    with org.apache.spark.sql.graftbridge.DelegatesInputTypes {

  private lazy val contains = ArrayContains(left, right)

  // same coercions as array_contains: `descendant_of(ancestors, 5)`
  // (int literal against array<bigint>) must analyze like the built-in,
  // not demand the 5L spelling
  override protected def inputTypesDelegate = contains
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

/** Optimizer rule: inside a Filter, replace `descendant_of(anc, x)`
  * with `pre >= lo AND pre <= hi` when it is PROVABLY the labeled-table
  * clade question — the rewrite demands all of:
  *
  *  - `anc` is an attribute literally named `ancestors` (the labeler's
  *    column contract; any other array degrades to `array_contains` —
  *    substituting an interval for membership in an arbitrary array
  *    would be a semantics switch, not an optimization);
  *  - the LEAF relation that produced that `ancestors` attribute also
  *    exposes the `pre` long attribute, still live in the filter
  *    child's output — intervals are a property of ONE labeling pass,
  *    so a `pre` from some other join input (or an `ancestors` whose
  *    own relation's `pre` was projected away) must never be bound;
  *  - the anchor folds to a long the [[IntervalCatalog]] knows
  *    (foldable, not just literal: the int→bigint coercion cast around
  *    `descendant_of(ancestors, 5)` may not be constant-folded yet on
  *    the fixpoint iteration that reaches us).
  *
  * Anything else degrades to `array_contains`. Injected via
  * [[graft.functions.GraftExtensions]]; idempotent (one pass eliminates
  * every DescendantOf in filters), so fixpoint batches terminate.
  */
object DescendantIntervalRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) if cond.exists(_.isInstanceOf[DescendantOf]) =>
      val newCond = cond transformUp {
        case DescendantOf(anc, anchor) =>
          val preOfSameRelation = anc match {
            case a: AttributeReference if a.name == "ancestors" =>
              child.collectLeaves()
                .find(_.outputSet.contains(a))
                .flatMap(_.output.find(p =>
                  p.name == "pre" && p.dataType == LongType))
                .filter(child.outputSet.contains)
            case _ => None
          }
          val anchorVal = anchor match {
            case e if e.foldable && e.dataType == LongType =>
              Option(e.eval()).map(_.asInstanceOf[Long])
            case _ => None
          }
          (preOfSameRelation, anchorVal.flatMap(IntervalCatalog.lookup)) match {
            case (Some(pre), Some((lo, hi))) =>
              And(GreaterThanOrEqual(pre, Literal(lo)),
                LessThanOrEqual(pre, Literal(hi)))
            case _ => ArrayContains(anc, anchor)
          }
      }
      Filter(newCond, child)
  }
}

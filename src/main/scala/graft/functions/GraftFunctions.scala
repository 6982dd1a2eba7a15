package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.SparkSessionExtensions

/** SQL registration for graft's custom expressions, both per-session
  * ([[register]]) and via `SparkSessionExtensions` for cluster configs
  * (`spark.sql.extensions=graft.functions.GraftExtensions`).
  */
object GraftFunctions {

  /** (name, implementing class, arity, builder). Builders enforce arity
    * with a named error — `SELECT mrca_pack(x)` must fail with "mrca_pack
    * expects 2 arguments", not a raw IndexOutOfBoundsException, and extra
    * arguments must be refused rather than silently ignored.
    */
  private def checked(name: String, arity: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    es => {
      require(es.length == arity,
        s"$name expects $arity argument(s), got ${es.length}")
      build(es)
    }

  // Column-API composites exposed to SQL: the builder expands to the
  // SAME built-in expression tree the DataFrame helper produces, so SQL
  // callers get whole-stage codegen, not a black-box UDF. Conversion via
  // the classic ExpressionUtils bridge.
  private def toCol(e: Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftColumnBridge.toCol(e)
  private def toExpr(c: org.apache.spark.sql.Column): Expression =
    org.apache.spark.sql.GraftColumnBridge.toExpr(c)

  /** A literal-int argument (e.g. minhash's k shapes the generated
    * expression tree, so it cannot be a runtime column).
    */
  private def litInt(name: String, e: Expression): Int = {
    require(e.foldable,
      s"$name expects a literal integer here, got non-foldable $e")
    e.eval().asInstanceOf[Number].intValue
  }

  val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("mrca_pack", classOf[MrcaPack].getName,
      checked("mrca_pack", 2)(es => MrcaPack(es.head, es(1)))),
    ("mrca_unpack_a", classOf[MrcaUnpackA].getName,
      checked("mrca_unpack_a", 1)(es => MrcaUnpackA(es.head))),
    ("mrca_unpack_b", classOf[MrcaUnpackB].getName,
      checked("mrca_unpack_b", 1)(es => MrcaUnpackB(es.head))),
    ("dot_product", classOf[DotProduct].getName,
      checked("dot_product", 2)(es => DotProduct(es.head, es(1)))),
    ("descendant_of", classOf[graft.plans.DescendantOf].getName,
      checked("descendant_of", 2)(es =>
        graft.plans.DescendantOf(es.head, es(1)))),
    ("double_order_bits", classOf[DoubleOrderBits].getName,
      checked("double_order_bits", 1)(es => DoubleOrderBits(es.head))),
    ("graft_tokens", graft.ops.TextOps.getClass.getName,
      checked("graft_tokens", 1)(es =>
        toExpr(graft.ops.TextOps.tokensCol(toCol(es.head))))),
    ("graft_fingerprint", graft.ops.TextOps.getClass.getName,
      checked("graft_fingerprint", 1)(es =>
        toExpr(graft.ops.TextOps.fingerprintCol(toCol(es.head))))),
    ("graft_minhash", graft.ops.TextOps.getClass.getName,
      checked("graft_minhash", 2)(es =>
        toExpr(graft.ops.TextOps.minhashCol(toCol(es.head),
          litInt("graft_minhash", es(1)))))),
    ("graft_langid", graft.ops.TextOps.getClass.getName,
      checked("graft_langid", 1)(es =>
        toExpr(graft.ops.TextOps.langIdCol(toCol(es.head))))),
    ("graft_scrub_pii", graft.ops.TextOps.getClass.getName,
      checked("graft_scrub_pii", 1)(es =>
        toExpr(graft.ops.TextOps.scrubPiiCol(toCol(es.head))))),
    ("graft_normalize", graft.ops.TextOps.getClass.getName,
      checked("graft_normalize", 1)(es =>
        toExpr(graft.ops.TextOps.normalizeCol(toCol(es.head))))),
    ("graft_token_estimate", graft.ops.TextOps.getClass.getName,
      checked("graft_token_estimate", 1)(es =>
        toExpr(graft.ops.TextOps.bpeTokenEstimateCol(toCol(es.head))))),
    ("graft_chunks", graft.ops.TextOps.getClass.getName,
      checked("graft_chunks", 3)(es =>
        toExpr(graft.ops.TextOps.chunksCol(toCol(es.head),
          litInt("graft_chunks", es(1)), litInt("graft_chunks", es(2)))))),
    ("graft_bpe", Bpe.getClass.getName,
      checked("graft_bpe", 1)(es =>
        toExpr(Bpe.tokensCol(toCol(es.head))))),
    ("graft_surprise", Unigram.getClass.getName,
      checked("graft_surprise", 1)(es =>
        toExpr(Unigram.surpriseOfTokens(Bpe.wordsCol(toCol(es.head)))))),
    ("graft_bigram_surprise", Unigram.getClass.getName,
      checked("graft_bigram_surprise", 1)(es =>
        toExpr(Unigram.bigramSurpriseOfTokens(
          Bpe.wordsCol(toCol(es.head)))))))

  /** Register on an existing session: `SELECT mrca_pack(a, b)` works in
    * `spark.sql` afterwards.
    */
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    functions.foreach { case (name, _, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}

/** Injectable extensions: every session created with these carries the
  * graft SQL functions (the idiomatic cluster-wide hook).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.functions.foreach { case (name, className, builder) =>
      // each entry carries ITS OWN implementing class: DESCRIBE FUNCTION
      // must point a debugger at the right source, not a sibling's
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(className, name), builder))
    }
    // descendant_of(ancestors, x) → interval filter (SURVEY §7.4); runs
    // in the operator-optimization batch, degrades to array_contains on
    // catalog miss
    e.injectOptimizerRule(_ => graft.plans.DescendantIntervalRewrite)
  }
}

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

  val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("mrca_pack", classOf[MrcaPack].getName,
      checked("mrca_pack", 2)(es => MrcaPack(es.head, es(1)))),
    ("mrca_unpack_a", classOf[MrcaUnpackA].getName,
      checked("mrca_unpack_a", 1)(es => MrcaUnpackA(es.head))),
    ("mrca_unpack_b", classOf[MrcaUnpackB].getName,
      checked("mrca_unpack_b", 1)(es => MrcaUnpackB(es.head))),
    ("dot_product", classOf[DotProduct].getName,
      checked("dot_product", 2)(es => DotProduct(es.head, es(1)))))

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
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach { case (name, className, builder) =>
      // each entry carries ITS OWN implementing class: DESCRIBE FUNCTION
      // must point a debugger at the right source, not a sibling's
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(className, name), builder))
    }
}

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

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "mrca_pack" -> (es => MrcaPack(es.head, es(1))),
    "mrca_unpack_a" -> (es => MrcaUnpackA(es.head)),
    "mrca_unpack_b" -> (es => MrcaUnpackB(es.head)),
    "dot_product" -> (es => DotProduct(es.head, es(1))))

  /** Register on an existing session: `SELECT mrca_pack(a, b)` works in
    * `spark.sql` afterwards.
    */
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    functions.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}

/** Injectable extensions: every session created with these carries the
  * graft SQL functions (the idiomatic cluster-wide hook).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.MrcaIdCodec", name), builder))
    }
}

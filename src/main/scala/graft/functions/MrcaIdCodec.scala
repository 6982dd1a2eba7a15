package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** v2↔v3 node-id codec (SURVEY §2.2 P10): the reference's v2 API packs an
  * unnamed `mrcaott<a>ott<b>` node into a single long as `a + 10^7 * b`
  * (ott ids below 10^7 are passed through; packed ids land above),
  * /root/reference/src/main/java/opentree/plugins/tree_of_life.java:385-422.
  *
  * Implemented as native Catalyst expressions with codegen (not UDFs) so
  * the codec runs inside whole-stage codegen at scan speed.
  */
object MrcaIdCodec {
  val IdLimit = 10000000L // tree_of_life.java:385

  def mrca_pack(a: Column, b: Column): Column =
    ColumnBridge.column(MrcaPack(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))
  def mrca_unpack_a(p: Column): Column =
    ColumnBridge.column(MrcaUnpackA(ColumnBridge.expression(p)))
  def mrca_unpack_b(p: Column): Column =
    ColumnBridge.column(MrcaUnpackB(ColumnBridge.expression(p)))
}

case class MrcaPack(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    a.asInstanceOf[Long] + MrcaIdCodec.IdLimit * b.asInstanceOf[Long]
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"$a + ${MrcaIdCodec.IdLimit}L * $b")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class MrcaUnpackA(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(p: Any): Any =
    p.asInstanceOf[Long] % MrcaIdCodec.IdLimit
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"$p % ${MrcaIdCodec.IdLimit}L")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class MrcaUnpackB(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(p: Any): Any =
    p.asInstanceOf[Long] / MrcaIdCodec.IdLimit
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"$p / ${MrcaIdCodec.IdLimit}L")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

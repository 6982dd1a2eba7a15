package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
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
  // declared checking makes SQL misuse an ANALYSIS error instead of a
  // runtime ClassCastException (AbstractDataType/ImplicitCastInputTypes
  // are private[sql], so the check is spelled out)
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mrca_pack requires (bigint, bigint), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  // the codec is only injective below IdLimit — an out-of-range id would
  // pack to a value that UNPACKS TO A DIFFERENT PAIR (silent node
  // mis-identification), so enforce the reference's implicit invariant
  private def check(v: Long): Long = {
    if (v < 0L || v >= MrcaIdCodec.IdLimit)
      throw new IllegalArgumentException(
        s"mrca_pack input $v outside [0, ${MrcaIdCodec.IdLimit})")
    v
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    check(a.asInstanceOf[Long]) +
      MrcaIdCodec.IdLimit * check(b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lim = s"${MrcaIdCodec.IdLimit}L"
      s"""
         |if ($a < 0L || $a >= $lim || $b < 0L || $b >= $lim) {
         |  throw new IllegalArgumentException(
         |    "mrca_pack input outside [0, " + $lim + "): " + $a + ", " + $b);
         |}
         |${ev.value} = $a + $lim * $b;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class MrcaUnpackA(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mrca_unpack_a requires bigint, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def nullSafeEval(p: Any): Any =
    p.asInstanceOf[Long] % MrcaIdCodec.IdLimit
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"$p % ${MrcaIdCodec.IdLimit}L")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class MrcaUnpackB(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mrca_unpack_b requires bigint, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def nullSafeEval(p: Any): Any =
    p.asInstanceOf[Long] / MrcaIdCodec.IdLimit
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"$p / ${MrcaIdCodec.IdLimit}L")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

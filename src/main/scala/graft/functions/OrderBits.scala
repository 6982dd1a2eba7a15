package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, LongType}

/** IEEE-754 order-preserving bits: maps a double to a long whose
  * SIGNED order equals the double's ascending order — the radix-sort
  * classic (flip all bits but the sign for negatives, keep positives),
  * here powering [[graft.ops.SelectOps]]'s exact selection over double
  * columns: the long kernel's histogram passes work unchanged on the
  * transformed values, and the chosen long maps back to the exact
  * double it came from ([[OrderBits.fromBits]] — bijective, so the
  * reported percentile is bit-identical to a value in the data).
  *
  * Ordering matches SQL engines' double sort for all ordinary values;
  * -0.0 sorts just below +0.0 (engines treat them equal — both sides
  * of an orderBy tie, so gates that may see zeros normalize with
  * `+ 0.0` on both engines), and NaN sorts above +∞ exactly like
  * DuckDB's ascending NaN handling. CANONICAL bits, not raw: a NaN
  * with the sign bit set (perfectly legal in parquet written
  * elsewhere) would order below −∞ under raw bits — `doubleToLongBits`
  * collapses every NaN payload to the one positive quiet NaN, which
  * is also what makes "NaN above +∞" hold for all of them. Codegen'd:
  * two long ops per value, no boxing.
  */
object OrderBits {
  def toBitsCol(c: Column): Column =
    ColumnBridge.column(DoubleOrderBits(ColumnBridge.expression(c)))

  def toBits(d: Double): Long = {
    val s = java.lang.Double.doubleToLongBits(d)
    s ^ ((s >> 63) & 0x7fffffffffffffffL)
  }

  def fromBits(v: Long): Double =
    java.lang.Double.longBitsToDouble(v ^ ((v >> 63) & 0x7fffffffffffffffL))
}

case class DoubleOrderBits(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.graftbridge.DelegatesInputTypes {
  override def dataType: DataType = LongType
  // borrow a builtin's (DOUBLE) => coercion contract: Sqrt is a
  // one-child UnaryMathExpression whose inputTypes are exactly
  // Seq(DoubleType), so ints/floats cast in like they would for sqrt
  override protected def inputTypesDelegate =
    org.apache.spark.sql.catalyst.expressions.Sqrt(child)

  override def nullSafeEval(x: Any): Any =
    OrderBits.toBits(x.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => {
      val s = ctx.freshName("s")
      s"""
         |long $s = java.lang.Double.doubleToLongBits($d);
         |${ev.value} = $s ^ (($s >> 63) & 0x7fffffffffffffffL);
       """.stripMargin
    })

  override def prettyName: String = "double_order_bits"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

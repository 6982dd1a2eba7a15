package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two array<double> columns.
  *
  * The composable form — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — is
  * semantically right but runs OUTSIDE whole-stage codegen: higher-order
  * functions evaluate their lambda interpreted, one boxed element at a
  * time, and every ANN/k-means gate sits in that loop n·d times. This
  * expression emits a primitive `double` loop via `doGenCode`, keeping
  * the scoring kernels inside codegen.
  *
  * Fold-order parity: the sum accumulates left-to-right in index order —
  * exactly the sequential fold of the `aggregate` form and of DuckDB's
  * `list_dot_product` — so results are bit-identical to both and every
  * existing oracle stays green. Inputs are assumed equal-length,
  * null-free element arrays (embedding columns); the shorter length
  * bounds the loop.
  */
object VectorExprs {
  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))
}

case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // declared checking makes SQL misuse an ANALYSIS error: without it,
  // getDouble(i) over an array<float> input would read 8-byte slots from
  // 4-byte float data and return garbage silently (the Scala API always
  // routes through toDouble; SQL callers get told to cast)
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product requires (array<double>, array<double>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Integer-exact approximate natural log in MICRONATS — the primitive
  * that lets a language model be TRAINED on the corpus and still score
  * bit-identically in any engine. ln() itself is not correctly rounded
  * and differs across libm implementations (the BM25 rational-idf
  * lesson), so every cost table in this repo was a compile-time
  * literal; this function removes that restriction: it is a pure
  * integer map both engines compute from the same bit operations, so
  * costs derived from RUNTIME counts agree exactly.
  *
  * Definition (x ≥ 1): with m = ⌊log₂ x⌋ (the bit length of x minus
  * one) and v = the top 9 bits of x scaled into [256, 512) by an exact
  * power-of-two shift,
  *   lnMicro(x) = m·693147 + LnTab(v − 256),
  * where LnTab(f) = round(10⁶·ln(1 + f/256)). Truncating below the top
  * 9 bits bounds the error by ln(257/256) < 0.004 nats — noise for a
  * quality score — and the map is monotone non-decreasing, so cost
  * differences of nested counts never go negative. Both engines
  * compute m from the length of the binary-string rendering (`bin`,
  * unpadded in both) and v by a shift (Spark) / power-table integer
  * division (DuckDB): no floats anywhere.
  */
object IntLog {

  val Ln2Micro = 693147L

  /** round(1e6 · ln(1 + f/256)) for f in [0, 256). */
  val lnTab: IndexedSeq[Long] =
    (0 until 256).map(f => math.round(1e6 * math.log1p(f / 256.0)))

  /** 2^k for k in [0, 55] — enough for any count this engine produces
    * (counts are row counts; 2^55 rows is past every deployment).
    */
  val pow2: IndexedSeq[Long] = (0 to 55).map(1L << _)

  private def lnTabCol: Column = array(lnTab.map(lit): _*)

  /** lnMicro(x) as a codegen'd integer column expression; `x` must be
    * a positive integral column. Pass a simple column reference (bind
    * computed expressions to a column first): `x` is referenced several
    * times below.
    */
  def lnMicroCol(x0: Column): Column = {
    val x = x0.cast("long")
    val m = (length(bin(x)) - 1).cast("long")
    val shift = (m - lit(8L)).cast("int")
    val top = when(shift >= 0,
      call_function("shiftright", x, shift))
      .otherwise(call_function("shiftleft", x, -shift))
    m * lit(Ln2Micro) + element_at(lnTabCol, (top - 255L).cast("int"))
  }

  /** The same function as a DuckDB SQL expression over `xExpr` (a
    * positive integer expression) — generated from the SAME literal
    * tables, so the two engines cannot drift.
    */
  def lnMicroSql(xExpr: String): String = {
    val tab = lnTab.mkString("[", ", ", "]")
    val p2 = pow2.mkString("[", ", ", "]")
    // DuckDB lambda binds the expression once so xExpr is evaluated once
    s"list_transform([CAST(($xExpr) AS BIGINT)], x -> " +
      s"(length(bin(x)) - 1) * $Ln2Micro + ($tab)[" +
      s"CASE WHEN length(bin(x)) - 1 >= 8 " +
      s"THEN x // ($p2)[length(bin(x)) - 8] " +
      s"ELSE x * ($p2)[9 - (length(bin(x)) - 1)] END - 255])[1]"
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join: salt the hot side's key into `salts`
  * sub-keys and replicate the other side across every salt value, so one
  * hot key's rows spread over `salts` reducers instead of one.
  *
  * AQE's skew-join split handles sort-merge skew at runtime; explicit
  * salting remains the tool when (a) the skew is known and extreme (a
  * null-ish default key holding 10% of 100 TB), (b) the join must hash-
  * partition for a downstream stage, or (c) AQE is unavailable (some
  * streaming/bucketed plans). Result is EXACTLY the plain join — the
  * salt is internal plumbing and never escapes.
  */
object SkewOps {

  /** Inner equi-join of `skewed` (hot keys) with `other` on `key`.
    * The salt on the skewed side is derived from a hash of its OTHER
    * columns (deterministic, spread); `other` explodes `salts`-fold —
    * use on a dimension-sized right side, not fact×fact.
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
      salts: Int): DataFrame = {
    val nonKey = skewed.columns.filter(_ != key).map(col)
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(nonKey: _*), lit(salts.toLong)).cast("int"))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
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
    * The salt is a per-row round-robin (`monotonically_increasing_id`
    * mod `salts`) — NOT a hash of payload columns, which would collapse
    * to one salt value exactly in the motivating case of a hot key with
    * constant payload. The salt never influences the RESULT (every salt
    * value matches after replication), only the partitioning, so the
    * physical row spread does not need to be reproducible. `other`
    * explodes `salts`-fold — use a dimension-sized right side, not
    * fact×fact. `__salt` is reserved: inputs must not carry it.
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(!skewed.columns.contains("__salt") && !other.columns.contains("__salt"),
      "__salt is reserved by saltedJoin; rename the input column")
    val salted = skewed.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixing.
  *
  * Random sampling (`df.sample`) is non-reproducible across runs and
  * engines; a data pipeline needs the SAME sample every rerun, on every
  * engine, and independent samples per purpose (train/val splits, mixture
  * re-weighting). The primitive here is hash-gating: keep a row iff the
  * first 4 hex digits of md5(salt:key) fall below a rate threshold.
  *
  * Scale properties: pure row-local predicate — pushes into the scan
  * (codegen'd, no shuffle, no state), sampling error O(1/√(rate·n)),
  * distinct salts give statistically independent samples. Thresholds are
  * compared as STRINGS ("3333" for 20% of 0x10000): no hex→int parsing,
  * so any engine with md5 reproduces the exact row set — that determinism
  * is what makes a 100 TB sample auditable.
  */
object SampleOps {

  /** 4-hex-digit threshold string for a rate in [0, 1]. Rate 1.0 maps to
    * "g", which is lexicographically above every hex string (hex stops at
    * 'f'), so `bucket < threshold` keeps everything.
    */
  def threshold(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate $rate outside [0,1]")
    val k = math.round(rate * 65536.0)
    if (k >= 65536L) "g" else f"$k%04x"
  }

  /** The 4-hex-digit bucket of a key under a salt — NULL for a null key.
    * concat, not concat_ws: concat_ws SKIPS null args, so every null-key
    * row would share the single constant bucket md5(salt) and the whole
    * null population would be kept or dropped as a block (a silent rate
    * bias). With null propagation the sample filters below drop null-key
    * rows deliberately — null-ignoring semantics, documented per caller.
    * Byte-identical to the old form for non-null keys ("salt:key").
    */
  def bucketCol(key: Column, salt: String): Column =
    substring(md5(concat(lit(salt), lit(":"), key.cast("string"))), 1, 4)

  /** Deterministic Bernoulli sample at `rate`, keyed by `keyCol`. Rows
    * with a null key are excluded (they have no well-defined bucket).
    */
  def hashSample(df: DataFrame, keyCol: String, rate: Double,
      salt: String): DataFrame =
    df.filter(bucketCol(col(keyCol), salt) < lit(threshold(rate)))

  /** Stratified deterministic sample: per-stratum rates (the "mixture
    * weights" of a training-data recipe), unknown strata fall back to
    * `defaultRate`. The rate table rides along as a broadcast dim join —
    * at scale the weights come from a config table, not a hardcoded CASE.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
      rates: Map[String, Double], defaultRate: Double,
      salt: String): DataFrame = {
    // same reserved-column discipline as SkewOps.saltedJoin's __salt
    require(!df.columns.contains("__thresh"),
      "input already has a __thresh column (reserved by stratifiedSample)")
    val spark = df.sparkSession
    import spark.implicits._
    val rateDf = rates.toSeq.map { case (s, r) => (s, threshold(r)) }
      .toDF(stratumCol, "__thresh")
    df.join(broadcast(rateDf), Seq(stratumCol), "left")
      .filter(bucketCol(col(keyCol), salt) <
        coalesce(col("__thresh"), lit(threshold(defaultRate))))
      .drop("__thresh")
  }
}

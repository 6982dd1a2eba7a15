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

  /** The numeric form of [[bucketCol]]: the first 4 hex digits of
    * md5(salt:key) parsed as a long in [0, 65536). Same bits, numeric
    * comparisons — for thresholds computed IN-PLAN (data-dependent rates)
    * where a driver-side [[threshold]] string can't be prebuilt.
    */
  def bucketNumCol(key: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), lit(":"), key.cast("string"))),
      1, 4), 16, 10).cast("long")

  /** Per-stratum sampling thresholds for temperature-flattened source
    * mixing (the multilingual/training-mix recipe of Lample & Conneau
    * 2019 §3.1 and the Pile/LLaMA data recipes): sample stratum i with
    * probability p_i ∝ share_i^α / share_i, i.e. small sources are
    * up-weighted toward a flat mix as α→0.
    *
    * α is FIXED at 1/2 and every step is integer arithmetic — weights
    * w_i = floor(sqrt(n_i)), thresholds
    * k_i = min(65536, (65536·num·N·w_i) DIV (den·W·n_i)) where
    * W = Σw_j and num/den is the target overall sampling fraction —
    * because the whole point of deterministic sampling is auditability:
    * a pow(x, 0.37) threshold differs in the last ulp across libm
    * implementations and flips rows at the boundary; floor(sqrt(n)) of a
    * count and integer DIV are bit-identical on every engine. Expected
    * kept total ≈ (num/den)·N, allocated ∝ sqrt(n_i).
    *
    * Returns (stratumCol, n_total, k_threshold) — #strata rows, the
    * broadcastable "recipe" table. The BIGINT product 65536·num·N·w_i
    * overflows past N·w ≈ 1.4e14·den⁻¹ (N ≈ 10¹¹ docs at 100 TB with
    * w ≈ 3·10⁵ crosses it): promote the product chain to decimal(38,0)
    * on both engines at that scale — the formula is unchanged.
    */
  def temperatureThresholds(df: DataFrame, stratumCol: String,
      targetNum: Long, targetDen: Long): DataFrame =
    temperatureThresholdsFromStats(mixStats(df, stratumCol), stratumCol,
      targetNum, targetDen)

  /** The per-stratum counts the temperature recipe is a pure function of
    * — (stratumCol, n_total), #strata rows. Counts are the trivially
    * mergeable summary (sums), which is what lets a streaming pipeline
    * maintain them incrementally ([[appendMixStats]]) instead of
    * rescanning the corpus per recipe refresh.
    */
  def mixStats(df: DataFrame, stratumCol: String): DataFrame =
    df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n_total"))

  /** [[temperatureThresholds]] from an ALREADY-AGGREGATED stats table
    * (the [[mixStats]] shape) — the entry point for recipes re-derived
    * from a maintained store rather than a corpus scan: thresholds are a
    * deterministic integer-arithmetic function of the counts, so however
    * the counts were accumulated (one batch pass or micro-batch folds),
    * identical counts give bit-identical thresholds.
    */
  def temperatureThresholdsFromStats(stats: DataFrame, stratumCol: String,
      targetNum: Long, targetDen: Long): DataFrame = {
    require(targetNum > 0 && targetDen > 0 && targetNum <= targetDen,
      s"target fraction $targetNum/$targetDen outside (0,1]")
    // corpus totals via an unpartitioned window, not a crossJoin with an
    // agg-of-self (whose deduplicated attribute ids break by-name
    // resolution): the window runs on the STATS frame — #strata rows in
    // one partition, not a data-volume concern
    val wAll = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    stats
      .withColumn("__w", floor(sqrt(col("n_total"))).cast("long"))
      .withColumn("__num",
        lit(65536L * targetNum) * sum(col("n_total")).over(wAll) * col("__w"))
      .withColumn("__den",
        lit(targetDen) * sum(col("__w")).over(wAll) * col("n_total"))
      // DIV, not /: Column./ promotes to double, and a correctly-rounded
      // double quotient within half an ulp of an integer would flip the
      // floor — integer division is the reproducibility contract here
      .withColumn("k_threshold", least(lit(65536L), expr("__num DIV __den")))
      .select(col(stratumCol), col("n_total"), col("k_threshold"))
  }

  /** Temperature-flattened deterministic sample: keep a row iff its
    * numeric bucket falls under its stratum's [[temperatureThresholds]]
    * threshold. The threshold table is #strata rows — a broadcast join
    * against the corpus scan; the bucket predicate is row-local codegen.
    * Rows with a null key are excluded (no well-defined bucket), matching
    * [[hashSample]].
    */
  def temperatureSample(df: DataFrame, keyCol: String, stratumCol: String,
      targetNum: Long, targetDen: Long, salt: String): DataFrame =
    temperatureSampleWith(df,
      temperatureThresholds(df, stratumCol, targetNum, targetDen),
      keyCol, stratumCol, salt)

  /** Apply a PREBUILT recipe table (the [[temperatureThresholds]] shape)
    * to a corpus — the serving half of the maintain/re-derive/apply loop:
    * a streaming pipeline keeps [[mixStats]] fresh in a store, re-derives
    * the recipe, and gates rows here, so the sampled set on any engine is
    * the deterministic product of (corpus, recipe, salt) alone.
    */
  def temperatureSampleWith(df: DataFrame, thresholds: DataFrame,
      keyCol: String, stratumCol: String, salt: String): DataFrame = {
    // only k_threshold is joined in (the recipe is projected to
    // (stratum, k_threshold) below); an input n_total column no longer
    // collides and is legal
    require(!df.columns.contains("k_threshold"),
      "input already has a k_threshold column (reserved)")
    df.join(broadcast(thresholds
        .select(col(stratumCol), col("k_threshold"))), Seq(stratumCol))
      .filter(bucketNumCol(col(keyCol), salt) < col("k_threshold"))
      .drop("k_threshold")
  }

  /** Persisted mixture-stats store — the sampling recipe's counterpart of
    * the CM/KMV sketch stores ([[SketchOps.saveCm]] lineage): the
    * [[mixStats]] table (#strata rows, bytes regardless of corpus size)
    * under the same manifest crash protocol, single-writer assumption,
    * and batchId idempotence guard. A streaming maintenance loop folds
    * each micro-batch's counts in ([[appendMixStats]]) — history never
    * rescanned, counts are exact (not estimates), and the re-derived
    * thresholds are bit-identical to a whole-corpus batch derivation.
    */
  val MixManifestFile = "_graft_mixstore.json"

  /** Create (or reset) the store — [[graft.StoreUtil.foldStoreSave]]
    * under this family's manifest: a re-save advances the ingest
    * counter like a fold would (the ModelStore.save rule), and that
    * counter is what lets a delivery's provenance row later PROVE the
    * store was not folded into between the delivery and a replay (a
    * pre-counter manifest reads as 1 via the family's lenient rule, so
    * old stores keep loading).
    */
  def saveMixStats(stats: DataFrame, path: String,
      batchId: Option[Long] = None): Unit =
    graft.StoreUtil.foldStoreSave(stats, path, "stats", MixManifestFile,
      batchId)

  def loadMixStats(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    graft.StoreUtil.requireManifest(spark, path, MixManifestFile,
      "mix-stats store")
    spark.read.parquet(s"$path/stats")
  }

  /** Same probe discipline as [[SketchOps.cmStoreExists]]: stats present
    * without a manifest is a crashed save and must REFUSE — reading it as
    * absent would let a maintenance loop silently reset count history.
    */
  def mixStatsStoreExists(spark: org.apache.spark.sql.SparkSession,
      path: String): Boolean =
    graft.StoreUtil.manifestedStoreExists(spark, path, "stats",
      MixManifestFile, "stats",
      "a previous save crashed mid-write; restore a copy or re-count " +
        "the corpus")

  /** Fold a micro-batch's [[mixStats]] into the store: counts sum by
    * stratum (every non-`n_total` column is group key). Re-delivered
    * batchIds are no-ops — double-folding counts, unlike KMV states,
    * would genuinely corrupt the recipe.
    */
  def appendMixStats(spark: org.apache.spark.sql.SparkSession, path: String,
      batchStats: DataFrame, batchId: Option[Long] = None): Unit =
    graft.StoreUtil.foldStoreAppend(spark, path, "stats", MixManifestFile,
      batchStats, batchId, Seq("n_total"), "mix-stats store")

  /** Token-budget mixture sampling — the pretraining-recipe control
    * knob [[temperatureSample]] cannot express: each stratum (domain,
    * source, language) is given an absolute TOKEN budget B_d, and the
    * sample keeps documents until the budget is reached, so the mixed
    * corpus hits its per-domain token masses exactly — within one
    * document: a kept set's mass lands in [B_d, B_d + crossing doc)
    * whenever the domain has ≥ B_d tokens, and is the whole domain
    * otherwise. Deterministic and engine-replayable like every sampler
    * here: the keep order within a domain is (md5(salt:id), id) — a
    * salted hash shuffle, so the prefix is an unbiased sample — and
    * "keep" means the cumulative token mass BEFORE the document is
    * still under budget.
    *
    * Scale shape (the [[SelectOps]] radix discipline): a naive
    * per-domain running sum is a window over the whole domain — one
    * task per domain at 100 TB. Instead the hash's first 4 hex digits
    * bucket each domain into 65536 radix cells: per-(domain, bucket)
    * token masses aggregate map-side (≤ 65536·|domains| rows), a
    * TINY window over that table finds each bucket's prior mass, and
    * buckets classify as whole-kept (prior + mass < B), dropped
    * (prior ≥ B), or THE boundary bucket (at most one per domain —
    * the running mass crosses B once); only the boundary bucket's
    * docs (~1/65536 of the domain) pay a doc-level ordered scan.
    *
    * Strata absent from `budgets` are dropped — the budget table IS
    * the recipe; budget 0 keeps nothing (both by the same rule, no
    * special cases). Null ids are excluded ([[hashSample]]'s rule);
    * a null or negative token count fails in-plan rather than
    * silently skewing a domain's mass.
    *
    * @param budgets (stratumCol, budget_tok) — #strata rows, broadcast
    */
  def tokenBudgetSample(df: DataFrame, idCol: String, stratumCol: String,
      tokCol: Column, budgets: DataFrame, salt: String): DataFrame =
    tokenBudgetSampleWith(df, idCol, stratumCol, tokCol, budgets, salt,
      tokenBucketStats(df, idCol, stratumCol, tokCol, salt))

  /** The per-(stratum, radix-bucket) token masses the budget sampler's
    * whole bucket algebra is a pure function of — (stratumCol, bucket,
    * n_total), ≤ 65536·|strata| rows. Masses are ADDITIVE sums, and
    * the column shape deliberately matches the [[mixStats]] store
    * contract (every non-`n_total` column is a group key), so
    * [[saveMixStats]]/[[appendMixStats]] maintain the table under
    * micro-batches unchanged — a streaming pipeline keeps the radix
    * table fresh and re-derives identical budget classifications
    * without ever rescanning corpus history.
    */
  def tokenBucketStats(df: DataFrame, idCol: String, stratumCol: String,
      tokCol: Column, salt: String): DataFrame =
    keyed(df, idCol, stratumCol, tokCol, salt)
      .groupBy(col(stratumCol), col("__b").as("bucket"))
      .agg(sum(col("__ntok")).as("n_total"))

  /** The shared per-doc frame: validated token count, salted hash, and
    * radix bucket — ONE definition, so the stats builder and the
    * sampler can never bucket differently.
    */
  private def keyed(df: DataFrame, idCol: String, stratumCol: String,
      tokCol: Column, salt: String): DataFrame = {
    val reserved =
      Seq("__h", "__b", "__ntok", "__m", "__prior", "__budget", "__before")
    reserved.filter(df.columns.contains).foreach(c =>
      throw new IllegalArgumentException(
        s"input already has a '$c' column (reserved by tokenBudgetSample)"))
    df.filter(col(idCol).isNotNull)
      .withColumn("__ntok",
        when(tokCol.isNull || tokCol < 0, raise_error(concat(
          lit("tokenBudgetSample: null/negative token count for id "),
          col(idCol).cast("string"))).cast("long"))
          .otherwise(tokCol.cast("long")))
      .withColumn("__h",
        md5(concat(lit(salt), lit(":"), col(idCol).cast("string"))))
      .withColumn("__b",
        conv(substring(col("__h"), 1, 4), 16, 10).cast("long"))
  }

  // per-(session, recipe plan) memo for the strata-count broadcast-hint
  // probe below
  private val strataProbe = new graft.SessionCache[Long]()

  /** [[tokenBudgetSample]] with the radix table supplied EXTERNALLY —
    * the serving entry point for a recipe maintained in a store
    * ([[tokenBucketStats]] shape, possibly folded across micro-batches
    * by [[appendMixStats]]): identical masses give bit-identical kept
    * sets, however the masses were accumulated. The corpus is still
    * scanned once for the gating filter itself (and the ≤1 boundary
    * bucket per stratum pays its doc-level scan), but the
    * classification never re-aggregates history.
    */
  def tokenBudgetSampleWith(df: DataFrame, idCol: String,
      stratumCol: String, tokCol: Column, budgets: DataFrame,
      salt: String, bucketStats: DataFrame): DataFrame = {
    val bud = broadcast(budgets.select(col(stratumCol),
      col("budget_tok").cast("long").as("__budget")))
    val d = keyed(df, idCol, stratumCol, tokCol, salt)
    val wPrior = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol)).orderBy(col("__b"))
      .rowsBetween(Long.MinValue, -1)
    // the radix table: per-(stratum, bucket) token mass + prior mass —
    // the window runs over ≤ 65536·|strata| rows, never the corpus
    val classes = bucketStats
      .select(col(stratumCol), col("bucket").as("__b"),
        col("n_total").as("__m"))
      .withColumn("__prior", coalesce(sum(col("__m")).over(wPrior), lit(0L)))
      .join(bud, Seq(stratumCol))
    // strict <: a bucket ending EXACTLY at the budget still routes
    // through the boundary scan, so a zero-token document sitting at
    // the exact crossing obeys the one doc-level rule (before < B)
    val fullKeep = classes
      .filter(col("__prior") + col("__m") < col("__budget"))
      .select(col(stratumCol), col("__b"))
    val boundary = classes
      .filter(col("__prior") < col("__budget") &&
        col("__prior") + col("__m") >= col("__budget"))
      .select(col(stratumCol), col("__b"), col("__prior"), col("__budget"))
    val keep = df.columns.toIndexedSeq.map(c => col(s"`$c`"))
    // fullKeep is ≤ 65536·|strata| rows BY CONSTRUCTION (the radix
    // table minus the boundary), so it should broadcast like its
    // sibling frames (bud, boundary, thresholds) — without the hint, a
    // stats mis-estimate upstream (e.g. a checkpointed stratum frame
    // with unknown sizes) lets the planner sort-merge this semi-join
    // and shuffle the FULL CORPUS on (stratum, bucket). But unlike the
    // |strata|-row siblings the bound MULTIPLIES by 65536, and a forced
    // broadcast bypasses autoBroadcastJoinThreshold entirely — a
    // generated recipe with even hundreds of strata would pin hundreds
    // of MB as an executor hash relation where the planner's sort-merge
    // degrades gracefully. The recipe is driver-countable for pennies
    // (a literal or near-literal frame — and limit() bounds the probe
    // even for a derived one; budgets is #strata rows by contract, so
    // no dedup pass is needed), so the hint engages only while the
    // product stays COMFORTABLY inside every executor (≤ 16 strata ⇒
    // ≤ 1M (stratum, bucket) rows). Past the cliff the planner decides
    // from its own stats — the pre-hint behavior. The probe itself is
    // memoized per (session, recipe plan): a streaming loop re-calling
    // this per micro-batch with the same recipe frame pays ONE driver
    // job, not one per batch; a semantic-hash collision could only
    // mis-steer the HINT (performance, never answers).
    val nStrata = strataProbe.get(df.sparkSession,
      "strata|" + budgets.queryExecution.analyzed.semanticHash()) {
      budgets.limit(17).count()
    }
    val fullKeepHinted =
      if (nStrata <= 16L) broadcast(fullKeep)
      else fullKeep
    val k1 = d.join(fullKeepHinted, Seq(stratumCol, "__b"), "left_semi")
      .select(keep: _*)
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(col("__h"), col(idCol).cast("string"))
      .rowsBetween(Long.MinValue, -1)
    // ≤ one boundary bucket per stratum, so this window sees ~1/65536
    // of each domain — bounded by construction
    val k2 = d.join(broadcast(boundary), Seq(stratumCol, "__b"))
      .withColumn("__before",
        col("__prior") + coalesce(sum(col("__ntok")).over(wDoc), lit(0L)))
      .filter(col("__before") < col("__budget"))
      .select(keep: _*)
    k1.unionByName(k2)
  }

  /** The achieved-vs-target audit view of [[tokenBudgetSample]]: per
    * budgeted stratum, the domain's total token mass, the budget, and
    * the kept count/mass — what a pipeline materializes to prove the
    * mixture landed (tok_kept ∈ [budget, budget + one doc) wherever
    * tok_total ≥ budget, tok_kept = tok_total below it).
    */
  def tokenBudgetStats(df: DataFrame, idCol: String, stratumCol: String,
      tokCol: Column, budgets: DataFrame, salt: String): DataFrame =
    tokenBudgetStatsWith(df, idCol, stratumCol, tokCol, budgets, salt,
      tokenBucketStats(df, idCol, stratumCol, tokCol, salt))

  /** The audit view computed against an EXTERNAL radix table (the
    * store-served form): domain totals come from the stats — a
    * broadcast-sized aggregate, never a second corpus pass. All
    * numbers (tok_total included) are over the SAMPLER'S universe:
    * null-id rows have no bucket and are outside both the kept set
    * and the totals — the oracle's replay applies the same filter.
    */
  def tokenBudgetStatsWith(df: DataFrame, idCol: String,
      stratumCol: String, tokCol: Column, budgets: DataFrame,
      salt: String, bucketStats: DataFrame): DataFrame = {
    val kept = tokenBudgetSampleWith(df, idCol, stratumCol, tokCol,
      budgets, salt, bucketStats)
    budgets.select(col(stratumCol), col("budget_tok").cast("long")
        .as("budget_tok"))
      .join(bucketStats.groupBy(col(stratumCol))
          .agg(sum(col("n_total")).as("tok_total")),
        Seq(stratumCol), "left")
      .join(kept.groupBy(col(stratumCol))
          .agg(count(lit(1)).as("n_kept"),
            sum(tokCol.cast("long")).as("tok_kept")),
        Seq(stratumCol), "left")
      .na.fill(0L, Seq("tok_total", "n_kept", "tok_kept"))
  }

  /** Deterministic corpus shuffle: a reproducible global training order
    * as (shard, pos). The order is a pure function of (seed, id) — any
    * engine, any partitioning, any rerun deals the identical epoch; a
    * new seed is a fresh epoch permutation with ZERO data movement
    * until the training writer materializes it. Shard assignment is
    * scan-local (md5 prefix mod nShards); the only distributed work is
    * one rank per shard — pick nShards so a shard is file-sized
    * (100k+ shards at 100 TB), which also makes this the sharded-write
    * planner: `partitionBy(shard)`, readers stream each file in `pos`
    * order. Spark's own `orderBy(rand())` is none of these things —
    * not reproducible across reruns, not stable under repartitioning,
    * and a full global sort. Null ids are excluded (no stable order
    * without an identity).
    */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: String,
      nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    Seq("shard", "pos", "__h").filter(df.columns.contains).foreach(c =>
      throw new IllegalArgumentException(
        s"input already has a '$c' column — deterministicShuffle would " +
          "silently overwrite it; rename it first"))
    val h = md5(concat(lit(seed), lit(":"), col(idCol).cast("string")))
    df.filter(col(idCol).isNotNull)
      .withColumn("__h", h)
      .withColumn("shard", pmod(conv(substring(col("__h"), 1, 8), 16, 10)
        .cast("long"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("shard"))
          .orderBy(col("__h"), col(idCol).cast("string"))).cast("long"))
      .drop("__h")
  }
}

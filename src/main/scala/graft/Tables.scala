package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table access for the driver-provided TPC-H-ish testdata
  * (see TESTDATA.md). Reads are plain parquet scans so Catalyst can
  * push filters and prune columns into the vectorized reader.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Spread a NARROW frame across the session's parallelism before
    * row-heavy compute (the 64-rule BPE encode, n-gram surprisal
    * scoring, span stripping — kernels whose cost per row dwarfs the
    * exchange). The driver testdata ships every table as ONE parquet
    * row group, so a bare scan is a single task and everything stacked
    * above it runs on one core of 32 until the first exchange —
    * measured 2.0 s → 0.4 s for the corpus BPE encode at sf0.1 from
    * this alone (guide §2.5: unsplittable input ⇒ repartition right
    * after the read). Three deliberate design points:
    *   - SCALE-ADAPTIVE, not a constant: no-op when the input already
    *     carries at least the session's parallelism in splits, so a
    *     production-scale table (thousands of row groups) keeps its
    *     layout and pays nothing.
    *   - EXPLICIT partition count (the session's core count, itself
    *     the driver's scaling knob): a bare repartition(col) leaves
    *     the exchange AQE-coalescible, and these frames are tiny BY
    *     BYTES (~1.5 MB of text), so AQE folds them straight back to
    *     one partition — bytes are the wrong proxy for CPU-bound
    *     expression work (measured: the coalescible form gave the
    *     whole win back).
    *   - SURGICAL, not blanket: a first cut spread documents() and
    *     embeddings() at the source, and the full-suite A/B showed
    *     ~20 cheap-aggregation gates (sk_exact_pct*, smp_*, the pipe
    *     composites' 250-row windows) each losing 0.3–1.2 s to the
    *     pointless extra exchange while only the row-heavy kernels
    *     won. The exchange belongs to the OPERATOR that needs it.
    * Placement is hash-by-key, so it is deterministic and results
    * cannot depend on it; predicates written above still push into
    * the scan (Catalyst moves filters through RepartitionByExpression
    * — see the committed plans' PushedFilters).
    *
    * PLAIN SCANS (or scan+filter/project) ONLY, now ENFORCED
    * structurally: the narrowness probe (`df.rdd.getNumPartitions`)
    * finalizes the plan, and under AQE a DERIVED frame (anything with
    * an exchange below — a join, an aggregate) materializes its query
    * stages to answer, i.e. the probe EXECUTES the subquery once and
    * the real query then runs it again. Measured: spreading a
    * docs⋈embeddings join input cost mix_cluster_budget_trained
    * 2.7 s → 4.0 s; the same experiment on TextOps' kernels
    * (join-shaped or flatten-backed inputs) regressed every touched
    * gate and was reverted wholesale. A scaladoc rule alone already
    * shipped one such bug (reverted in 7ef54bb), so the guard is now
    * code: any frame that is not a leaf under filters/projects/aliases
    * is returned UNCHANGED without ever running the probe — spread is
    * opportunistic, and "no exchange added" is its documented no-op
    * behavior for already-wide inputs anyway.
    */
  def spread(df: DataFrame, key: String): DataFrame =
    if (!scanShaped(df.queryExecution.analyzed)) df
    else {
      val par = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions >= par) df
      else df.repartition(par, col(key))
    }

  /** True when the analyzed plan is a relation leaf (parquet scan,
    * local table, RDD-backed flatten output) under nothing but
    * row-local operators — the only shapes whose probe is free (no
    * exchange below means finalizing the plan schedules no stages).
    */
  private def scanShaped(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
    p match {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        scanShaped(f.child)
      case pr: org.apache.spark.sql.catalyst.plans.logical.Project =>
        scanShaped(pr.child)
      case a: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias =>
        scanShaped(a.child)
      case _: org.apache.spark.sql.catalyst.plans.logical.LeafNode => true
      case _ => false
    }

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  /** The events table's `ts` column has shipped in three encodings:
    * legacy TIMESTAMP(NANOS) (read as int64 under
    * spark.sql.legacy.parquet.nanosAsLong), standard TIMESTAMP(micros)
    * without UTC adjustment (Spark 4 reads it as TIMESTAMP_NTZ), and
    * UTC-adjusted TIMESTAMP(micros) (plain TimestampType). All event
    * operators downstream (watermarks, unix_micros, range joins) require
    * TimestampType, so normalize here — the ONE ingestion seam — rather
    * than in each operator.
    */
  private[graft] def normalizeEventTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // ns → µs by integer division (a double division would lose
        // precision above 2^53 ns)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // session TZ is UTC, so the cast re-tags the same instant
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(t(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}

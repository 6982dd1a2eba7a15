package graft.ops

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Deterministic distinct-count sketching: KMV (k minimum values,
  * Bar-Yossef et al. 2002). Keep the k smallest md5-derived hash values
  * seen per group; with the k-th minimum at fraction f of the hash
  * space, the group saw ≈ (k−1)/f distinct values.
  *
  * Why not `approx_count_distinct` (HLL++): its registers are
  * engine-specific, so the estimate cannot be verified against another
  * engine. KMV over md5 is BIT-REPRODUCIBLE — DuckDB computes the same
  * k-th minimum from the same hashes and the same closed-form estimate,
  * so even the *approximation* gets a hash-equal oracle row.
  *
  * Scale shape: the aggregation state is ≤ k sorted longs (k·8 bytes);
  * as a typed `Aggregator` it partial-aggregates map-side, so a group of
  * any cardinality ships k values per partition into the exchange — the
  * whole point of sketching a 100 TB column. Groups with fewer than k
  * distinct values return their exact count.
  */
object SketchOps {

  /** 15 hex chars = 60 bits: positive in a signed long in both engines
    * (DuckDB twin: `CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)`).
    */
  val HashBits = 60
  val HashSpace: Double = math.pow(2.0, HashBits)

  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** The KMV insert step, shared by the estimate- and state-valued
    * aggregators: keep the ≤ k smallest DISTINCT hashes, sorted.
    */
  private[graft] def kmvInsert(k: Int)(buf: Array[Long], h: Long): Array[Long] = {
    if (buf.length >= k && h >= buf(buf.length - 1)) buf
    else if (java.util.Arrays.binarySearch(buf, h) >= 0) buf // distinct only
    else {
      val merged = (buf :+ h).sorted
      if (merged.length > k) merged.take(k) else merged
    }
  }

  /** Out-of-band input marking a NULL sketched value: [[hash60]] outputs
    * are non-negative (60 bits), so -1 can never be a real hash. A typed
    * Aggregator with a primitive encoder cannot receive SQL NULL (the
    * deserializer throws and fails the whole job), so the wrappers
    * coalesce null hashes to this sentinel and reduce ignores it —
    * null-ignoring aggregate semantics, like `count_distinct`.
    */
  private val NullIn = -1L

  /** Typed KMV aggregator; buffer = sorted array of ≤ k distinct hashes. */
  class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Double] {
    require(k >= 2, s"k must be >= 2, got $k")
    override def zero: Array[Long] = Array.empty
    override def reduce(buf: Array[Long], h: Long): Array[Long] =
      if (h == NullIn) buf else kmvInsert(k)(buf, h)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      b.foldLeft(a)(kmvInsert(k))
    override def finish(buf: Array[Long]): Double =
      if (buf.length < k) buf.length.toDouble
      else (k - 1).toDouble * HashSpace / buf(k - 1).toDouble
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Distinct-count estimate of `c` per group, as an aggregation column:
    * `df.groupBy(key).agg(kmvDistinct(col("x"), 64))`.
    */
  def kmvDistinct(c: Column, k: Int = 64): Column =
    udaf(new KmvAgg(k), Encoders.scalaLong)(coalesce(hash60(c), lit(NullIn)))

  /** State-valued KMV twin: the sorted ≤ k minimum hashes themselves —
    * the persistable/mergeable form ([[KmvAgg]]'s finish collapses to the
    * estimate). Two states over disjoint or overlapping data merge by
    * re-inserting one into the other (hashes are distinct-deduped), so a
    * stored sketch table can absorb new corpus batches without rescanning
    * history.
    */
  class KmvStateAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k >= 2, s"k must be >= 2, got $k")
    override def zero: Array[Long] = Array.empty
    override def reduce(buf: Array[Long], h: Long): Array[Long] =
      if (h == NullIn) buf else kmvInsert(k)(buf, h)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      b.foldLeft(a)(kmvInsert(k))
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  /** Per-group KMV state as an aggregation column (≤ k sorted longs). */
  def kmvState(c: Column, k: Int = 64): Column =
    udaf(new KmvStateAgg(k), Encoders.scalaLong)(coalesce(hash60(c), lit(NullIn)))

  /** Re-fold already-hashed KMV values (the merge path: explode stored
    * states, union a new batch's states, re-aggregate — history is never
    * rescanned because the state IS a mergeable summary). Null hashes
    * (explode_outer of an empty state) are ignored, so empty-state
    * groups survive a merge round-trip.
    */
  def kmvStateOfHashes(h: Column, k: Int = 64): Column =
    udaf(new KmvStateAgg(k), Encoders.scalaLong)(coalesce(h, lit(NullIn)))

  /** The KMV estimate read from a stored state column — bit-identical to
    * [[KmvAgg]]'s finish: exact count below k, else (k−1)·2^60 / k-th min.
    */
  def kmvEstimateFromState(state: Column, k: Int): Column =
    when(size(state) < k, size(state).cast("double"))
      .otherwise(lit((k - 1).toDouble * HashSpace) /
        element_at(state, k).cast("double"))

  /** Count-min sketch (Cormode & Muthukrishnan 2005): `depth` hash rows ×
    * `width` counters per row. Every counter is a SUM of increments —
    * order-independent — and the row hashes are md5-derived, so the whole
    * sketch (and any estimate read from it) is bit-identical in any
    * engine: even the approximation error is oracle-checkable. The
    * counter table is depth·width rows REGARDLESS of corpus size, and the
    * hash aggregate combines map-side, so the exchange carries at most
    * depth·width rows per partition — sketch-sized state from a
    * 100 TB column.
    */
  def cmBucket(item: Column, row: Column, width: Int): Column =
    pmod(hash60(concat(row.cast("string"), lit(":"), item)), lit(width.toLong))

  /** A built sketch: the (depth, width) shape travels WITH the counter
    * table — probing with mismatched free parameters would hash probes
    * into buckets the counters never populated and silently break the
    * never-undercount guarantee.
    */
  final case class CmSketch(counters: org.apache.spark.sql.DataFrame,
      depth: Int, width: Int)

  def cmSketch(items: org.apache.spark.sql.DataFrame, itemCol: String,
      depth: Int, width: Int): CmSketch =
    CmSketch(cmCounters(items, itemCol, depth, width), depth, width)

  /** The raw counter table (row, bucket, cnt) — for callers that stream
    * or persist the counters themselves; prefer [[cmSketch]] +
    * [[cmEstimate]], which cannot mismatch the shape.
    */
  def cmCounters(items: org.apache.spark.sql.DataFrame, itemCol: String,
      depth: Int, width: Int): org.apache.spark.sql.DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch shape $depth x $width")
    items
      // null items are ignored (count_distinct/KMV-style semantics): the
      // bucket hash null-propagates, so nulls would otherwise count into
      // an unprobeable NULL bucket — an invisible undercount at probe time
      .filter(col(itemCol).isNotNull)
      .select(explode(sequence(lit(0), lit(depth - 1))).as("row"),
        col(itemCol).as("item"))
      .withColumn("bucket", cmBucket(col("item"), col("row"), width))
      .groupBy(col("row"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge two CM sketches built with the SAME shape: every counter is a
    * sum, so the sketch of A ∪ B is the per-(row,bucket) counter sum —
    * exactly what sketching the union directly would produce. Pairs with
    * [[saveCm]]/[[loadCm]] for incremental corpus growth: sketch only the
    * new batch, merge into the stored counters, re-save; history is never
    * rescanned.
    */
  def mergeCm(a: CmSketch, b: CmSketch): CmSketch = {
    require(a.depth == b.depth && a.width == b.width,
      s"cannot merge CM sketches of different shapes " +
        s"(${a.depth}x${a.width} vs ${b.depth}x${b.width})")
    CmSketch(
      a.counters.unionByName(b.counters)
        .groupBy(col("row"), col("bucket"))
        .agg(sum(col("cnt")).as("cnt")),
      a.depth, a.width)
  }

  /** Fold a new batch's sketch into the persisted store at `path`, in
    * place. The merged counters are MATERIALIZED (localCheckpoint, off
    * the source files) before the overwrite — the merge plan lazily
    * reads the very parquet files the write replaces, so writing the
    * un-materialized plan would scan half-deleted inputs. This is the
    * streaming-maintenance hook: `foreachBatch` sketches each micro-batch
    * alone, probes [[cmStoreExists]] (create-on-absent, never
    * catch-and-create — see that method's doc), and appends here; history
    * is never rescanned (`StreamingSpec` proves stream-maintained ==
    * batch-of-everything).
    *
    * Crash semantics: the rewrite is detectable, not atomic — a crash
    * mid-save leaves the store manifest-less, so the next load/append
    * FAILS FAST instead of serving partial counters; recovery is
    * restoring a copy or re-sketching the corpus. Exactly-once streaming
    * maintenance additionally requires batchId-idempotent guards in the
    * foreachBatch (standard Structured Streaming practice for any
    * non-transactional sink).
    */
  def appendCm(spark: SparkSession, path: String, batch: CmSketch,
      batchId: Option[Long] = None): Unit = {
    // idempotence hook: a restarted streaming query re-delivers its last
    // micro-batch; when the caller passes the foreachBatch batchId and it
    // matches the one already recorded in the manifest, the append is a
    // no-op instead of double-counting every counter
    if (batchId.isDefined && batchId == lastBatchId(spark, path, CmManifestFile))
      return
    val merged = mergeCm(loadCm(spark, path), batch)
    saveCm(CmSketch(ClusterOps.flatten(merged.counters),
      merged.depth, merged.width), path, batchId)
  }

  /** The batchId recorded by the last manifested append at `path`, if any
    * — the [[appendCm]]/[[appendKmv]] idempotence marker.
    */
  def lastBatchId(spark: SparkSession, path: String,
      manifestFile: String): Option[Long] =
    // the parse itself is StoreUtil.lastBatchOf — ONE sign-tolerant
    // rule, shared with every append that already holds the manifest
    // string (appendPq's prevLast, appendMixStats, ProvenanceLog)
    graft.StoreUtil.readMarker(spark, path, manifestFile)
      .flatMap(graft.StoreUtil.lastBatchOf)

  private def batchField(batchId: Option[Long]): String =
    batchId.map(id => s""","last_batch":$id""").getOrElse("")

  /** Point-estimate counts for a probe set: est(x) = min over rows of
    * counter[row][h_row(x)]. CM never undercounts; the estimate is exact
    * unless x collides with other items in EVERY row. The counter table
    * broadcasts (≤ depth·width rows), so probing shuffles nothing but the
    * final per-item min aggregate.
    */
  def cmEstimate(sk: CmSketch, probes: org.apache.spark.sql.DataFrame,
      itemCol: String): org.apache.spark.sql.DataFrame =
    probes.select(col(itemCol).as("item"))
      // null probes mirror cmCounters' null-ignoring build semantics:
      // nulls were never counted, so they have no estimate row
      .filter(col("item").isNotNull)
      .withColumn("row", explode(sequence(lit(0), lit(sk.depth - 1))))
      .withColumn("bucket", cmBucket(col("item"), col("row"), sk.width))
      .join(broadcast(sk.counters), Seq("row", "bucket"), "left_outer")
      .groupBy(col("item"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** Persist a built CM sketch: the counter table (depth·width rows —
    * kilobytes regardless of the corpus it summarized) plus a manifest
    * carrying the (depth, width) shape, so a probe can never run against
    * mismatched free parameters. Build once over the 100 TB column;
    * serve heavy-hitter estimates forever from the artifact.
    */
  val CmManifestFile = "_graft_cmstore.json"

  /** Whether a healthy CM store exists at `path` — the first-batch probe
    * for maintenance loops. A loop must NOT express "create on first
    * batch" by catching load's IllegalStateException around [[appendCm]]:
    * that catch also swallows "store broken" (crash mid-save, corrupt
    * manifest) and would silently reset the store to the current batch's
    * counters, discarding all history — exactly the failure the fail-fast
    * manifest protocol exists to surface. This probe therefore refuses
    * the ambiguous state itself: manifest absent but counters present is
    * a BROKEN store (crash mid-save), not an absent one.
    *
    * SINGLE WRITER assumed across the whole probe/save/append protocol
    * (like every manifested store here): two concurrent maintainers can
    * interleave the delete-marker/overwrite/write-marker window and
    * silently lose or double-count counters. Run one maintenance loop
    * per store; a restarted-query overlap with its own zombie batch is
    * what the [[appendCm]] batchId guard covers, not concurrency.
    */
  def cmStoreExists(spark: SparkSession, path: String): Boolean =
    graft.StoreUtil.manifestedStoreExists(spark, path, "counters",
      CmManifestFile, "counters",
      "a previous save crashed mid-write; restore a copy or re-sketch " +
        "the corpus")

  def saveCm(sk: CmSketch, path: String, batchId: Option[Long] = None): Unit =
    // crash protocol lives in StoreUtil.saveManifested: full swap-dir
    // write, manifest fence, atomic rename — partial counters silently
    // served would violate never-undercount
    graft.StoreUtil.saveManifested(sk.counters, path, "counters",
      CmManifestFile,
      s"""{"version":1,"depth":${sk.depth},"width":${sk.width}""" +
        batchField(batchId) + "}")

  /** Open a persisted CM sketch; fails fast on a directory that is not a
    * sketch store. The counters broadcast at probe time exactly as a
    * freshly-built sketch's would.
    */
  def loadCm(spark: SparkSession, path: String): CmSketch = {
    val m = graft.StoreUtil.requireManifest(spark, path, CmManifestFile,
      "count-min store")
    def field(k: String): Int =
      graft.StoreUtil.manifestInt(m, k, s"count-min manifest at $path")
    CmSketch(spark.read.parquet(s"$path/counters"),
      field("depth"), field("width"))
  }

  /** Persist a per-group KMV sketch table (group key columns + `state`,
    * the ≤ k sorted minimum hashes): kilobytes per group regardless of
    * corpus size. The manifest carries k, so estimates can never be read
    * with the wrong closed form.
    */
  val KmvManifestFile = "_graft_kmvstore.json"

  def saveKmv(states: org.apache.spark.sql.DataFrame, k: Int,
      path: String, batchId: Option[Long] = None): Unit =
    graft.StoreUtil.saveManifested(states, path, "state", KmvManifestFile,
      s"""{"version":1,"k":$k""" + batchField(batchId) + "}")

  /** Open a persisted KMV sketch table: (state table, k). */
  def loadKmv(spark: SparkSession,
      path: String): (org.apache.spark.sql.DataFrame, Int) = {
    val m = graft.StoreUtil.requireManifest(spark, path, KmvManifestFile,
      "KMV store")
    (spark.read.parquet(s"$path/state"),
      graft.StoreUtil.manifestInt(m, "k", s"KMV manifest at $path"))
  }

  /** Whether a healthy KMV store exists at `path` — same probe discipline
    * (and the same SINGLE-WRITER assumption) as [[cmStoreExists]]: state
    * files without a manifest mean a crashed save, which must refuse, not
    * read as absent.
    */
  def kmvStoreExists(spark: SparkSession, path: String): Boolean =
    graft.StoreUtil.manifestedStoreExists(spark, path, "state",
      KmvManifestFile, "state",
      "a previous save crashed mid-write; restore a copy or re-sketch " +
        "the corpus")

  /** Fold a new batch's per-group KMV states into the persisted store at
    * `path`, in place — the KMV leg of the build-once/append/serve
    * lifecycle ([[appendCm]] is the CM leg): stored and batch states
    * explode to their hashes and re-fold under the store's own k, so
    * history is never rescanned (the state IS the mergeable summary) and
    * the result is bit-identical to sketching old ∪ new in one pass.
    * Every non-`state` column is part of the group key — mergeable
    * payload columns don't exist in general, so callers maintain any
    * side statistics themselves. Same materialize-then-overwrite crash
    * protocol, single-writer assumption, and optional batchId
    * idempotence guard as the CM leg.
    */
  def appendKmv(spark: SparkSession, path: String,
      batchStates: org.apache.spark.sql.DataFrame,
      batchId: Option[Long] = None): Unit = {
    if (batchId.isDefined && batchId == lastBatchId(spark, path, KmvManifestFile))
      return
    val (stored, k) = loadKmv(spark, path)
    require(batchStates.columns.sorted.toSeq == stored.columns.sorted.toSeq,
      s"batch states (${batchStates.columns.mkString(",")}) do not match " +
        s"the stored schema (${stored.columns.mkString(",")})")
    val keys = stored.columns.filterNot(_ == "state").toSeq
    val merged = stored.unionByName(batchStates)
      // explode_outer + the null-ignoring re-fold keeps groups whose
      // stored state is empty (all-null inputs) alive through the merge
      .select(keys.map(col) :+ explode_outer(col("state")).as("h"): _*)
      .groupBy(keys.map(col): _*)
      .agg(kmvStateOfHashes(col("h"), k).as("state"))
    // materialize off the source files before overwriting them (the
    // merge plan lazily reads the very parquet the write replaces)
    saveKmv(ClusterOps.flatten(merged), k, path, batchId)
  }

  /** Typed bounded reservoir: keep the `cap` (rank, value) pairs with the
    * smallest rank hashes, totally ordered by (rank, value) so the
    * truncation at `cap` is deterministic under ANY partitioning/merge
    * order. The aggregation buffer is ≤ cap pairs NO MATTER the group
    * size — the absolute per-group state bound [[sampledQuantiles]] needs
    * at 100 TB — and it partial-aggregates map-side. Rank-hash collisions
    * between distinct rows are KEPT, not dropped (each input row reaches
    * reduce exactly once, so equal ranks are different rows — dropping
    * one would silently lose a sampled value); when the group has ≤ cap
    * rows the reservoir therefore holds ALL of them and estimates are
    * exactly the unbounded order statistics. Inserts are a binary search
    * + one arraycopy (no re-sort): accepted-insert probability decays as
    * cap/i, so total work per task is O(n log cap + cap² ln(n/cap))
    * element moves — seconds for cap 8192 over 10¹¹-row groups, where a
    * per-insert re-sort at a large cap would effectively hang.
    */
  class ReservoirAgg(cap: Int)
      extends Aggregator[(Long, Double), Array[(Long, Double)], Array[Double]] {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    override def zero: Array[(Long, Double)] = Array.empty
    override def reduce(buf: Array[(Long, Double)],
        x: (Long, Double)): Array[(Long, Double)] = insert(buf, x)
    override def merge(a: Array[(Long, Double)],
        b: Array[(Long, Double)]): Array[(Long, Double)] = b.foldLeft(a)(insert)
    private def cmp(a: (Long, Double), b: (Long, Double)): Int = {
      val c = java.lang.Long.compare(a._1, b._1)
      if (c != 0) c else java.lang.Double.compare(a._2, b._2)
    }
    private def insert(buf: Array[(Long, Double)],
        x: (Long, Double)): Array[(Long, Double)] = {
      if (buf.length >= cap && cmp(x, buf(buf.length - 1)) >= 0) buf
      else {
        // binary search for the insertion point in the (rank, value)-sorted
        // buffer; duplicates insert adjacently, never replace
        var lo = 0
        var hi = buf.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (cmp(buf(mid), x) <= 0) lo = mid + 1 else hi = mid
        }
        val outLen = math.min(buf.length + 1, cap)
        val out = new Array[(Long, Double)](outLen)
        System.arraycopy(buf, 0, out, 0, lo)
        out(lo) = x
        if (lo + 1 < outLen) System.arraycopy(buf, lo, out, lo + 1, outLen - lo - 1)
        out
      }
    }
    override def finish(buf: Array[(Long, Double)]): Array[Double] =
      buf.map(_._2).sorted
    override def bufferEncoder: Encoder[Array[(Long, Double)]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder()
  }

  /** Bounded top-k-per-group aggregator: keeps the `cap` best
    * (score, id) pairs — score DESCENDING, id ascending on ties, so the
    * result is deterministic on any data and any partitioning. This is
    * the scale path for "top N per group": a window `row_number <= N`
    * sorts EVERY group's full contents under the exchange, where this
    * aggregator's state is ≤ cap pairs per group per partition and
    * partial aggregation shrinks the shuffle to cap rows per
    * (group, input partition) — at 100 TB the exchange carries the
    * candidates, not the corpus. Same binary-search insert discipline
    * as [[ReservoirAgg]] (its O(n log cap) hot-group bound applies).
    */
  class TopKAgg(cap: Int)
      extends Aggregator[(Long, Long), Array[(Long, Long)], Array[(Long, Long)]] {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    override def zero: Array[(Long, Long)] = Array.empty
    override def reduce(buf: Array[(Long, Long)],
        x: (Long, Long)): Array[(Long, Long)] = insert(buf, x)
    override def merge(a: Array[(Long, Long)],
        b: Array[(Long, Long)]): Array[(Long, Long)] = b.foldLeft(a)(insert)
    // "better" sorts first: higher score, then lower id
    private def cmp(a: (Long, Long), b: (Long, Long)): Int = {
      val c = java.lang.Long.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
    private def insert(buf: Array[(Long, Long)],
        x: (Long, Long)): Array[(Long, Long)] = {
      if (buf.length >= cap && cmp(x, buf(buf.length - 1)) >= 0) buf
      else {
        var lo = 0
        var hi = buf.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (cmp(buf(mid), x) <= 0) lo = mid + 1 else hi = mid
        }
        val outLen = math.min(buf.length + 1, cap)
        val out = new Array[(Long, Long)](outLen)
        System.arraycopy(buf, 0, out, 0, lo)
        out(lo) = x
        if (lo + 1 < outLen) System.arraycopy(buf, lo, out, lo + 1, outLen - lo - 1)
        out
      }
    }
    override def finish(buf: Array[(Long, Long)]): Array[(Long, Long)] = buf
    override def bufferEncoder: Encoder[Array[(Long, Long)]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[(Long, Long)]] = ExpressionEncoder()
  }

  /** Top `k` rows per group as (group, rnk, score, id) — the aggregator
    * form of `row_number() OVER (... ORDER BY score DESC, id) <= k`,
    * bit-equal to it (both orders are total), with the window's full
    * per-group sort replaced by the bounded [[TopKAgg]] state.
    *
    * Null-row boundary of the bit-equality claim: null score/id rows
    * are filtered BEFORE grouping (they can't rank — see below), so a
    * group whose rows are ALL null vanishes from this output, whereas
    * the window form (default null ordering) would still emit its rows
    * with null-ranked tails. Rows that can rank are identical in both
    * forms; only the no-rankable-rows group differs, and "a group with
    * nothing rankable has no top-k" is this operator's contract.
    *
    * Score and id must be integral columns: a silent cast("long") on a
    * double score would truncate 3.9 and 3.1 into a tie and rank a
    * DIFFERENT row than the window form (breaking the bit-equality this
    * exists to guarantee), and on a string id it throws at runtime
    * under ANSI mode anyway — so non-integral inputs are refused at
    * plan time with a message instead.
    */
  def topKPerGroup(df: org.apache.spark.sql.DataFrame, groupCol: String,
      scoreCol: String, idCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    Seq(scoreCol, idCol).foreach { c =>
      val t = df.schema(c).dataType
      require(t == org.apache.spark.sql.types.LongType ||
          t == org.apache.spark.sql.types.IntegerType ||
          t == org.apache.spark.sql.types.ShortType ||
          t == org.apache.spark.sql.types.ByteType,
        s"topKPerGroup requires integral score/id columns; '$c' is $t " +
          "(a lossy cast would silently rank differently than the " +
          "window form)")
    }
    val agg = udaf(new TopKAgg(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
    df
      // nulls can't rank: a null score/id tuple would kill the primitive
      // tuple encoder, and SQL row_number over them is engine-dependent
      .filter(col(scoreCol).isNotNull && col(idCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(agg(col(scoreCol).cast("long"), col(idCol).cast("long")).as("top"))
      .select(col(groupCol), posexplode(col("top")))
      .select(col(groupCol), (col("pos") + 1).cast("long").as("rnk"),
        col("col._1").as(scoreCol), col("col._2").as(idCol))
  }

  /** Deterministic sampled quantiles: exact discrete order statistics
    * (rank ⌈q·n⌉, 1-based) over the hash-gated row sample
    * ([[SampleOps.hashSample]] semantics), retained through a BOUNDED
    * deterministic reservoir: per group the aggregation state is at most
    * `cap` values — an absolute bound, not the rate-bounded
    * `collect_list` a hot key could still blow up at 100 TB (rate 0.01
    * of a 10¹¹-row group is 10⁹ doubles in one buffer). When the group's
    * sample fits the cap — every tested SF; asserted by a SketchSpec
    * property — the reservoir degenerates to the full sample and the
    * quantiles are bit-identical to the unbounded form, which is what
    * the DuckDB oracle computes. Because both the sample membership
    * (md5 predicate) and the rank definition are engine-independent,
    * the estimate is oracle-checkable, where `percentile_approx`'s
    * sketch is engine-private.
    *
    * @param idCol  unique row key the sample gates on
    * @param keyCol group column
    * @param valCol numeric column to summarize
    * @param cap    absolute per-group reservoir bound
    */
  def sampledQuantiles(df: org.apache.spark.sql.DataFrame, idCol: String,
      keyCol: String, valCol: String, qs: Seq[Double], rate: Double,
      salt: String, cap: Int = 8192): org.apache.spark.sql.DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0))
    val res = udaf(new ReservoirAgg(cap),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
    SampleOps.hashSample(df, idCol, rate, salt)
      // null measurements AND null row ids are ignored (SQL aggregate
      // semantics) — the typed aggregator's primitive tuple encoder would
      // otherwise fail the job on the first null. The idCol guard is
      // defense in depth: hashSample's bucket hash now null-propagates
      // (so null ids are already dropped there), but this aggregation
      // must not depend on the sampler's internals for its own safety
      .filter(col(valCol).isNotNull && col(idCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(res(hash60(concat(lit(salt), lit("#rsv:"), col(idCol).cast("string"))),
          col(valCol).cast("double")).as("vs"),
        count(lit(1)).as("n_sample"))
      .select(col(keyCol), col("n_sample"),
        explode(array(qs.map(lit(_)): _*)).as("q"), col("vs"))
      .select(col(keyCol), col("n_sample"), col("q"),
        element_at(col("vs"),
          greatest(lit(1L), ceil(col("q") * size(col("vs")))).cast("int"))
          .as("quantile"))
  }

  // ---------------------------------------------------------------- bloom

  /** A built Bloom filter: `bits` is the set-bit table (row, bucket) —
    * DISTINCT pairs, the sparse form of the bit array — with the
    * (depth, width) shape traveling alongside, same rationale as
    * [[CmSketch]]: probing with mismatched free parameters would hash
    * into positions the build never set and silently break the
    * never-false-negative guarantee.
    *
    * Bloom is the MEMBERSHIP sibling of count-min: same per-row bucket
    * hash ([[cmBucket]]), but each cell is a bit, not a counter — "was
    * this item ever inserted?" with no false negatives and a bounded
    * false-positive rate. The crawl-frontier primitive: "definitely new"
    * skips the history lookup entirely; "maybe seen" falls through to an
    * exact check. Like KMV and CM — and unlike library blooms seeded
    * with JVM-private hashes — every bit position is md5-derived, so the
    * filter AND its false positives are bit-reproducible cross-engine
    * and the DuckDB oracle checks the membership answers themselves,
    * false positives included.
    *
    * State is ≤ depth·width rows no matter how many items were
    * inserted; merging two filters over the same shape is the exact OR
    * of their bits (union-distinct of rows) — associative, commutative,
    * idempotent — which is what makes [[appendBloom]] maintenance safe
    * under partial re-insertion (re-adding seen items is a no-op by
    * construction).
    */
  final case class BloomSketch(bits: org.apache.spark.sql.DataFrame,
      depth: Int, width: Int)

  /** The set-bit table for an item column: depth positions per item,
    * distinct. Null items are ignored (the bucket hash null-propagates;
    * a null would otherwise set an unprobeable NULL position — an
    * invisible false negative at probe time).
    */
  def bloomBits(items: org.apache.spark.sql.DataFrame, itemCol: String,
      depth: Int, width: Int): org.apache.spark.sql.DataFrame = {
    require(depth >= 1 && width >= 2, s"bad bloom shape $depth x $width")
    items.select(col(itemCol).as("item"))
      .filter(col("item").isNotNull)
      .withColumn("row", explode(sequence(lit(0), lit(depth - 1))))
      .select(col("row"), cmBucket(col("item"), col("row"), width).as("bucket"))
      .distinct()
  }

  def bloomSketch(items: org.apache.spark.sql.DataFrame, itemCol: String,
      depth: Int, width: Int): BloomSketch =
    BloomSketch(bloomBits(items, itemCol, depth, width), depth, width)

  /** Membership probe: one row per distinct non-null probe item,
    * `might_contain` true iff ALL `depth` of its positions are set. The
    * bit table broadcasts (≤ depth·width rows — kilobytes at any corpus
    * size), so probing shuffles nothing but the per-item conjunction.
    * No false negatives ever; false positives at the standard
    * (1 − e^(−depth·n/width))^depth rate, deterministic given the data.
    */
  def bloomMightContain(sk: BloomSketch,
      probes: org.apache.spark.sql.DataFrame,
      itemCol: String): org.apache.spark.sql.DataFrame =
    probes.select(col(itemCol).as("item"))
      .filter(col("item").isNotNull).distinct()
      .withColumn("row", explode(sequence(lit(0), lit(sk.depth - 1))))
      .withColumn("bucket", cmBucket(col("item"), col("row"), sk.width))
      .join(broadcast(sk.bits.withColumn("set", lit(1))),
        Seq("row", "bucket"), "left_outer")
      .groupBy(col("item"))
      .agg((count(col("set")) === sk.depth).as("might_contain"))

  /** Exact OR of two filters over the same shape. */
  def mergeBloom(a: BloomSketch, b: BloomSketch): BloomSketch = {
    require(a.depth == b.depth && a.width == b.width,
      s"cannot merge bloom filters of different shapes " +
        s"(${a.depth}x${a.width} vs ${b.depth}x${b.width})")
    BloomSketch(a.bits.unionByName(b.bits).distinct(), a.depth, a.width)
  }

  val BloomManifestFile = "_graft_bloomstore.json"

  /** Probe-never-catch-and-create, exactly [[cmStoreExists]]'s contract
    * and for the same reason: bits present without a manifest is a
    * BROKEN store (crash mid-save), and silently rebuilding from the
    * current batch would discard every previously-seen item — turning
    * the no-false-negative filter into one that false-negatives all of
    * history.
    */
  def bloomStoreExists(spark: SparkSession, path: String): Boolean =
    graft.StoreUtil.manifestedStoreExists(spark, path, "bits",
      BloomManifestFile, "bloom bits",
      "a previous save crashed mid-write; restore a copy or rebuild " +
        "the filter")

  /** Persist a built filter: the sparse bit table plus a shape-carrying
    * manifest ([[StoreUtil.saveManifested]] crash protocol). Build once
    * over the 100 TB seen-set; serve frontier checks forever from the
    * kilobyte artifact.
    */
  def saveBloom(sk: BloomSketch, path: String,
      batchId: Option[Long] = None): Unit =
    graft.StoreUtil.saveManifested(sk.bits, path, "bits", BloomManifestFile,
      s"""{"version":1,"depth":${sk.depth},"width":${sk.width}""" +
        batchField(batchId) + "}")

  def loadBloom(spark: SparkSession, path: String): BloomSketch = {
    val m = graft.StoreUtil.requireManifest(spark, path, BloomManifestFile,
      "bloom store")
    def field(k: String): Int =
      graft.StoreUtil.manifestInt(m, k, s"bloom manifest at $path")
    BloomSketch(spark.read.parquet(s"$path/bits"),
      field("depth"), field("width"))
  }

  /** OR a new batch's filter into the persisted store, in place — the
    * streaming-maintenance hook, same shape as [[appendCm]]: the merged
    * bits are materialized off the source files before the overwrite,
    * the foreachBatch probes [[bloomStoreExists]], and a re-delivered
    * batchId is a manifest-guarded no-op (the OR is idempotent anyway —
    * the guard just skips the pointless rewrite).
    */
  def appendBloom(spark: SparkSession, path: String, batch: BloomSketch,
      batchId: Option[Long] = None): Unit = {
    if (batchId.isDefined &&
        batchId == lastBatchId(spark, path, BloomManifestFile)) return
    val merged = mergeBloom(loadBloom(spark, path), batch)
    saveBloom(BloomSketch(ClusterOps.flatten(merged.bits),
      merged.depth, merged.width), path, batchId)
  }

  // ------------------------------------- decimal-log histogram sketch

  /** Mergeable quantile sketch — the quantile member of the sketch-store
    * family (KMV = distinct, CM = counts, Bloom = membership): a
    * DECIMAL-LOG HISTOGRAM over a long column. Each value lands in the
    * bin keyed by (digit count, first 3 decimal digits) of its
    * magnitude, signed — pure string/integer arithmetic, so binning is
    * bit-identical on any engine (a log()-based bin id differs in the
    * last ulp near boundaries and hash-mismatches the oracle; this is
    * the same determinism discipline as the md5 hashes above).
    *
    * Properties, all by construction:
    * - bounded state: ≤ ~2·19·900 + 1001 bins over the whole long
    *   range, independent of row count; the aggregation is a plain
    *   `groupBy(bin).count()` — map-side partial, one tiny exchange;
    * - EXACTLY mergeable: bins sum ([[mergeHist]]) — two batches folded
    *   equal the one-shot sketch bit for bit, so a persisted store
    *   grows without ever rescanning history ([[appendHist]]);
    * - bounded relative error: a bin's width is ≤ 1% of its magnitude
    *   (3 leading digits kept), and |v| < 1000 is represented EXACTLY;
    * - deterministic quantile read-out ([[histQuantiles]]): the gate's
    *   integer rank rule (max(1, ⌈p·n/100⌉), integer arithmetic only)
    *   walked over the cumulative bin counts.
    *
    * The estimate returned for a rank is the bin's signed magnitude
    * truncation: for v ≥ 0 the bin's lower bound (est ≤ true <
    * est·1.01 + 1), for v < 0 its upper bound (est·1.01 − 1 < true ≤
    * est). [[SelectOps]] is the exact complement when the number must
    * be right; this is the O(bins)-state summary a monitoring loop
    * keeps warm per stream.
    */
  def decHist(df: org.apache.spark.sql.DataFrame,
      valueCol: String): org.apache.spark.sql.DataFrame = {
    // integral only — the decimal cast would TRUNCATE a double column
    // silently and return wrong quantiles without error (the same
    // guard discipline as SelectOps.kthSmallestLongByGroup); scale
    // doubles to integer units (micros, cents) at the caller, where
    // the unit is known
    val vt = df.schema(valueCol).dataType
    require(Seq(org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(vt),
      s"decHist requires an integral value column; '$valueCol' is $vt — " +
        "scale floating-point values to integer units first")
    df.filter(col(valueCol).isNotNull)
      .groupBy(histBinCol(col(valueCol)).as("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** The bin expression: signed rpad-truncated magnitude.
    * abs() rides decimal(20,0), so Long.MinValue (whose long abs
    * overflows back to itself) bins correctly; the truncated magnitude
    * of 9223372036854775808 is 9220000000000000000, back inside long.
    */
  private[graft] def histBinCol(v: Column): Column = {
    val s = abs(v.cast("decimal(20,0)")).cast("string")
    val m = rpad(substring(s, 1, 3), length(s), lit("0"))
      .cast("decimal(20,0)")
    when(v < 0, -m).otherwise(m).cast("long")
  }

  /** The same binning as DuckDB SQL over a bigint expression. */
  def histBinSql(vExpr: String): String = {
    val s = s"CAST(abs(CAST($vExpr AS HUGEINT)) AS VARCHAR)"
    val m =
      s"CAST(rpad(substr($s, 1, 3), CAST(length($s) AS INT), '0') AS HUGEINT)"
    s"CAST(CASE WHEN $vExpr < 0 THEN -$m ELSE $m END AS BIGINT)"
  }

  /** Sum bins — the exact merge. Every non-`cnt` column is part of the
    * bin key (the [[appendKmv]] rule), so the plain and grouped
    * ([[decHistByGroup]]) layouts share one merge and one store
    * lifecycle.
    */
  def mergeHist(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    require(a.columns.sorted.toSeq == b.columns.sorted.toSeq,
      s"histogram schemas differ: ${a.columns.mkString(",")} vs " +
        b.columns.mkString(","))
    val keys = a.columns.filterNot(_ == "cnt").toSeq
    a.unionByName(b).groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Per-group decimal-log histogram: (g, bin, cnt) — same binning,
    * null groups excluded (no SQL grouping identity), all groups
    * sketched in ONE aggregation pass. State stays bounded per group
    * by the bin algebra; total state is O(groups · bins-touched).
    */
  def decHistByGroup(df: org.apache.spark.sql.DataFrame, groupCol: String,
      valueCol: String): org.apache.spark.sql.DataFrame = {
    val vt = df.schema(valueCol).dataType
    require(Seq(org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(vt),
      s"decHistByGroup requires an integral value column; '$valueCol' " +
        s"is $vt — scale floating-point values to integer units first")
    df.filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(col(groupCol).as("g"), histBinCol(col(valueCol)).as("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** (g, p, rank, est) per group — every group walked in the same
    * per-group cumulative window over the BIN table (bounded rows per
    * group by the bin algebra, so the window partitions are tiny by
    * construction), then one equi-join on g with the rank residual.
    */
  def histQuantilesByGroup(hist: org.apache.spark.sql.DataFrame,
      ps: Seq[Int]): org.apache.spark.sql.DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100),
      s"percentiles in [1,100]: $ps")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = hist.select(col("g"), col("bin"),
      sum(col("cnt")).over(w).as("cum"))
    val ranks = cum.groupBy(col("g")).agg(max(col("cum")).as("n"))
      .select(col("g").as("rg"),
        explode(array(ps.distinct.sorted.map(lit(_)): _*)).as("p"), col("n"))
      .select(col("rg"), col("p"),
        greatest(lit(1L),
          expr("(cast(p as bigint) * n + 99) div 100")).as("rank"))
    ranks.join(cum, col("rg") === col("g") && col("cum") >= col("rank"))
      .groupBy(col("rg").as("g"), col("p"), col("rank"))
      .agg(min(col("bin")).as("est"))
      .orderBy(col("g"), col("p"))
  }

  /** (p, rank, est) for the requested integer percentiles: rank under
    * the shared integer rank rule, est = value of the first bin whose
    * cumulative count reaches it. The cumulative walk is a
    * single-partition window over the BIN table — bounded at ~35k rows
    * by the bin algebra itself, never by the data, so the "no partition
    * defined" shape is safe here by construction.
    */
  def histQuantiles(hist: org.apache.spark.sql.DataFrame,
      ps: Seq[Int]): org.apache.spark.sql.DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100),
      s"percentiles in [1,100]: $ps")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = hist.select(col("bin"), sum(col("cnt")).over(w).as("cum"))
    val ranks = cum.agg(max(col("cum")).as("n"))
      .select(explode(array(ps.distinct.sorted.map(lit(_)): _*)).as("p"),
        col("n"))
      // integer `div`, never `/`: long / long is DOUBLE division in
      // Spark, and p·n+99 can exceed double exactness (the shared
      // integer rank rule of SelectOps.groupedPercentileFrame)
      .select(col("p"),
        greatest(lit(1L),
          expr("(cast(p as bigint) * n + 99) div 100")).as("rank"))
    ranks.join(cum, col("cum") >= col("rank"))
      .groupBy(col("p"), col("rank"))
      .agg(min(col("bin")).as("est"))
      .orderBy(col("p"))
  }

  /** Persisted histogram store — same manifest/crash/zombie protocol as
    * the KMV/CM/Bloom legs.
    */
  val HistManifestFile = "_graft_histstore.json"

  def saveHist(hist: org.apache.spark.sql.DataFrame, path: String,
      batchId: Option[Long] = None): Unit =
    graft.StoreUtil.saveManifested(hist, path, "bins", HistManifestFile,
      s"""{"version":1,"kind":"dec-hist"""" + batchField(batchId) + "}")

  def loadHist(spark: SparkSession,
      path: String): org.apache.spark.sql.DataFrame = {
    graft.StoreUtil.requireManifest(spark, path, HistManifestFile,
      "histogram store")
    spark.read.parquet(s"$path/bins")
  }

  /** Same single-writer probe discipline as [[cmStoreExists]]. */
  def histStoreExists(spark: SparkSession, path: String): Boolean =
    graft.StoreUtil.manifestedStoreExists(spark, path, "bins",
      HistManifestFile, "bins",
      "a previous save crashed mid-write; restore a copy or re-sketch " +
        "the corpus")

  /** Fold a batch's bins into the store, in place — history is never
    * rescanned (the bins ARE the summary; integer sums are exact, so
    * fold order is irrelevant). Materialize-then-overwrite crash
    * protocol and the batchId zombie guard, as in [[appendKmv]].
    */
  def appendHist(spark: SparkSession, path: String,
      batch: org.apache.spark.sql.DataFrame,
      batchId: Option[Long] = None): Unit = {
    if (batchId.isDefined &&
        batchId == lastBatchId(spark, path, HistManifestFile)) return
    val merged = mergeHist(loadHist(spark, path), batch)
    saveHist(ClusterOps.flatten(merged), path, batchId)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH band index — the incremental near-dup artifact.
  *
  * [[TextOps.minhashCandidates]] proves the banding *plan* (Σ bucket²,
  * never n²); this store makes the band table durable, which is what a
  * continuously-crawled corpus actually needs: when a new snapshot
  * arrives, its near-duplicates against ALL prior data must be found
  * without re-shingling, re-signing, or even re-reading the old corpus.
  * The stored index is `(band, band_key, id, ingest_batch)` — n·bands
  * rows of a few dozen bytes, a fixed small multiple of one id column
  * regardless of document length, because the text itself never enters
  * the store. At 100 TB of documents the index is the only history a
  * dedup pass touches, and [[candidates]] scans it exactly once with the
  * (small) new batch broadcast — no shuffle of history, ever.
  *
  * Ingest protocol ([[ingestBatch]]): each batch's NEW candidate pairs —
  * batch×history via the index join plus batch×batch via the in-memory
  * banding — are appended to a durable pair log before the batch's own
  * band rows join the index. Every unordered near-dup pair is therefore
  * emitted exactly once, by the batch of its later-arriving member, and
  * the fold over any batch split reproduces the one-shot
  * [[TextOps.minhashCandidates]] result bit-for-bit (gate `dd_lsh_store`
  * shares `dd_minhash_lsh`'s DuckDB oracle; `LshStoreSpec` proves
  * fold==one-shot on adversarial splits).
  *
  * Same durability contract as the sibling stores ([[VectorStore]],
  * [[SketchOps]] CM/KMV): a pending marker brackets the two appends, and
  * load/exists refuse a store whose marker is still present — a crash
  * mid-ingest fails fast at the next open instead of serving a
  * half-appended index, and [[recoverIngest]] rolls the partial batch
  * back out using the per-row `ingest_batch` tag. Zombie re-delivery of
  * a completed foreachBatch batch is a manifest-guarded no-op. SINGLE
  * WRITER assumed, like every manifested store here.
  *
  * Layout: `path/bands` (band, band_key, id, ingest_batch),
  * `path/pairs` (a, b, ingest_batch), `path/_graft_lshstore.json`.
  */
object LshStore {

  val ManifestFile = "_graft_lshstore.json"
  val PendingFile = "_graft_lsh_pending"

  /** A loaded index: `bands` is the stored band-row scan; `k`/`nBands`
    * are the manifest's signature parameters, carried here so a query
    * can never band its probe docs with different free parameters than
    * the index was built with (a mismatch finds nothing, silently).
    */
  final case class Loaded(bands: DataFrame, k: Int, nBands: Int, path: String)

  /** Band rows (id, band, band_key) for a document set — the same
    * tokenize-once / sign-bound-array discipline as
    * [[TextOps.minhashCandidates]] (the lambda-reinline lesson), and the
    * same null-text exclusion (null docs carry no signal and would all
    * collide in one md5('') bucket).
    */
  private[graft] def bandRows(docs: DataFrame, idCol: String, textCol: String,
      k: Int, bands: Int): DataFrame = {
    require(k % bands == 0,
      s"signature length k=$k must be divisible by bands=$bands " +
        "(a remainder would silently drop trailing signature rows)")
    val sig = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        array_distinct(TextOps.tokensCol(col(textCol))).as("toks"))
      .select(col("id"), TextOps.minhashOfTokens(col("toks"), k).as("sig"))
    TextOps.bandKeys(sig, "sig", bands, k / bands)
      .select(col("id"), col("band"), col("band_key"))
  }

  /** `ingests` counts completed ingest calls — it supplies a distinct
    * default row tag per batch when the caller passes no batchId (two
    * manual ingests sharing one tag would make [[recoverIngest]] roll
    * them both out). `last_batch` is recorded only for EXPLICIT batchIds:
    * a counter default written there would collide with a genuine
    * foreachBatch batch 0 and wrongly no-op it (the VectorStore batch-0
    * lesson: absent ≠ Some(0)).
    */
  private def manifest(k: Int, bands: Int, ingests: Long,
      batchId: Option[Long], compactedAt: Long = 0L): String =
    s"""{"version":1,"k":$k,"bands":$bands,"ingests":$ingests""" +
      s""","compacted_at":$compactedAt""" +
      batchId.map(id => s""","last_batch":$id""").getOrElse("") + "}"

  /** Fail on a store whose pending marker is still present: an ingest is
    * either in flight (single-writer violated) or crashed mid-append, and
    * both pair log and index may hold a partial batch.
    */
  private def refusePending(spark: SparkSession, path: String): Unit =
    if (graft.StoreUtil.readMarker(spark, path, PendingFile).isDefined)
      throw new IllegalStateException(
        s"$path has an unfinished ingest ($PendingFile present) — run " +
          "LshStore.recoverIngest(spark, path, dest) to roll it back")

  /** Whether a healthy index exists at `path`. A store with a pending
    * marker, or with band rows but no manifest, is BROKEN (crash
    * mid-ingest), not absent — refused here so a maintenance loop's
    * "create on first batch" branch cannot silently reset the index and
    * discard all history (the same ambiguity [[SketchOps.cmStoreExists]]
    * refuses).
    */
  def exists(spark: SparkSession, path: String): Boolean = {
    refusePending(spark, path)
    graft.StoreUtil.manifestedStoreExists(spark, path, "bands",
      ManifestFile, "band rows",
      "the first ingest crashed mid-write; delete the directory and " +
        "re-ingest the batch")
  }

  /** Open a persisted index; fails fast on a directory that is not one,
    * or whose last ingest never finished.
    */
  def load(spark: SparkSession, path: String): Loaded = {
    refusePending(spark, path)
    val m = graft.StoreUtil.requireManifest(spark, path, ManifestFile,
      "LSH band store")
    def field(key: String): Int =
      graft.StoreUtil.manifestInt(m, key, s"LSH manifest at $path")
    Loaded(spark.read.parquet(s"$path/bands"), field("k"), field("bands"), path)
  }

  private def orderPair(x: Column, y: Column): Seq[Column] =
    Seq(least(x, y).as("a"), greatest(x, y).as("b"))

  /** Batch×batch candidate pairs from an already-computed band-row
    * table — the same self-join [[TextOps.minhashCandidates]] builds
    * after its own banding, so results are bit-equal.
    */
  private def selfPairs(b: DataFrame): DataFrame =
    b.alias("x").join(b.alias("y"),
        col("x.band") === col("y.band") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))

  /** Cross + within pairs from an already-computed batch band table —
    * lets [[ingestBatch]] shingle/sign the batch ONCE and reuse the
    * rows for both pair derivations and the index append.
    */
  private def candidatesFromBands(historyBands: DataFrame,
      b: DataFrame): DataFrame = {
    val cross = historyBands.alias("h").join(broadcast(b.alias("n")),
        col("h.band") === col("n.band") &&
          col("h.band_key") === col("n.band_key") &&
          col("h.id") =!= col("n.id"))
      .select(orderPair(col("h.id"), col("n.id")): _*)
    cross.union(selfPairs(b)).distinct()
  }

  /** The NEW near-dup candidate pairs a batch introduces: batch×history
    * through the stored index, plus batch×batch through the in-memory
    * banding. The stored side is scanned exactly once and never
    * shuffled — the batch's band rows are explicitly broadcast, so the
    * join is a map-side probe of history (the property that makes
    * per-snapshot dedup affordable when history is 1000× the batch).
    * Signature parameters come from the MANIFEST, never the caller.
    */
  def candidates(st: Loaded, batch: DataFrame, idCol: String,
      textCol: String): DataFrame =
    candidatesFromBands(st.bands,
      bandRows(batch, idCol, textCol, st.k, st.nBands))

  /** All (a < b) candidate pairs WITHIN the stored corpus — the self-join
    * form, bit-equal to running [[TextOps.minhashCandidates]] over the
    * documents the index was built from (proven in `LshStoreSpec`).
    */
  def pairsWithin(st: Loaded): DataFrame =
    st.bands.alias("x").join(st.bands.alias("y"),
        col("x.band") === col("y.band") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()

  /** The durable pair log: every near-dup candidate pair the store has
    * emitted, exactly once each, with the batch that surfaced it.
    */
  def pairLog(spark: SparkSession, path: String): DataFrame =
    pairLogOk(spark, path).select(col("a"), col("b"), col("ingest_batch"))

  private def pairLogOk(spark: SparkSession, path: String): DataFrame = {
    refusePending(spark, path)
    spark.read.parquet(s"$path/pairs")
  }

  /** Ingest one batch: append its new candidate pairs to the pair log,
    * then its band rows to the index, creating the store on the first
    * batch. Idempotent under foreachBatch zombie re-delivery: when
    * `batchId` matches the manifest's `last_batch`, the whole call is a
    * no-op (the pairs were already emitted and the rows already
    * indexed — re-appending would duplicate band rows AND re-emit every
    * cross pair).
    *
    * Write order is load-bearing twice over: (1) the pair append runs
    * BEFORE the band append, and the candidate plan reads `bands/` — so
    * the new pairs are computed against pre-batch history by
    * construction, with no explicit materialization step (appending the
    * batch's own band rows first would make the lazy cross join see the
    * batch in "history" too); (2) the pending marker is written before
    * the first append and cleared only after the manifest rewrite, so a
    * crash anywhere between leaves a store every reader refuses, with
    * the pre-batch manifest intact — [[recoverIngest]] reads k/bands and
    * the pre-batch `last_batch` from it and rolls the tagged rows out.
    *
    * On append, `k`/`bands` are validated against the manifest — probing
    * or extending an index with different signature parameters is refused
    * rather than silently finding nothing.
    */
  def ingestBatch(spark: SparkSession, path: String, batch: DataFrame,
      idCol: String, textCol: String, k: Int = 8, bands: Int = 4,
      batchId: Option[Long] = None): Unit = {
    val present = exists(spark, path)
    val prevLastBatch =
      if (present) SketchOps.lastBatchId(spark, path, ManifestFile) else None
    if (present && batchId.isDefined && batchId == prevLastBatch) return
    // ONE manifest read serves ingests and the compaction watermark
    val mf =
      if (present) Some(graft.StoreUtil.requireManifest(spark, path,
        ManifestFile, "LSH band store"))
      else None
    val ingests: Long = mf.map(graft.StoreUtil.manifestLong(_, "ingests",
      s"LSH manifest at $path")).getOrElse(0L)
    // default row tag = NEGATIVE ingest counter, -(ingests+1): distinct
    // per call AND disjoint from every explicit foreachBatch id (those
    // are >= 0). With the old tag (= ingests) a manual catch-up ingest
    // between stream batches could share a tag with the NEXT stream
    // batch — the counters track in lockstep — and if that later batch
    // crashed mid-append, recoverIngest's `ingest_batch != bad` filter
    // would roll the COMPLETED manual batch's rows out with it
    val bid = batchId.getOrElse(-(ingests + 1L))
    val (kk, bb) = mf match {
      case Some(m) =>
        // parse from the held manifest string — load() would re-read it
        val sk = graft.StoreUtil.manifestInt(m, "k",
          s"LSH manifest at $path")
        val sb = graft.StoreUtil.manifestInt(m, "bands",
          s"LSH manifest at $path")
        require(k == sk && bands == sb,
          s"index at $path was built with k=$sk/bands=$sb; " +
            s"refusing ingest with k=$k/bands=$bands")
        (sk, sb)
      case None => (k, bands)
    }
    // shingle + sign ONCE: the materialized band table feeds the cross
    // join, the within-batch self-join, AND the index append — the
    // inline form would run the regex tokenizer and k seeded md5 minima
    // three times per micro-batch
    val b = ClusterOps.flatten(bandRows(batch, idCol, textCol, kk, bb))
    val newPairs =
      if (present)
        candidatesFromBands(spark.read.parquet(s"$path/bands"), b)
      else selfPairs(b).distinct()
    graft.StoreUtil.writeMarker(spark, path, PendingFile,
      s"$bid:$ingests")
    val mode = if (present) "append" else "overwrite"
    // ingest_seq = ingests+1 is the ROLLBACK identity: store-unique by
    // construction, where ingest_batch (the caller's foreachBatch id,
    // kept for pair-log observability) can alias across stream
    // generations — a fresh checkpoint re-starts at batch 0, and a
    // crash of that ingest must not roll an OLDER batch-0's rows out
    val seq = ingests + 1L
    newPairs.withColumn("ingest_batch", lit(bid))
      .withColumn("ingest_seq", lit(seq))
      .write.mode(mode).parquet(s"$path/pairs")
    b.withColumn("ingest_batch", lit(bid))
      .withColumn("ingest_seq", lit(seq))
      .write.mode(mode).parquet(s"$path/bands")
    // an ingest WITHOUT a batchId must not erase a previous explicit
    // last_batch: a manual catch-up ingest between a streaming crash and
    // its restart would otherwise disarm the zombie guard and let the
    // redelivered batch ingest twice
    graft.StoreUtil.writeMarker(spark, path, ManifestFile,
      manifest(kk, bb, ingests + 1L, batchId.orElse(prevLastBatch),
        mf.map(graft.StoreUtil.compactedAtOf).getOrElse(0L)))
    graft.StoreUtil.deleteMarker(spark, path, PendingFile)
  }

  /** Roll an interrupted ingest back out: rebuild the store at `dest`
    * (disjoint from `path` — the source is read lazily while the
    * destination is written) without the pending batch's band rows or
    * pairs. The manifest survives every crash window because ingest
    * rewrites it only after both appends — and it is copied to `dest`
    * VERBATIM, which is correct in both windows: a crash before the
    * manifest rewrite leaves the pre-batch manifest (matching the
    * cleaned tables), and a crash after it (only the marker delete was
    * lost) means the ingest COMPLETED — detected by the manifest's
    * `ingests` counter having moved past the pending marker's start
    * snapshot, a witness that works for default-tag ingests too — so
    * nothing is filtered and the post-batch manifest
    * matches. A crash during the very first ingest (no manifest yet) is
    * unrecoverable-by-rollback: nothing pre-batch exists, so delete the
    * directory and re-ingest.
    */
  def recoverIngest(spark: SparkSession, path: String, dest: String): Unit = {
    val pending = graft.StoreUtil.readMarker(spark, path, PendingFile)
      .getOrElse(throw new IllegalStateException(
        s"no interrupted ingest recorded at $path")).trim
    // marker format "bid:ingestsAtStart" — the counter snapshot is the
    // completion witness that works for DEFAULT-tag ingests too, where
    // last_batch never records the bid: the manifest rewrite always
    // bumps `ingests`, so an unchanged counter means the crash happened
    // before the rewrite (roll the batch out) and a bumped one means
    // the ingest completed and only the marker delete was lost (keep
    // everything)
    val Array(badStr, startStr) = pending.split(":", 2)
    val bad = badStr.toLong
    val m = graft.StoreUtil.readMarker(spark, path, ManifestFile)
      .getOrElse(throw new IllegalStateException(
        s"$path's first ingest crashed (no pre-batch manifest survives) — " +
          "delete the directory and re-ingest the batch"))
    graft.StoreUtil.requireDisjoint(spark, path, dest, "recover")
    val completed = graft.StoreUtil.manifestLong(m, "ingests",
      s"LSH manifest at $path").toLong != startStr.toLong
    // prefer the store-unique ingest_seq (= startSnapshot+1 for the
    // crashed ingest) over the batch tag: an explicit batchId can alias
    // an OLDER ingest's tag (fresh-checkpoint streams restart at 0), and
    // tag-filtering would roll that completed ingest's rows out too.
    // seq-less rows (written by a pre-seq version) fall back to the tag.
    val badSeq = startStr.toLong + 1L
    def clean(table: String): DataFrame = {
      // mergeSchema: a store created by a pre-seq build and ingested
      // into since holds MIXED file schemas — without the union schema,
      // whether ingest_seq (the alias-safe rollback identity) is even
      // visible depends on which footer Spark samples, making the
      // rollback nondeterministically tag-based. Old rows surface with
      // ingest_seq NULL, which the coalesce below already routes to the
      // tag fallback (VectorStore.appendPq handles legacy the same way).
      val t = spark.read.option("mergeSchema", "true")
        .parquet(s"$path/$table")
      if (completed) t
      else if (t.columns.contains("ingest_seq"))
        t.filter(coalesce(col("ingest_seq") =!= badSeq,
          col("ingest_batch") =!= bad))
      else t.filter(col("ingest_batch") =!= bad)
    }
    graft.StoreUtil.deleteMarker(spark, dest, ManifestFile)
    clean("pairs").write.mode("overwrite").parquet(s"$dest/pairs")
    clean("bands").write.mode("overwrite").parquet(s"$dest/bands")
    graft.StoreUtil.writeMarker(spark, dest, ManifestFile, m)
  }

  /** Rewrite an ingest-grown store into a fresh compact layout at
    * `dest` — the periodic maintenance step of the ingest-many-times
    * lifecycle (each [[ingestBatch]] adds a file set per table; reads
    * stay correct but open more files until compaction). `dest` must be
    * disjoint from `path` (the source is read lazily while the
    * destination is written); the manifest's parameters, ingest counter,
    * and the zombie guard's `last_batch` all survive, and the
    * `compacted_at` watermark ADVANCES to the current ingest count
    * (so [[needsCompact]] resets). Row content — including every
    * `ingest_batch` tag — is unchanged. `files` is the per-table output file count (the
    * source's read partitioning would otherwise leak through — tiny
    * appended files each become a partition and re-emerge unmerged);
    * the default suits the kilobytes-per-million-docs scale of these
    * tables, pass more for a corpus where one band file is unwieldy.
    */
  def compact(spark: SparkSession, path: String, dest: String,
      files: Int = 1): Unit = {
    refusePending(spark, path)
    require(files >= 1, s"files must be >= 1, got $files")
    val m = graft.StoreUtil.requireManifest(spark, path, ManifestFile,
      "LSH band store")
    graft.StoreUtil.requireDisjoint(spark, path, dest, "compact")
    graft.StoreUtil.deleteMarker(spark, dest, ManifestFile)
    // mergeSchema for the same mixed-schema reason as recoverIngest —
    // sampling a pre-seq footer here would silently DROP ingest_seq
    // from every row of the compacted store
    spark.read.option("mergeSchema", "true").parquet(s"$path/pairs")
      .repartition(files)
      .write.mode("overwrite").parquet(s"$dest/pairs")
    spark.read.option("mergeSchema", "true").parquet(s"$path/bands")
      .repartition(files)
      .write.mode("overwrite").parquet(s"$dest/bands")
    // advance the compaction watermark so needsCompact resets until
    // `slack` more batches fold on top of the compacted store
    graft.StoreUtil.writeMarker(spark, dest, ManifestFile,
      graft.StoreUtil.withCompactedAt(m, graft.StoreUtil.manifestLong(m,
        "ingests", s"LSH manifest at $path")))
  }

  /** Maintenance nudge (the LM store's family-shared rule): each
    * ingest stacks another file set into `pairs` and `bands`, so probe
    * cost grows with batches since compaction — trip after `slack`.
    */
  def needsCompact(spark: SparkSession, path: String,
      slack: Int = 8): Boolean = {
    refusePending(spark, path)
    graft.StoreUtil.needsCompactFrom(
      graft.StoreUtil.requireManifest(spark, path, ManifestFile,
        "LSH band store"),
      slack, s"LSH manifest at $path")
  }
}

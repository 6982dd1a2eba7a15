package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted index — the RETRIEVAL serving artifact, the
  * analog of the reference's Lucene indexes
  * (GraphBase.java:431-448) for full-text scoring instead of point
  * lookup: one corpus pass at build time writes a postings table
  * `(term, doc_id, tf, len)` BUCKETED BY TERM, so a query reads only
  * its own terms' buckets (`SelectedBucketsCount` — the same pruning
  * contract `TreeStore` proves for node ids) and never touches the
  * corpus again. Document length rides ON the posting row (classic
  * index denormalization): scoring needs len per matching doc, and
  * carrying it beats a corpus-sized join against a lengths table at
  * query time. Corpus-level stats (N docs, total length — what idf
  * and length-normalization need) are two integers in the manifest.
  *
  * [[queryBm25]] is DEFINED bit-identical to [[TextOps.bm25]] over
  * the same corpus: same tokenizer ([[TextOps.bm25Base]]), same
  * integer scoring tail ([[TextOps.bm25Rank]]), df recomputed from
  * the pruned postings themselves (a count over the terms' buckets —
  * no separate df table to drift). What changes is the IO: the
  * in-memory form scans and tokenizes the corpus per query; the
  * store serves from ~|terms|/buckets of a pre-tokenized table.
  *
  * Append ingests NEW documents only (ids must be new — the
  * single-writer contract of the store family; re-ingesting an id
  * would double its postings): their postings land in the same
  * bucket layout, and N/total length fold into the manifest. A
  * crash mid-append leaves the store manifest-less, so every reader
  * fails fast (the CM/KMV "detectable, not atomic" protocol);
  * recovery is rebuilding from source. `batchId` arms the standard
  * foreachBatch zombie guard.
  */
object PostingsStore {

  val ManifestFile = "_graft_postings.json"

  /** Store layout version this build writes and reads. v2 added the
    * per-posting `positions` array (phrase/proximity serving); a v1
    * store still loads — BM25 never touches positions — but
    * [[queryPhrase]] refuses it with a rebuild message, and a FUTURE
    * version refuses at load ([[graft.StoreUtil.requireVersion]]).
    */
  val FormatVersion = 2

  case class Loaded(postings: DataFrame, nDocs: Long, totalLen: Long,
      buckets: Int, version: Int)

  private def manifest(buckets: Int, nDocs: Long, totalLen: Long,
      batchId: Option[Long], ingests: Long, compactedAt: Long): String =
    s"""{"version":$FormatVersion,"buckets":$buckets,"n_docs":$nDocs""" +
      s""","total_len":$totalLen,"ingests":$ingests""" +
      s""","compacted_at":$compactedAt""" +
      batchId.map(id => s""","last_batch":$id""").getOrElse("") + "}"

  /** (postings, nDocs, totalLen) of one document batch — the single
    * definition both save and append index with. The tokenized corpus
    * is materialized ONCE (the ClusterOps.flatten checkpoint) so the
    * eager stats aggregate and the postings write do not each pay a
    * full tokenize pass. Evaluating the stats here — BEFORE any caller
    * touches the store's manifest — also means a bad column name or
    * unreadable input fails while the store is still intact.
    *
    * Positions ride ON the posting row (sorted 0-based token indexes):
    * tf is their cardinality, and phrase queries become row-local array
    * intersections after a per-doc join — the standard positional-index
    * trade of ~one int per corpus token for proximity serving.
    */
  private def indexOf(docs: DataFrame, idCol: String,
      textCol: String): (DataFrame, Long, Long) = {
    val base = ClusterOps.flatten(TextOps.bm25Base(docs, idCol, textCol))
    val postings = base
      .select(col("doc_id"), size(col("toks")).cast("long").as("len"),
        posexplode(col("toks")).as(Seq("pos", "term")))
      .groupBy(col("term"), col("doc_id"), col("len"))
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("pos"))).as("positions"))
      .select(col("term"), col("doc_id"), col("tf"), col("len"),
        col("positions"))
    val s = base.agg(coalesce(count(lit(1)), lit(0L)).as("n"),
      coalesce(sum(size(col("toks"))), lit(0L)).as("tot")).head()
    (postings, s.getLong(0), s.getLong(1))
  }

  def save(docs: DataFrame, idCol: String, textCol: String, path: String,
      buckets: Int = 32, batchId: Option[Long] = None): Unit = {
    val spark = docs.sparkSession
    // index FIRST, manifest delete after: the eager stats job validates
    // the inputs, so a typo'd column name or unreadable source fails
    // with any existing store at `path` untouched
    val (postings, n, tot) = indexOf(docs, idCol, textCol)
    // an all-empty write emits no parquet files, which a later load
    // would misreport as a schema-inference failure on a "healthy"
    // store — refuse here; a maintenance loop simply keeps probing
    // storeExists and re-taking the save branch until docs arrive
    require(n > 0, "refusing to index an empty corpus — defer store " +
      "creation until the first non-empty batch")
    // manifest deleted before the write, rewritten last: a crash
    // mid-write leaves a store every reader refuses
    graft.StoreUtil.deleteMarker(spark, path, ManifestFile)
    graft.tree.TreeStore.writeBucketed(spark, postings,
      s"$path/postings", "term", buckets)
    // a fresh save is compact by construction (one file per bucket):
    // the ingest counter starts at 1 with the watermark on it
    graft.StoreUtil.writeMarker(spark, path, ManifestFile,
      manifest(buckets, n, tot, batchId, ingests = 1L, compactedAt = 1L))
  }

  def load(spark: SparkSession, path: String): Loaded = {
    val mf = graft.StoreUtil.requireManifest(spark, path, ManifestFile,
      "postings store", FormatVersion)
    def long(k: String): Long =
      graft.StoreUtil.manifestLong(mf, k, s"postings manifest at $path")
    val buckets = long("buckets").toInt
    val version = graft.StoreUtil.manifestVersion(mf)
    Loaded(graft.tree.TreeStore.loadBucketed(spark, s"$path/postings",
      "term", buckets), long("n_docs"), long("total_len"), buckets,
      version)
  }

  /** Same probe discipline as the sibling stores: postings without a
    * manifest mean a crashed write — refuse, never treat as absent.
    */
  def storeExists(spark: SparkSession, path: String): Boolean =
    graft.StoreUtil.manifestedStoreExists(spark, path, "postings",
      ManifestFile, "postings",
      "a save or append crashed mid-write; rebuild the index from " +
        "source")

  /** Index NEW documents into the store: their postings append into the
    * same bucket layout (new files beside the old, bucket ids in the
    * names — the bucketed-read union TreeStore relies on), N and total
    * length fold into the manifest. Doc ids must be new to the store.
    */
  def append(spark: SparkSession, path: String, docs: DataFrame,
      idCol: String, textCol: String,
      batchId: Option[Long] = None): Unit = {
    if (batchId.isDefined && batchId == SketchOps.lastBatchId(
        spark, path, ManifestFile))
      return
    val mf = graft.StoreUtil.requireManifest(spark, path, ManifestFile,
      "postings store", FormatVersion)
    val st = load(spark, path)
    // appending positional rows into a pre-positions store would mix
    // file schemas under postings/ (the LshStore mergeSchema lesson) —
    // refuse; the v1 store keeps serving BM25 until rebuilt
    require(st.version == FormatVersion,
      s"store at $path is layout v${st.version}; this build appends " +
        s"v$FormatVersion rows — rebuild the index to upgrade")
    val prevLast = SketchOps.lastBatchId(spark, path, ManifestFile)
    // index + validate BEFORE touching the manifest (the save rule)
    val (postings, n, tot) = indexOf(docs, idCol, textCol)
    if (n == 0) return // nothing to index; the store stays as-is
    // ENFORCE the new-ids contract instead of documenting it: a
    // re-ingested doc would double its postings and double-count the
    // stats, silently corrupting every later score — the corruption
    // TreeStore.appendTree's id checks exist to prevent. Cost: one
    // column-pruned doc_id scan of the index per append — far cheaper
    // than the rebuild an undetected duplicate forces
    val dup = postings.select(col("doc_id")).distinct()
      .join(st.postings.select(col("doc_id")).distinct(),
        Seq("doc_id"), "left_semi")
      .head(1)
    require(dup.isEmpty,
      s"append batch re-ingests doc_id ${dup.head.get(0)} already " +
        "in the postings store — append indexes NEW documents only " +
        "(re-indexing a changed doc means rebuilding the index)")
    graft.StoreUtil.deleteMarker(spark, path, ManifestFile)
    graft.tree.TreeStore.appendBucketed(spark, postings,
      s"$path/postings", "term", st.buckets)
    graft.StoreUtil.writeMarker(spark, path, ManifestFile,
      manifest(st.buckets, st.nDocs + n, st.totalLen + tot,
        batchId.orElse(prevLast),
        // lenient pre-counter read (StoreUtil.ingestsOf): a strict
        // parse here would throw AFTER the bucketed append landed,
        // stranding an old store manifest-less
        ingests = graft.StoreUtil.ingestsOf(mf) + 1L,
        compactedAt = graft.StoreUtil.compactedAtOf(mf)))
  }

  /** Whether a maintenance pass is due — each [[append]] stacks another
    * file set into every touched bucket, so after k batches a term
    * probe opens O(k) files per bucket; same family-shared watermark
    * rule as the fold stores ([[graft.StoreUtil.needsCompactFrom]]).
    */
  def needsCompact(spark: SparkSession, path: String,
      slack: Int = 8): Boolean =
    graft.StoreUtil.needsCompactFrom(
      graft.StoreUtil.requireManifest(spark, path, ManifestFile,
        "postings store", FormatVersion),
      slack, s"postings manifest at $path", strict = false)

  /** BM25 top-k from the stored index: the terms filter bucket-prunes
    * the postings scan, df comes from counting the pruned rows, and the
    * scoring tail is [[TextOps.bm25Rank]] verbatim — bit-identical to
    * the in-memory scorer over the same corpus, which is what the
    * shared oracle asserts.
    */
  /** Exact phrase occurrences from the positional index: each phrase
    * slot i fetches its term's (bucket-pruned) postings, shifts the
    * position array left by i, and the doc's occurrence count is the
    * size of the running `array_intersect` — row-local after the
    * per-doc equi-joins, never a token-level self-join (the raw-text
    * form the oracle replays IS that self-join; the index turns it into
    * |phrase| bounded joins of per-term lists). Inner joins ensure a
    * doc missing any term drops immediately. A repeated term reuses the
    * same postings row per slot, so "data data" intersects a list with
    * its own shift — exactly consecutive-occurrence semantics.
    * @return (doc_id, n_occurrences) top-k by (count DESC, doc_id)
    */
  def queryPhrase(st: Loaded, phrase: Seq[String], topK: Int): DataFrame = {
    require(phrase.size >= 2, "a phrase needs at least two terms")
    require(topK > 0, s"topK=$topK must be positive")
    require(st.version >= 2,
      "this postings store predates positional postings (layout v1) — " +
        "rebuild it to serve phrase queries")
    val terms = phrase.map(_.toLowerCase(java.util.Locale.ROOT))
    val hits = st.postings.filter(col("term").isin(terms.distinct: _*))
      .select(col("term"), col("doc_id"), col("positions"))
    var cand = hits.filter(col("term") === terms.head)
      .select(col("doc_id"), col("positions").as("cand"))
    for ((t, i) <- terms.zipWithIndex.tail) {
      cand = cand.join(
        hits.filter(col("term") === t)
          .select(col("doc_id"),
            transform(col("positions"), p => p - i).as("shifted")),
        "doc_id")
        .select(col("doc_id"),
          array_intersect(col("cand"), col("shifted")).as("cand"))
    }
    cand.select(col("doc_id"),
        size(col("cand")).cast("long").as("n_occurrences"))
      .filter(col("n_occurrences") > 0)
      .orderBy(col("n_occurrences").desc, col("doc_id"))
      .limit(topK)
  }

  /** Ordered PROXIMITY (sloppy-phrase) occurrences: term positions
    * p₁ < p₂ < … < pₘ with every gap pᵢ₊₁ − pᵢ ≤ 1 + slop; slop = 0 is
    * exactly [[queryPhrase]] (kept separate — the intersect form is
    * cheaper). Counted by BACKWARD REACHABILITY, one row-local
    * `exists` filter per slot from the last term to the first: a
    * position of term i survives iff some surviving position of term
    * i+1 sits in its gap window, and the count is the surviving first
    * positions. Forward greedy (take the earliest valid next) is NOT
    * complete for gap bounds — at slop 1, next positions {5, 6} and
    * final {8}: greedy from 4 picks 5, whose window (5, 7] misses 8,
    * where 4→6→8 succeeds — which is why the chain runs backward;
    * reachability backward is existence forward, exactly what the
    * oracle's join chain with DISTINCT first-positions counts.
    * @return (doc_id, n_occurrences) top-k by (count DESC, doc_id)
    */
  def queryProximity(st: Loaded, terms: Seq[String], slop: Int,
      topK: Int): DataFrame = {
    require(terms.size >= 2, "proximity needs at least two terms")
    require(slop >= 0, s"slop=$slop must be >= 0")
    require(topK > 0, s"topK=$topK must be positive")
    require(st.version >= 2,
      "this postings store predates positional postings (layout v1) — " +
        "rebuild it to serve proximity queries")
    val ts = terms.map(_.toLowerCase(java.util.Locale.ROOT))
    val hits = st.postings.filter(col("term").isin(ts.distinct: _*))
      .select(col("term"), col("doc_id"), col("positions"))
    var reach = hits.filter(col("term") === ts.last)
      .select(col("doc_id"), col("positions").as("reach"))
    for (t <- ts.init.reverse) {
      reach = reach.join(
        hits.filter(col("term") === t)
          .select(col("doc_id"), col("positions").as("cur")),
        "doc_id")
        .select(col("doc_id"),
          filter(col("cur"), p => exists(col("reach"),
            q => q > p && q <= p + 1 + slop)).as("reach"))
    }
    reach.select(col("doc_id"),
        size(col("reach")).cast("long").as("n_occurrences"))
      .filter(col("n_occurrences") > 0)
      .orderBy(col("n_occurrences").desc, col("doc_id"))
      .limit(topK)
  }

  /** UNORDERED window retrieval: documents where all query terms
    * co-occur within `window` tokens in ANY order, ranked by the
    * tightest such co-occurrence — min span asc (a doc where the terms
    * sit adjacent beats one where they span a paragraph), doc_id ties.
    * The third member of the positional-serving family:
    * [[queryPhrase]] is order+adjacency, [[queryProximity]] is
    * order+gap-bound, this drops order entirely — the standard
    * "terms near each other" operator.
    *
    * Row-local kernel over the same v2 position arrays: the minimal
    * covering window always STARTS at an occurrence of some query term
    * (shrink the left edge to the leftmost contained occurrence), so
    * candidate starts are the union of the terms' positions, and the
    * span from start p is `max over terms of (first occurrence ≥ p)`
    * − p + 1 — null when some term never re-occurs, and `array_min`
    * skips those. |terms| bucket-pruned joins, then pure array math;
    * the oracle replays the definition from raw text as the
    * every-start token join the index exists to avoid.
    *
    * @return (doc_id, span) top-k by (span ASC, doc_id)
    */
  def queryWindow(st: Loaded, terms: Seq[String], window: Int,
      topK: Int): DataFrame = {
    val ts = terms.map(_.toLowerCase(java.util.Locale.ROOT)).distinct
    require(ts.size >= 2, "a window query needs at least two distinct terms")
    require(window >= ts.size,
      s"window=$window cannot cover ${ts.size} distinct terms")
    require(topK > 0, s"topK=$topK must be positive")
    require(st.version >= 2,
      "this postings store predates positional postings (layout v1) — " +
        "rebuild it to serve window queries")
    val hits = st.postings.filter(col("term").isin(ts: _*))
      .select(col("term"), col("doc_id"), col("positions"))
    var cand = hits.filter(col("term") === ts.head)
      .select(col("doc_id"), col("positions").as("p0"))
    for ((t, i) <- ts.zipWithIndex.tail) {
      cand = cand.join(
        hits.filter(col("term") === t)
          .select(col("doc_id"), col("positions").as(s"p$i")), "doc_id")
    }
    val pcols = ts.indices.map(i => col(s"p$i"))
    val starts = array_sort(array_distinct(concat(pcols: _*)))
    def spanAt(p: Column): Column = {
      val firsts = pcols.map(pc => array_min(filter(pc, x => x >= p)))
      when(firsts.map(_.isNull).reduce(_ || _), lit(null).cast("long"))
        .otherwise((greatest(firsts: _*) - p + 1).cast("long"))
    }
    cand.select(col("doc_id"),
        array_min(transform(starts, p => spanAt(p))).as("span"))
      .filter(col("span") <= window)
      .orderBy(col("span").asc, col("doc_id"))
      .limit(topK)
  }

  def queryBm25(st: Loaded, queryTerms: Seq[String], topK: Int): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    require(topK > 0, s"topK=$topK must be positive") // the bm25 twin's guard
    val terms = queryTerms.map(_.toLowerCase(java.util.Locale.ROOT)).distinct
    val hits = st.postings.filter(col("term").isin(terms: _*))
    val dft = hits.groupBy(col("term")).agg(count(lit(1)).as("df"))
    TextOps.bm25Rank(
      hits.join(broadcast(dft), Seq("term"))
        .select(col("doc_id"), col("tf"), col("df"), col("len"),
          lit(st.nDocs).as("n"), lit(st.totalLen).as("tot")),
      topK)
  }

  /** Rewrite an append-grown store to one file per bucket at `dest` —
    * the maintenance pass every store in this family offers (LshStore/
    * TreeStore.compact): each append stacks another file set into every
    * bucket, so after k batches a term probe opens k files per bucket.
    * The manifest carries over (doc counts, bucket count, AND the
    * last_batch zombie guard — a redelivered micro-batch must still
    * no-op against the compacted store) with `compacted_at` advanced to
    * the ingest count so [[needsCompact]] resets. Destination must be
    * disjoint: the source is read lazily while dest is written.
    */
  def compact(spark: SparkSession, path: String, dest: String): Unit = {
    val m = graft.StoreUtil.requireManifest(spark, path, ManifestFile,
      "postings store", FormatVersion)
    graft.StoreUtil.requireDisjoint(spark, path, dest, "compact")
    val st = load(spark, path)
    graft.StoreUtil.deleteMarker(spark, dest, ManifestFile)
    graft.tree.TreeStore.writeBucketed(spark, st.postings,
      s"$dest/postings", "term", st.buckets)
    // manifest carried over with the watermark advanced to the ingest
    // count, so needsCompact resets until another `slack` appends stack
    graft.StoreUtil.writeMarker(spark, dest, ManifestFile,
      graft.StoreUtil.withCompactedAt(m, graft.StoreUtil.ingestsOf(m)))
  }
}

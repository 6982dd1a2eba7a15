package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted BPE tokenizer artifact — the trained merge table plus the
  * token→id vocabulary as a store family, completing train→persist→
  * serve for the tokenizer the way [[LmStore]] closed it for the
  * n-gram model and [[PostingsStore]] for retrieval: a tokenizer that
  * must be retrained (or a vocabulary re-aggregated) per session
  * cannot version a corpus — the ids shipped to a trainer are only
  * meaningful against ONE pinned (merges, vocab) pair, so the pair is
  * the artifact, stamped and refused-on-newer-version like every other
  * store.
  *
  * The artifact is kilobytes (merge rules + vocabulary rows), so the
  * protocol cost is trivial: manifest-last save (a crash leaves a
  * store that refuses to load, never a silently half-written
  * tokenizer), version stamp, crashed-state probe. No append — a
  * tokenizer is trained whole; growing a corpus means retraining and
  * saving a NEW artifact, because inserting merges would reorder
  * ranks and silently re-tokenize history.
  *
  * Layout at `path`:
  *   - `merges/` (rank, l, r)     the rank-ordered merge table
  *   - `vocab/`  (id, token, c)   dense token ids (count DESC, token)
  *   - `_graft_bpestore.json`     manifest (version, n_merges,
  *                                vocab_size)
  *
  * Serving ([[encodeIds]]) is the [[graft.functions.Bpe.tokensCol]]
  * row-local replace chain under the LOADED table plus a broadcast
  * vocab join — zero corpus shuffle, the cost shape that scales with
  * executors; out-of-vocabulary tokens fail in-plan instead of being
  * silently dropped (an id stream with holes would desync every
  * downstream position).
  */
object BpeStore {

  val ManifestFile = "_graft_bpestore.json"
  val FormatVersion = 1

  /** The loaded artifact: the merge table is collected (rank order) —
    * it is the tokenizer's program, bounded by construction, and the
    * encoder needs it as expression literals; the vocab stays a frame
    * for the broadcast join.
    */
  final case class Loaded(merges: Seq[(String, String)], vocab: DataFrame)

  /** Persist a trained (merges, vocab) pair. The vocabulary is
    * validated BEFORE the manifest is touched (the family ordering): a
    * duplicate token would make [[encodeIds]]'s join fan out and
    * silently duplicate positions.
    */
  def save(spark: SparkSession, merges: Seq[(String, String)],
      vocab: DataFrame, path: String): Unit = {
    require(merges.nonEmpty, "refusing to save an empty merge table")
    require(merges.forall { case (l, r) =>
        l.nonEmpty && r.nonEmpty && !l.contains("|") && !r.contains("|") },
      "merge symbols must be non-empty and pipe-free (the fence alphabet)")
    val v = ClusterOps.flatten(vocab.select(col("id").cast("long").as("id"),
      col("token").cast("string").as("token"),
      col("c").cast("long").as("c")))
    val n = v.count()
    require(n > 0, "refusing to save an empty vocabulary")
    require(v.select(col("token")).distinct().count() == n,
      "vocabulary tokens must be unique — a duplicate would fan out " +
        "the encode join and duplicate positions")
    // save counter — the ModelStore rationale: a retrain in place must
    // advance it so a ledger-driven replay can refuse the wrong tokenizer
    val saves = graft.StoreUtil.readMarker(spark, path, ManifestFile)
      .map(graft.StoreUtil.ingestsOf).getOrElse(0L) + 1L
    graft.StoreUtil.deleteMarker(spark, path, ManifestFile)
    val spark2 = v.sparkSession
    import spark2.implicits._
    merges.zipWithIndex
      .map { case ((l, r), i) => (i.toLong, l, r) }
      .toDF("rank", "l", "r")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/merges")
    v.coalesce(1).write.mode("overwrite").parquet(s"$path/vocab")
    graft.StoreUtil.writeMarker(spark, path, ManifestFile,
      s"""{"version":$FormatVersion,"n_merges":${merges.size},""" +
        s""""vocab_size":$n,"ingests":$saves}""")
  }

  /** Healthy-store probe with the family's broken-vs-absent rule. */
  def exists(spark: SparkSession, path: String): Boolean =
    graft.StoreUtil.manifestedStoreExists(spark, path, "merges",
      ManifestFile, "a merge table",
      "a save crashed mid-write; re-save the trained artifact")

  /** Load and VALIDATE the artifact: the collected merge count must
    * match the manifest's — a truncated merge table would not fail
    * any join, it would silently tokenize differently.
    */
  def load(spark: SparkSession, path: String): Loaded = {
    val mf = graft.StoreUtil.requireManifest(spark, path, ManifestFile,
      "BPE tokenizer store", FormatVersion)
    val nMerges = graft.StoreUtil.manifestLong(mf, "n_merges",
      s"BPE store at $path")
    val rows = spark.read.parquet(s"$path/merges")
      .orderBy(col("rank")).collect()
      .map(r => (r.getAs[String]("l"), r.getAs[String]("r"))).toSeq
    require(rows.size.toLong == nMerges,
      s"BPE store at $path holds ${rows.size} merges but the manifest " +
        s"records $nMerges — the merge table is damaged; re-save")
    // the vocab is validated against the manifest too: a DUPLICATED
    // part file (the damage class save's uniqueness check can't see)
    // would fan out encodeIds' join and silently duplicate positions —
    // where a TRUNCATED vocab at least trips the OOV guard
    val vocab = spark.read.parquet(s"$path/vocab")
    val nVocab = vocab.count()
    require(nVocab == graft.StoreUtil.manifestLong(mf, "vocab_size",
        s"BPE store at $path"),
      s"BPE store at $path holds $nVocab vocab rows but the manifest " +
        "records a different size — the vocab table is damaged; re-save")
    Loaded(rows, vocab)
  }

  /** Encode documents to (idCol, pos, tok_id) through the stored
    * tokenizer: the row-local merge chain under the loaded table, then
    * a broadcast token→id join. Out-of-vocabulary tokens RAISE in-plan
    * — through a FILTER, not a projection (the dd_method_agree
    * lesson: a guard living only in a projected column dies to column
    * pruning the moment a caller counts rows without reading tok_id,
    * which is exactly when a silent id desync would go unnoticed).
    * The filter is free while the invariant holds: the store was
    * built with a total vocabulary, so an OOV token means the corpus
    * outgrew the artifact ([[driftStats]]' −1 row is this failure as
    * a statistic, read to retrain BEFORE jobs start dying here).
    */
  def encodeIds(st: Loaded, docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol),
        posexplode(graft.functions.Bpe.tokensCol(col(textCol), st.merges)))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        col("col").as("token"))
      .join(broadcast(st.vocab.select(col("token"), col("id"))),
        Seq("token"), "left")
      .filter(when(col("id").isNull,
        raise_error(concat(
          lit("token not in the stored BPE vocabulary: '"),
          col("token"),
          lit("' — the corpus outgrew the artifact; retrain and " +
            "save a new store"))).cast("boolean"))
        .otherwise(lit(true)))
      .select(col(idCol), col("pos"), col("id").as("tok_id"))

  /** Tokenizer drift meter — [[encodeIds]]' OOV guard as a STATISTIC
    * instead of a failure: tokenize a batch under the stored merge
    * table and fold per served token id — `n` = occurrences, `err_sum`
    * = total characters those occurrences cover — with id −1 (never a
    * real id; ids are dense from 0) collecting the out-of-vocabulary
    * mass the guard would have raised on. The two retrain signals a
    * tokenizer deployment actually watches fall out exactly: the −1
    * row's share of Σn is the OOV rate (a vocabulary the corpus
    * outgrew), and Σerr_sum/Σn is characters-per-token (a stale MERGE
    * table fragments new text into more, shorter tokens, so the mean
    * falls against the trained-time baseline). Both are exact int64
    * and additive by `tok_id` — the [[VectorOps.driftStats]] shape, so
    * a maintenance loop folds one statistic per batch through
    * [[DriftStore]] and never rescans history; the key space is
    * ≤ vocab_size + 1 rows regardless of corpus size. Same row-local
    * merge chain and broadcast vocab join as serving — the batch is
    * never shuffled, only the bounded (tok_id) aggregate is.
    */
  def driftStats(st: Loaded, docs: DataFrame, textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(explode(
        graft.functions.Bpe.tokensCol(col(textCol), st.merges)).as("token"))
      .join(broadcast(st.vocab.select(col("token"), col("id"))),
        Seq("token"), "left")
      .groupBy(coalesce(col("id"), lit(-1L)).as("tok_id"))
      .agg(count(lit(1)).as("n"), sum(length(col("token"))).as("err_sum"))
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted drift statistics — the retraining-cadence meters
  * ([[VectorOps.driftStats]], [[VectorOps.pqDriftStats]]) accumulated
  * across appends, so the "fold per append, never rescan history"
  * contract is a STORE, not a convention each maintenance loop
  * re-implements. The [[SampleOps.saveMixStats]] shape with two value
  * columns: rows are bounded by the artifact's key space (#cells, or
  * m·codes — bytes regardless of corpus size), `n` and `err_sum` are
  * exact int64 and sum additively by every other column (the key), so
  * a fold is a unionByName + one bounded aggregate under the same
  * manifest crash protocol, single-writer assumption, and batchId
  * idempotence guard as every counting store here. The reader derives
  * mean error per key as err_sum / n exactly; a rising mean against
  * the trained-time baseline is the retrain trigger
  * ([[VectorStore.retrain]] / [[VectorStore.retrainPq]] are the
  * actions).
  */
object DriftStore {

  val ManifestFile = "_graft_driftstore.json"

  /** Create (or reset) the store from one batch's statistics — the
    * shared counting-fold machinery ([[graft.StoreUtil.foldStoreSave]])
    * under this family's manifest. A re-save over an existing store
    * advances the ingest counter like a fold would — the
    * ModelStore.save rule, so a provenance row can refuse either kind
    * of history drift on replay.
    */
  def save(stats: DataFrame, path: String,
      batchId: Option[Long] = None): Unit = {
    requireShape(stats)
    graft.StoreUtil.foldStoreSave(stats, path, "stats", ManifestFile,
      batchId)
  }

  private def requireShape(stats: DataFrame): Unit =
    require(stats.columns.contains("n") && stats.columns.contains("err_sum"),
      s"drift stats must carry (n, err_sum); got " +
        stats.columns.mkString(","))

  def load(spark: SparkSession, path: String): DataFrame = {
    graft.StoreUtil.requireManifest(spark, path, ManifestFile,
      "drift store")
    spark.read.parquet(s"$path/stats")
  }

  /** Same probe discipline as the sketch/mix-stats families: stats
    * without a manifest is a crashed save and must REFUSE — reading it
    * as absent would silently reset the accumulated history a retrain
    * decision is about to be made on.
    */
  def exists(spark: SparkSession, path: String): Boolean =
    graft.StoreUtil.manifestedStoreExists(spark, path, "stats",
      ManifestFile, "stats",
      "a previous save crashed mid-write; re-fold from the artifact's " +
        "batches or restore a copy")

  /** Fold one batch's statistics in: (n, err_sum) sum by every other
    * column — ONE definition of the key, so the store serves both
    * meters (cell-keyed and (j, code)-keyed) without declaring either.
    * Re-delivered batchIds are full no-ops: double-folding would
    * genuinely corrupt the statistic (counts, unlike sketch states,
    * are not idempotent under merge). The guard, the schema gate, and
    * the merge are [[graft.StoreUtil.foldStoreAppend]] — shared with
    * the mix-stats family, so a protocol strengthening lands on every
    * counting fold at once.
    */
  def append(spark: SparkSession, path: String, batchStats: DataFrame,
      batchId: Option[Long] = None): Unit =
    graft.StoreUtil.foldStoreAppend(spark, path, "stats", ManifestFile,
      batchStats, batchId, Seq("n", "err_sum"), "drift store")
}

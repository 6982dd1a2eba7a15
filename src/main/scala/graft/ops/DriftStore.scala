package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  private def manifest(ingests: Long, batchId: Option[Long]): String =
    s"""{"version":1,"ingests":$ingests""" +
      batchId.map(id => s""","last_batch":$id""").getOrElse("") + "}"

  /** Create (or reset) the store from one batch's statistics. A re-save
    * over an existing store advances the ingest counter like a fold
    * would — the ModelStore.save rule, so a provenance row can refuse
    * either kind of history drift on replay.
    */
  def save(stats: DataFrame, path: String,
      batchId: Option[Long] = None): Unit =
    saveAt(stats, path, batchId,
      graft.StoreUtil.readMarker(stats.sparkSession, path, ManifestFile)
        .map(graft.StoreUtil.ingestsOf).getOrElse(0L) + 1L)

  private def saveAt(stats: DataFrame, path: String,
      batchId: Option[Long], ingests: Long): Unit = {
    require(stats.columns.contains("n") && stats.columns.contains("err_sum"),
      s"drift stats must carry (n, err_sum); got " +
        stats.columns.mkString(","))
    graft.StoreUtil.saveManifested(stats, path, "stats", ManifestFile,
      manifest(ingests, batchId))
  }

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
    * are not idempotent under merge).
    */
  def append(spark: SparkSession, path: String, batchStats: DataFrame,
      batchId: Option[Long] = None): Unit = {
    val mf = graft.StoreUtil.readMarker(spark, path, ManifestFile)
      .getOrElse(throw new IllegalStateException(
        s"$path is not a drift store (no $ManifestFile)"))
    graft.StoreUtil.requireVersion(mf, 1, s"drift store at $path")
    val last = graft.StoreUtil.lastBatchOf(mf)
    if (batchId.isDefined && batchId == last) return
    val stored = spark.read.parquet(s"$path/stats")
    require(batchStats.columns.sorted.toSeq == stored.columns.sorted.toSeq,
      s"batch stats (${batchStats.columns.mkString(",")}) do not match " +
        s"the stored schema (${stored.columns.mkString(",")})")
    val keys = stored.columns.filterNot(c => c == "n" || c == "err_sum")
      .toSeq
    val merged = stored.unionByName(batchStats)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("err_sum")).as("err_sum"))
    // saveManifested's swap protocol consumes the lazy merge into the
    // swap dir while the live files are intact; a no-batchId fold must
    // not erase the recorded last_batch (the family's orElse rule)
    saveAt(merged, path, batchId.orElse(last),
      graft.StoreUtil.ingestsOf(mf) + 1L)
  }
}

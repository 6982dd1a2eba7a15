package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Append-only delivery provenance log — the audit trail a pipeline
  * keeps BESIDE its packed deliveries: one row set per delivery (the
  * [[graft.queries.TrainingQueries.pipeProvenanceFrame]] shape plus a
  * `delivery_id`), so an auditor can answer "which generation of which
  * store produced batch N" for the whole history of the pipeline, not
  * just the latest run. The reference stamps each synthesized tree the
  * same way and KEEPS the stamps (`IngestSynthesisData.java:304-349`);
  * this is that ledger for training-data deliveries.
  *
  * Protocol: the small-store crash rule ([[graft.StoreUtil
  * .saveManifested]] — manifest deleted first, data rewritten, manifest
  * last), with the manifest carrying `ingests` and `last_batch` so a
  * redelivered foreachBatch id is a FULL no-op (appending the same
  * delivery twice would duplicate ledger rows — unlike a content store,
  * a log has no idempotent fold to hide behind). The log is METADATA —
  * a handful of rows per delivery — so read-union-rewrite stays cheap
  * at any realistic delivery count; a deployment retiring ledgers by
  * age does it by date partition outside this object.
  */
object ProvenanceLog {

  val ManifestFile = "_graft_provlog.json"

  private def manifest(ingests: Long, batchId: Option[Long]): String =
    s"""{"version":1,"ingests":$ingests""" +
      batchId.map(id => s""","last_batch":$id""").getOrElse("") + "}"

  /** Whether a healthy log exists at `path` (the family's
    * broken-vs-absent rule: rows without a manifest are a crashed save
    * and REFUSE rather than silently reset the ledger).
    */
  def exists(spark: SparkSession, path: String): Boolean =
    graft.StoreUtil.manifestedStoreExists(spark, path, "rows",
      ManifestFile, "rows",
      "a previous append crashed mid-write; restore a copy (a ledger " +
        "cannot be recounted from its stores' CURRENT state)")

  /** Append one delivery's provenance rows. Re-delivered batchIds are
    * full no-ops (the manifest's `last_batch` guard); the first append
    * creates the log. The rows must carry a `delivery_id` column — the
    * ledger key an auditor scans by.
    */
  def append(spark: SparkSession, path: String, rows: DataFrame,
      batchId: Option[Long] = None): Unit = {
    require(rows.columns.contains("delivery_id"),
      "provenance rows must carry a delivery_id column")
    // ONE manifest read serves the broken-vs-absent probe, the zombie
    // guard, and the ingest counter — exists()/lastBatchId()/load()
    // would each re-read the same kilobyte marker (three object-store
    // round-trips per delivery for nothing)
    val mfOpt = graft.StoreUtil.readMarker(spark, path, ManifestFile)
    if (mfOpt.isEmpty && graft.StoreUtil.pathExists(spark, path, "rows"))
      throw new IllegalStateException(
        s"$path holds rows but no $ManifestFile — a previous append " +
          "crashed mid-write; restore a copy (a ledger cannot be " +
          "recounted from its stores' CURRENT state)")
    val present = mfOpt.isDefined
    // sign-tolerant last_batch parse — SketchOps.lastBatchId's rule
    val last = mfOpt.flatMap(
      "\"last_batch\"\\s*:\\s*(-?\\d+)".r.findFirstMatchIn(_))
      .map(_.group(1).toLong)
    if (present && batchId.isDefined && batchId == last) return
    val ingests: Long = mfOpt.map(m => {
      graft.StoreUtil.requireVersion(m, 1, s"provenance log at $path")
      graft.StoreUtil.manifestLong(m, "ingests",
        s"provenance log at $path")
    }).getOrElse(0L)
    val merged =
      if (present) spark.read.parquet(s"$path/rows").unionByName(rows)
      else rows
    // materialize off the source files before overwriting them (the
    // union lazily reads the very parquet the write replaces)
    graft.StoreUtil.saveManifested(ClusterOps.flatten(merged), path,
      "rows", ManifestFile, manifest(ingests + 1L, batchId))
  }

  def load(spark: SparkSession, path: String): DataFrame = {
    graft.StoreUtil.requireManifest(spark, path, ManifestFile,
      "provenance log")
    spark.read.parquet(s"$path/rows")
  }
}

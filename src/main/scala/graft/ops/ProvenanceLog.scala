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
      ManifestFile, "rows", "restore a copy (a ledger cannot be " +
        "recounted from its stores' CURRENT state)")

  /** Append one delivery's provenance rows. Re-delivered batchIds are
    * full no-ops (the manifest's `last_batch` guard); the first append
    * creates the log. The rows must carry a `delivery_id` column — the
    * ledger key an auditor scans by.
    */
  def append(spark: SparkSession, path: String, rows: DataFrame,
      batchId: Option[Long] = None): Unit = {
    require(rows.columns.contains("delivery_id"),
      "provenance rows must carry a delivery_id column")
    val present = exists(spark, path)
    if (present && batchId.isDefined &&
        batchId == SketchOps.lastBatchId(spark, path, ManifestFile))
      return
    val ingests: Long =
      if (present)
        graft.StoreUtil.manifestLong(
          graft.StoreUtil.requireManifest(spark, path, ManifestFile,
            "provenance log"),
          "ingests", s"provenance log at $path")
      else 0L
    val merged =
      if (present) load(spark, path).unionByName(rows) else rows
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

package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Persisted linear-model artifact — the trained quality filter's
  * weights as a store family, completing train→persist→serve for the
  * last trained artifact that lacked it (the LM counts, postings, IVF
  * cells, and BPE tokenizer all persist; the [[LinearModel]] weights
  * were re-trained per session). A quality filter's whole value is
  * that the SAME weights gate every corpus batch ever filtered — a
  * model that can't be pinned can't version a corpus.
  *
  * The artifact is rows-of-longs tiny, so the protocol cost is
  * trivial: manifest-last save, version stamp, crashed-state probe,
  * load-time count check. Weights are stored WITH their feature
  * column names in training order — scoring mis-alignment (weight i
  * applied to feature j) is a silent wrong-answer generator, so the
  * loaded artifact carries the binding and [[Loaded.scoreFp]] builds
  * the scoring column from it directly.
  *
  * Layout at `path`:
  *   - `weights/` (i, feat, w)   fixed-point (2¹⁶) weights, rank order
  *   - `_graft_modelstore.json`  manifest (version, n_weights)
  */
object ModelStore {

  val ManifestFile = "_graft_modelstore.json"
  val FormatVersion = 1

  /** The loaded model: feature names and weights in training order. */
  final case class Loaded(featCols: Seq[String], weights: Seq[Long]) {
    /** Row-local fixed-point keep-probability under the STORED
      * feature binding — [[LinearModel.scoreFp]] with the alignment
      * baked in.
      */
    def scoreFp: org.apache.spark.sql.Column =
      LinearModel.scoreFp(featCols, weights)
  }

  def save(spark: SparkSession, featWeights: Seq[(String, Long)],
      path: String): Unit = {
    require(featWeights.nonEmpty, "refusing to save an empty model")
    require(featWeights.map(_._1).distinct.size == featWeights.size,
      "feature names must be unique — a duplicate would mis-align " +
        "scoring")
    // the save COUNTER: a re-save over an existing store (a retrain in
    // place) advances it, which is what lets a delivery's provenance
    // row later prove the model a replay scores with is the model the
    // delivery scored with — without it, retrain-then-replay would be
    // silently wrong (pre-counter manifests read as 1, the lenient rule)
    val saves = graft.StoreUtil.readMarker(spark, path, ManifestFile)
      .map(graft.StoreUtil.ingestsOf).getOrElse(0L) + 1L
    graft.StoreUtil.deleteMarker(spark, path, ManifestFile)
    import spark.implicits._
    featWeights.zipWithIndex
      .map { case ((f, w), i) => (i.toLong, f, w) }
      .toDF("i", "feat", "w")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/weights")
    graft.StoreUtil.writeMarker(spark, path, ManifestFile,
      s"""{"version":$FormatVersion,"n_weights":${featWeights.size},""" +
        s""""ingests":$saves}""")
  }

  /** Healthy-store probe with the family's broken-vs-absent rule. */
  def exists(spark: SparkSession, path: String): Boolean =
    graft.StoreUtil.manifestedStoreExists(spark, path, "weights",
      ManifestFile, "weights",
      "a save crashed mid-write; re-save the trained model")

  /** Load and VALIDATE: the collected weight count must match the
    * manifest's — a truncated weight table would not fail a join, it
    * would score with a silently shorter model.
    */
  def load(spark: SparkSession, path: String): Loaded = {
    val mf = graft.StoreUtil.requireManifest(spark, path, ManifestFile,
      "model store", FormatVersion)
    val want = graft.StoreUtil.manifestLong(mf, "n_weights",
      s"model store at $path")
    val rows = spark.read.parquet(s"$path/weights")
      .orderBy(col("i")).collect()
      .map(r => (r.getAs[String]("feat"), r.getAs[Long]("w"))).toSeq
    require(rows.size.toLong == want,
      s"model store at $path holds ${rows.size} weights but the " +
        s"manifest records $want — the weight table is damaged; re-save")
    Loaded(rows.map(_._1), rows.map(_._2))
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted per partition.
  *
  * The Spark-side shape is real — binary column, typed row batches through
  * `mapPartitions`, deterministic output schema; the actual media decode is
  * STUBBED (`decodeStub`): this container ships no image/audio codecs, so
  * the stub derives deterministic pseudo-metadata from the bytes. Swapping
  * in a real decoder changes only that one function.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media: Array[Byte], kind: String)
  final case class MediaMeta(doc_id: Long, kind: String, byte_len: Long,
      width: Long, height: Long, n_frames: Long)

  /** Attach an opaque binary media column (here: utf-8 of text, standing in
    * for image/audio bytes) plus a kind tag.
    */
  def withMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "utf-8").as("media"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"))

  /** STUB decode: replace with a real codec (e.g. javax.imageio / ffmpeg
    * bindings) in production. Deterministic arithmetic over byte length so
    * results are oracle-checkable.
    */
  def decodeStub(r: MediaRow): MediaMeta = {
    val len = r.media.length.toLong
    MediaMeta(r.doc_id, r.kind, len,
      width = 16L * (len % 64L + 1L),
      height = 9L * (len % 64L + 1L),
      n_frames = if (r.kind == "image") 1L else len % 1000L)
  }

  /** Partition-wise decode/feature-extract: the batch shape a real decoder
    * needs (amortize codec init per partition, stream rows through it).
    */
  def extractMeta(spark: SparkSession, docsWithMedia: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    docsWithMedia.select(col("doc_id"), col("media"), col("kind")).as[MediaRow]
      .mapPartitions { rows =>
        // per-partition init of a (stub) codec would go here
        rows.map(decodeStub)
      }
  }
}

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

  /** Every-k-th frame sample from each media row: one output row per kept
    * frame, frame count from the (stub) decode, signature a deterministic
    * md5 standing in for the frame's perceptual hash. The explode is the
    * real plumbing: a video becomes rows, so downstream per-frame work
    * (embedding, OCR, dedup) distributes instead of hiding inside one
    * giant cell.
    */
  def sampleFrames(docsWithMedia: DataFrame, everyK: Int): DataFrame =
    docsWithMedia
      .withColumn("n_frames",
        when(col("kind") === "image", lit(1L))
          .otherwise(octet_length(col("media")).cast("long") % 1000L))
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("kind"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(everyK.toLong)))
          .as("frame_idx"))
      .withColumn("frame_sig",
        md5(concat_ws(":", col("doc_id"), col("frame_idx"))))

  /** Fixed-size chunking of the media payload — the transport shape for
    * blobs that must not live in one row (row-size ceilings in shuffles
    * and columnar pages): (doc_id, chunk_idx) becomes the addressable
    * unit, with a per-chunk digest for integrity checks. Chunks reassemble
    * to the payload by ordered concat.
    */
  def chunkMedia(docsWithMedia: DataFrame, chunkChars: Int): DataFrame = {
    val n = chunkChars
    docsWithMedia
      .select(col("doc_id"), decode(col("media"), "utf-8").as("payload"))
      .filter(length(col("payload")) > 0)
      .select(col("doc_id"), col("payload"),
        explode(sequence(lit(0L),
          floor((length(col("payload")) - 1) / lit(n.toDouble)).cast("long")))
          .as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        col("payload").substr((col("chunk_idx") * n + 1).cast("int"), lit(n))
          .as("chunk"))
      .select(col("doc_id"), col("chunk_idx"),
        length(col("chunk")).cast("long").as("chunk_len"),
        md5(col("chunk")).as("chunk_md5"))
  }
}

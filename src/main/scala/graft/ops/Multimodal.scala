package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted per partition.
  *
  * The Spark-side shape is real — binary column, typed row batches through
  * `mapPartitions`, deterministic output schema. The decode path is real:
  * all three kinds decode REAL byte streams header-only — images via the
  * JDK's `javax.imageio.ImageIO` ([[decodeImage]]), audio via
  * `javax.sound.sampled`'s RIFF/AIFF parse ([[decodeWav]]), video via a
  * hand-rolled RIFF/AVI chunk walk ([[decodeAvi]] — the container header
  * needs no codec). Rows whose bytes no decoder accepts fall back to the
  * deterministic arithmetic stub (`decodeStub`) so results stay
  * oracle-checkable. Swapping in an ffmpeg-style frame decoder changes
  * only the per-kind dispatch in [[decodeMedia]].
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
      // pmod, not %: Spark's % follows the dividend's sign, so a negative
      // doc_id would index 0 (runtime error) or -1 (wrong kind)
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3L)) + 1).cast("int")).as("kind"))

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

  /** REAL image decode via the JDK's ImageIO: None when no registered
    * reader accepts the byte stream (not an image / unsupported format),
    * Some(width, height) — the genuine pixel grid — when one does. PNG,
    * JPEG, GIF and BMP readers ship with every JDK, so no external codec
    * dependency is needed for the image leg.
    *
    * Dimensions are read from the HEADER (`ImageReader.getWidth/getHeight`
    * without `read()`): `ImageIO.read` would allocate the full pixel
    * raster first, so a kilobyte payload declaring 40000×40000 (a
    * decompression bomb) would OOM the executor before the size was ever
    * inspectable. Corrupt streams make plugin readers throw unchecked
    * exceptions, not just IOException — any non-fatal failure means "not
    * a decodable image" and falls back to the stub.
    */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int)] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      if (iis == null) None
      else try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            Some((r.getWidth(0), r.getHeight(0)))
          } finally r.dispose()
        }
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic tiny-PNG encoder (ImageIO's PNG writer over a fixed
    * pixel fill) — the fixture-media generator for the real-decode path:
    * tests and the `mm_png_meta` gate encode known dimensions, ship the
    * bytes through the binary column, and assert [[decodeImage]] returns
    * exactly those dimensions from the real byte stream.
    */
  def encodePng(width: Int, height: Int, seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until width; y <- 0 until height)
      img.setRGB(x, y, (x * 3163 + y * 757 + seed * 31) & 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL image resize: decode via ImageIO, nearest-neighbor rescale to
    * (dstW, dstH), re-encode as PNG. Nearest-neighbor by hand (srcX =
    * x·srcW/dstW, integer floor) rather than Graphics2D interpolation:
    * bilinear filtering differs across JDK rendering pipelines in the
    * last bit, and a training pipeline needs the SAME resized bytes on
    * every executor of every cluster — determinism is the contract, as
    * everywhere else in this engine.
    *
    * Bomb-safe ordering: the HEADER dims are checked against
    * `maxSrcPixels` BEFORE `ImageIO.read` allocates the raster, so a
    * kilobyte payload declaring 40000×40000 is refused unread — the full
    * decode here is the one deliberate exception to the header-only
    * discipline (a resize must touch pixels), gated by that cap.
    */
  def resizeImage(bytes: Array[Byte], dstW: Int, dstH: Int,
      maxSrcPixels: Long = 64L * 1024 * 1024): Option[Array[Byte]] = {
    require(dstW >= 1 && dstH >= 1, s"target ${dstW}x$dstH must be >= 1x1")
    decodeImage(bytes) match {
      case Some((w, h)) if w.toLong * h <= maxSrcPixels =>
        try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          if (img == null) None
          else {
            val out = new java.awt.image.BufferedImage(dstW, dstH,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < dstH) {
              var x = 0
              while (x < dstW) {
                out.setRGB(x, y, img.getRGB(x * w / dstW, y * h / dstH))
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            Some(bos.toByteArray)
          }
        } catch { case scala.util.control.NonFatal(_) => None }
      case _ => None
    }
  }

  /** Decode an image and sum its RGB pixel values (alpha masked off) —
    * the verification probe for [[resizeImage]]: over the deterministic
    * fixture fill the sum has a closed form the oracle can state, so a
    * resize that produced anything but the exact nearest-neighbor pixels
    * fails the gate. Returns (width, height, pixelSum).
    */
  def pixelSum(bytes: Array[Byte]): Option[(Int, Int, Long)] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        var s = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            s += (img.getRGB(x, y) & 0xffffff).toLong
            x += 1
          }
          y += 1
        }
        Some((img.getWidth, img.getHeight, s))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Partition-wise image resize over the media column: image-kind rows
    * whose bytes decode are rescaled to (dstW, dstH) and re-encoded;
    * every other row passes through untouched (same pass-through
    * discipline as [[decodeMedia]]'s fall-back — a mixed-media corpus
    * keeps its row set). `resized` flags which rows carry new bytes.
    */
  def resizeImages(docsWithMedia: DataFrame, dstW: Int,
      dstH: Int): DataFrame = {
    val spark = docsWithMedia.sparkSession
    import spark.implicits._
    docsWithMedia.select(col("doc_id"), col("media"), col("kind"))
      .as[MediaRow]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val out = if (r.kind == "image") resizeImage(r.media, dstW, dstH)
            else None
          (r.doc_id, out.getOrElse(r.media), r.kind, out.isDefined)
        }
      }
      .toDF("doc_id", "media", "kind", "resized")
  }

  /** REAL audio header decode via the JDK's `javax.sound.sampled`: None
    * when no installed provider accepts the stream (not audio / unknown
    * container), Some(sampleRate, channels, frameCount) read from the
    * HEADER only — `getAudioFileFormat` parses the RIFF/AIFF/AU header
    * without decoding samples, the same bomb-safe discipline as
    * [[decodeImage]]. WAV/AIFF/AU providers ship with every JDK, so the
    * audio leg, like the image leg, needs no external codec.
    */
  def decodeWav(bytes: Array[Byte]): Option[(Float, Int, Long)] =
    try {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      val frames = aff.getFrameLength.toLong
      if (frames < 0) None
      else Some((aff.getFormat.getSampleRate, aff.getFormat.getChannels,
        frames))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic 16-bit PCM WAV encoder — the audio-fixture twin of
    * [[encodePng]]: tests and the `mm_wav_meta` gate encode known header
    * values, ship real RIFF byte streams through the binary column, and
    * assert [[decodeWav]] reports exactly those values.
    */
  def encodeWav(sampleRate: Int, channels: Int, frames: Int,
      seed: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16,
      channels, true, false)
    val data = new Array[Byte](frames * channels * 2)
    var i = 0
    while (i < data.length) {
      data(i) = ((i * 131 + seed * 17) & 0xff).toByte; i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL video container decode: a header-only RIFF/AVI parse (the video
    * twin of [[decodeWav]]'s RIFF discipline). Walks the chunk tree —
    * `RIFF('AVI ')` → `LIST('hdrl')` → `avih` — and reads dwWidth,
    * dwHeight and dwTotalFrames straight from the 56-byte MainAVIHeader,
    * never touching frame data: a kilobyte header claiming a terabyte
    * `movi` payload costs nothing, the same bomb-safety as the image and
    * audio legs. Every offset is bounds-checked; any malformation (or a
    * non-AVI payload) returns None and the caller falls back to the stub.
    * The AVI container layout is public Microsoft documentation
    * (AVIMAINHEADER / RIFF spec); no codec is needed because frame
    * contents are never decoded.
    */
  def decodeAvi(bytes: Array[Byte]): Option[(Int, Int, Long)] =
    try {
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fourcc(off: Int): String =
        new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (bytes.length < 24 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ")
        None
      else {
        // scan the RIFF body for LIST('hdrl'), then its body for 'avih'
        def findAvih(off: Int, end: Int, depth: Int): Option[Int] = {
          var p = off
          while (p + 8 <= end) {
            val id = fourcc(p)
            val sz = bb.getInt(p + 4).toLong & 0xffffffffL
            val dataStart = p + 8
            if (dataStart + sz > end) return None // truncated chunk
            if (id == "avih" && sz >= 56) return Some(dataStart)
            if (id == "LIST" && sz >= 4 && depth < 4 &&
                fourcc(dataStart) == "hdrl") {
              val hit = findAvih(dataStart + 4, dataStart + sz.toInt, depth + 1)
              if (hit.isDefined) return hit
            }
            p = dataStart + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
          }
          None
        }
        val riffEnd = math.min(bytes.length.toLong,
          12L + (bb.getInt(4).toLong & 0xffffffffL) - 4L).toInt
        findAvih(12, riffEnd, 0).map { a =>
          // MainAVIHeader: +16 dwTotalFrames, +32 dwWidth, +36 dwHeight
          (bb.getInt(a + 32), bb.getInt(a + 36),
            bb.getInt(a + 16).toLong & 0xffffffffL)
        }.filter { case (w, h, _) => w > 0 && h > 0 }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic minimal-AVI encoder — the video-fixture twin of
    * [[encodePng]]/[[encodeWav]]: writes a spec-shaped RIFF tree
    * (`avih` main header, one `vids` stream, empty `movi` list) with the
    * requested dimensions and frame count, so tests and the
    * `mm_video_meta` gate ship REAL container bytes through the binary
    * column and assert [[decodeAvi]] reads back exactly what was declared.
    */
  def encodeAvi(width: Int, height: Int, frames: Int,
      usPerFrame: Int = 33333): Array[Byte] = {
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length + (body.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      bb.putInt(body.length)
      bb.put(body) // odd-length bodies get a zero pad byte (word alignment)
      bb.array()
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes(
        java.nio.charset.StandardCharsets.US_ASCII) ++ body)
    def u32s(vs: Int*): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(vs.length * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      vs.foreach(bb.putInt); bb.array()
    }
    // MainAVIHeader (56 bytes): usPerFrame, maxBytesPerSec, padding,
    // flags, totalFrames, initialFrames, streams, suggestedBufSize,
    // width, height, reserved[4]
    val avih = chunk("avih", u32s(usPerFrame, 0, 0, 0, frames, 0, 1, 0,
      width, height, 0, 0, 0, 0))
    // AVIStreamHeader: fccType 'vids', handler 'MJPG', then rate/scale
    // and length = frame count (the per-stream echo of dwTotalFrames)
    val strh = chunk("strh",
      "vidsMJPG".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
        u32s(0, 0, 0, 1, 1000000 / math.max(usPerFrame, 1), 0, frames, 0,
          -1, 0, 0, 0))
    // BITMAPINFOHEADER for the stream format chunk
    val strf = chunk("strf", u32s(40, width, height, (24 << 16) | 1,
      0x47504A4D /* 'MJPG' */, width * height * 3, 0, 0, 0, 0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi", Array.emptyByteArray)
    val body = "AVI ".getBytes(
      java.nio.charset.StandardCharsets.US_ASCII) ++ hdrl ++ movi
    val bb = java.nio.ByteBuffer.allocate(8 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bb.putInt(body.length)
    bb.put(body)
    bb.array()
  }

  /** HEADER-ONLY JPEG dimension read: a hand-rolled marker-segment walk
    * (SOI, then FF-marker segments with big-endian payload lengths)
    * to the first frame header SOFn (C0–CF minus the non-frame DHT/JPG/
    * DAC markers C4/C8/CC), whose payload carries height then width as
    * big-endian u16 — the JPEG interchange format layout, public ITU
    * T.81 §B.2.2. Pure byte arithmetic over the first kilobytes: no
    * reader plugin, no raster, no temp file — the shape a 100 TB image
    * sweep wants (the AVI walk's sibling; [[decodeImage]] stays the
    * general-format fallback). Returns None on anything that doesn't
    * walk as a JPEG, including truncated-mid-segment payloads.
    */
  def decodeJpegHeader(bytes: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int) = bytes(i) & 0xff
    def u16(i: Int) = (u8(i) << 8) | u8(i + 1)
    if (bytes.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) None
    else {
      var i = 2
      var out: Option[(Int, Int)] = None
      var dead = false
      while (out.isEmpty && !dead && i + 3 < bytes.length) {
        if (u8(i) != 0xff) dead = true // lost marker sync
        else {
          val m = u8(i + 1)
          if (m == 0xff) i += 1 // fill byte
          else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2 // standalone
          else if (m == 0xd9 || m == 0xda) dead = true // EOI / entropy data
          else {
            val len = u16(i + 2)
            val isSof = m >= 0xc0 && m <= 0xcf &&
              m != 0xc4 && m != 0xc8 && m != 0xcc
            if (isSof) {
              // payload: precision u8, height u16, width u16
              if (i + 9 < bytes.length && len >= 7)
                out = Some((u16(i + 7), u16(i + 5)))
              else dead = true
            } else i += 2 + len
          }
        }
      }
      out.filter { case (w, h) => w > 0 && h > 0 }
    }
  }

  /** Deterministic tiny-JPEG encoder (ImageIO's baseline writer) — the
    * fixture twin of [[encodePng]] for the header-walk path.
    */
  def encodeJpeg(width: Int, height: Int, seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until width; y <- 0 until height)
      img.setRGB(x, y, (x * 3163 + y * 757 + seed * 31) & 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Per-row decode dispatch — the ONE source of truth for media metadata
    * ([[extractMeta]] and [[sampleFrames]] both route through it): the
    * JPEG byte walk then real ImageIO for decodable image bytes, real
    * audio-header parse for decodable audio bytes, real AVI-header
    * parse for decodable video bytes, documented stub for undecodable
    * payloads. Audio has no pixel grid, so in the fixed [[MediaMeta]]
    * schema `width` carries the sample rate and `height` the channel
    * count; `n_frames` is the PCM frame count (video: the container's
    * declared frame count).
    */
  def decodeMedia(r: MediaRow): MediaMeta =
    if (r.kind == "image")
      // the byte-walk first (header-only, plugin-free); ImageIO for
      // every other image container
      decodeJpegHeader(r.media).orElse(decodeImage(r.media)) match {
        case Some((w, h)) =>
          MediaMeta(r.doc_id, r.kind, r.media.length.toLong, w.toLong,
            h.toLong, n_frames = 1L)
        case None => decodeStub(r)
      }
    else if (r.kind == "audio")
      decodeWav(r.media) match {
        case Some((sr, ch, fr)) =>
          MediaMeta(r.doc_id, r.kind, r.media.length.toLong,
            width = sr.toLong, height = ch.toLong, n_frames = fr)
        case None => decodeStub(r)
      }
    else if (r.kind == "video")
      decodeAvi(r.media) match {
        case Some((w, h, fr)) =>
          MediaMeta(r.doc_id, r.kind, r.media.length.toLong, w.toLong,
            h.toLong, n_frames = fr)
        case None => decodeStub(r)
      }
    else decodeStub(r)

  /** Partition-wise decode/feature-extract: the batch shape a real decoder
    * needs (amortize codec init per partition, stream rows through it).
    */
  def extractMeta(spark: SparkSession, docsWithMedia: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    docsWithMedia.select(col("doc_id"), col("media"), col("kind")).as[MediaRow]
      .mapPartitions { rows =>
        // per-partition codec init: keep ImageIO's stream wrapping fully
        // in-memory — the default disk-cache would add a temp-file write
        // per decode on the executor
        javax.imageio.ImageIO.setUseCache(false)
        rows.map(decodeMedia)
      }
  }

  /** Every-k-th frame sample from each media row: one output row per kept
    * frame, frame count from the SAME [[decodeMedia]] dispatch as
    * [[extractMeta]] (one source of truth — a codec swap cannot desync
    * the sampler from the metadata path), signature a deterministic md5
    * standing in for the frame's perceptual hash. The explode is the
    * real plumbing: a video becomes rows, so downstream per-frame work
    * (embedding, OCR, dedup) distributes instead of hiding inside one
    * giant cell.
    */
  def sampleFrames(docsWithMedia: DataFrame, everyK: Int): DataFrame = {
    // fail at the call site: everyK = 0 would otherwise surface as a
    // "sequence step must not be zero" task failure deep in execution
    require(everyK >= 1, s"everyK must be >= 1, got $everyK")
    extractMeta(docsWithMedia.sparkSession, docsWithMedia).toDF()
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("kind"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(everyK.toLong)))
          .as("frame_idx"))
      .withColumn("frame_sig",
        md5(concat_ws(":", col("doc_id"), col("frame_idx"))))
  }

  /** Fixed-size chunking of the media payload — the transport shape for
    * blobs that must not live in one row (row-size ceilings in shuffles
    * and columnar pages): (doc_id, chunk_idx) becomes the addressable
    * unit, with a per-chunk digest for integrity checks. Chunks reassemble
    * to the payload by ordered concat.
    */
  def chunkMedia(docsWithMedia: DataFrame, chunkChars: Int): DataFrame = {
    // chunkChars = 0 would turn the chunk count into floor(x/0.0) =
    // Long.MaxValue and abort inside sequence(); negative values produce
    // garbage substr positions — refuse at the call site
    require(chunkChars >= 1, s"chunkChars must be >= 1, got $chunkChars")
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

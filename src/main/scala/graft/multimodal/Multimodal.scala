package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** A decoded raster image: pixels are row-major `height × width × channels`
  * bytes. The schema is the contract every downstream op (resize, features)
  * relies on.
  */
final case class DecodedImage(doc_id: Long, width: Int, height: Int,
    channels: Int, pixels: Array[Byte])

/** One sampled video frame (frame_idx within the source blob). */
final case class SampledFrame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

/** Multimodal column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode / resize /
  * frame-sample / feature-extract as partition-local batch transforms
  * (`mapPartitions` — the JVM analog of `mapInPandas`: one iterator per
  * partition, no shuffle, codec state reused across the batch).
  *
  * The byte→pixel boundary is the [[ImageCodec]] trait. Two implementations
  * ship: [[ImageIoCodec]] — a REAL pure-JVM decoder (javax.imageio, part of
  * the JDK) for JPEG/PNG/GIF/BMP payloads — and [[FakeCodec]], a
  * deterministic hash-expansion stub for the synthetic testdata blobs
  * (which are random bytes, not encoded images). [[SniffCodec]] routes by
  * magic number so a mixed corpus decodes real media and degrades
  * explicably on junk. Container demux is REAL for the two formats the
  * pure JVM can carry end-to-end — animated GIF (ImageIO's multi-frame
  * reader) and AVI/MJPEG (a RIFF chunk walk yielding the per-frame JPEG
  * payloads) — each sampled frame is itself a decodable image blob, so
  * demux composes with [[decodeImages]]. Other containers (MP4/H.264 etc.
  * need a native codec) fall back to the deterministic stub under
  * [[SniffCodec]] and throw under the strict codec.
  *
  * Scale notes: decode is narrow map work (partition-local, no shuffle), so
  * media datasets parallelize by input split exactly like text; blobs never
  * pass through a shuffle unless the caller repartitions; per-row output
  * (pixels) is bounded by the decode target, not the input blob, keeping
  * task memory flat.
  */
object Multimodal {

  /** The codec boundary: same blob → same output, one instance reused per
    * partition batch. Implementations must be serializable (they ride the
    * task closure).
    */
  trait ImageCodec extends Serializable {
    def decodeImage(docId: Long, blob: Array[Byte]): DecodedImage
    def frames(blob: Array[Byte], frameBytes: Int): Iterator[Array[Byte]]
  }

  /** Deterministic stub codec for synthetic (non-media) blobs; the
    * testdata's binary columns are random bytes, so specs and the m-query
    * oracles pin against this.
    */
  object FakeCodec extends ImageCodec {
    /** Cheap xorshift64* expansion of a seed into n pseudo-pixels. */
    private def expand(seed0: Long, n: Int): Array[Byte] = {
      val out = new Array[Byte](n)
      var s = if (seed0 == 0L) 0x9E3779B97F4A7C15L else seed0
      var i = 0
      while (i < n) {
        s ^= s << 13; s ^= s >>> 7; s ^= s << 17
        out(i) = (s & 0xff).toByte
        i += 1
      }
      out
    }

    private def seed(blob: Array[Byte]): Long = {
      var h = 1125899906842597L
      var i = 0
      while (i < blob.length) { h = 31 * h + blob(i); i += 1 }
      h
    }

    /** STUB for image decode (would be libjpeg/libpng): dims from the blob
      * hash, pixels hash-expanded. Deterministic in the blob bytes.
      */
    def decodeImage(docId: Long, blob: Array[Byte]): DecodedImage = {
      val s = seed(blob)
      val width = 16 + ((s >>> 8) % 17).toInt  // 16..32
      val height = 16 + ((s >>> 16) % 17).toInt
      val channels = 1 + ((s >>> 24) % 3).toInt // 1..3
      DecodedImage(docId, width, height, channels,
        expand(s, width * height * channels))
    }

    /** STUB for container demux (would be ffmpeg): fixed-size frame chunks. */
    def frames(blob: Array[Byte], frameBytes: Int): Iterator[Array[Byte]] =
      blob.grouped(frameBytes)
  }

  /** Deterministic stub codec whose decode is RANDOM-ACCESS in the pixel
    * index: seed = first 64 bits of md5(blob); pixel(i) = a two-round
    * small-multiplier mix of (seed + i·K). Unlike [[FakeCodec]]'s xorshift
    * STREAM (pixel i needs i sequential steps), every pixel here is a pure
    * function of (seed, i), so the whole decode is SQL-expressible and
    * vectorizes: both engines share md5, and K < 2³¹ keeps every 32-bit-lane
    * product of the two-lane 64-bit emulation inside a checked BIGINT. This
    * is the codec the `m3` oracle pins — it turns decode→pool→ANN
    * hash-exact across engines. Same [[DecodedImage]] contract and dims
    * derivation as [[FakeCodec]].
    */
  object SqlCodec extends ImageCodec {
    private val K = 1103515245L // < 2^31: the oracle's lane products fit BIGINT

    def decodeImage(docId: Long, blob: Array[Byte]): DecodedImage = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(blob)
      var s = 0L
      var i = 0
      while (i < 8) { s = (s << 8) | (d(i) & 0xffL); i += 1 }
      val width = 16 + ((s >>> 8) % 17).toInt  // 16..32, as FakeCodec
      val height = 16 + ((s >>> 16) % 17).toInt
      val channels = 1 + ((s >>> 24) % 3).toInt // 1..3
      val n = width * height * channels
      val px = new Array[Byte](n)
      var j = 0
      while (j < n) {
        var z = s + j * K
        var r = 0
        while (r < 2) { z ^= z >>> 29; z *= K; r += 1 }
        z ^= z >>> 32
        px(j) = (z & 0xff).toByte
        j += 1
      }
      DecodedImage(docId, width, height, channels, px)
    }

    /** Same fixed-size chunking stub as [[FakeCodec]]. */
    def frames(blob: Array[Byte], frameBytes: Int): Iterator[Array[Byte]] =
      blob.grouped(frameBytes)
  }

  /** REAL image decode on the pure JVM: javax.imageio (JDK built-in, no
    * external dependency) reads JPEG/PNG/GIF/BMP bytes into row-major
    * interleaved pixels matching the [[DecodedImage]] contract. Alpha is
    * preserved when the source has it (channels = 4, RGBA order), else
    * channels = 3 (RGB). Undecodable bytes throw `IllegalArgumentException`
    * — route mixed corpora through [[SniffCodec]] instead. ImageIO is
    * headless-safe; the registry forces headless mode so executors without
    * a display never touch X11.
    */
  object ImageIoCodec extends ImageCodec {
    /** Reject decompression bombs BEFORE decoding: a ~100 KB PNG can
      * declare 50000×50000 px (~10 GB of raster). The declared dimensions
      * are read from the container header via the reader's metadata — no
      * pixel data is touched — and only an in-budget image reaches
      * `reader.read`. 64 Mpx RGBA = 256 MB pixels, already past any sane
      * per-row budget.
      */
    private val MaxPixels = 64L * 1024 * 1024

    def decodeImage(docId: Long, blob: Array[Byte]): DecodedImage = {
      // set per-JVM, lazily from whichever task decodes first on an executor
      if (System.getProperty("java.awt.headless") == null)
        System.setProperty("java.awt.headless", "true")
      // default ImageIO stream cache spills every blob to an executor temp
      // file and reads it back — pure wasted disk I/O for byte-array input
      if (javax.imageio.ImageIO.getUseCache) javax.imageio.ImageIO.setUseCache(false)
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(blob))
      val img =
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext)
            throw new IllegalArgumentException(
              s"doc $docId: no ImageIO reader for blob (${blob.length} bytes)")
          val reader = readers.next()
          try {
            reader.setInput(iis, true, true)
            // getWidth/getHeight(0) parse only the header — the bomb check
            // runs before a single pixel row is allocated or inflated
            val dw = reader.getWidth(0); val dh = reader.getHeight(0)
            if (dw <= 0 || dh <= 0 || dw.toLong * dh > MaxPixels)
              throw new IllegalArgumentException(
                s"doc $docId: declared ${dw}x$dh exceeds the $MaxPixels-pixel decode budget")
            reader.read(0)
          } finally reader.dispose()
        } finally iis.close()
      if (img == null)
        throw new IllegalArgumentException(
          s"doc $docId: ImageIO reader returned no image (${blob.length} bytes)")
      val w = img.getWidth; val h = img.getHeight
      val hasAlpha = img.getColorModel.hasAlpha
      val channels = if (hasAlpha) 4 else 3
      val out = new Array[Byte](w * h * channels)
      // getRGB converts any source color model to packed ARGB sRGB — one
      // per-row batch call keeps the hot loop allocation-free per pixel
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val argb = row(x)
          val base = (y * w + x) * channels
          out(base) = ((argb >>> 16) & 0xff).toByte     // R
          out(base + 1) = ((argb >>> 8) & 0xff).toByte  // G
          out(base + 2) = (argb & 0xff).toByte          // B
          if (hasAlpha) out(base + 3) = ((argb >>> 24) & 0xff).toByte
          x += 1
        }
        y += 1
      }
      DecodedImage(docId, w, h, channels, out)
    }

    /** Frame-count budget for container demux: a malformed index must not
      * expand one blob into millions of rows (the temporal analog of the
      * pixel bomb — each frame also passes the MaxPixels check on decode).
      */
    private val MaxFrames = 4096

    /** Cumulative OUTPUT budget per blob: per-frame pixel and frame-count
      * caps alone still admit their product — a small, valid LZW GIF
      * declaring thousands of large frames would expand to multi-GB of
      * re-encoded frames held simultaneously in one task. Total emitted
      * frame bytes over one blob may not exceed this; past it the demux
      * throws (under SniffCodec that degrades to the stub, the same
      * degrade-don't-die contract as a corrupt body).
      */
    private val MaxTotalFrameBytes = 256L * 1024 * 1024

    /** REAL container demux for the two formats a pure JVM carries:
      *
      *  - animated GIF: ImageIO's GIF reader exposes every stored frame
      *    (`getNumImages(true)` / `read(i)`); each frame raster is
      *    re-encoded as PNG so the emitted blob is itself a decodable
      *    image. Frames are the STORED rectangles (GIF inter-frame
      *    patches), not composited playback state — the right unit for
      *    sampling/feature work, and the honest one.
      *  - AVI / motion-JPEG: a RIFF chunk walk (the container is just
      *    nested fourcc-tagged chunks) collects the `##dc`/`##db` video
      *    chunks; for MJPEG each chunk IS a complete JPEG, emitted as-is.
      *
      * Anything else (MP4/H.264 and friends need a native codec) throws —
      * route mixed corpora through [[SniffCodec]], which degrades to the
      * stub. Both paths are bounded: at most [[MaxFrames]] frames per blob,
      * GIF frames pass the same per-image pixel budget as decode AND a
      * cumulative [[MaxTotalFrameBytes]] output budget (the per-frame caps
      * alone admit their product); AVI chunks are disjoint blob ranges, so
      * their total is bounded by the blob itself.
      * `frameBytes` is the stub codec's chunk width and is ignored here —
      * real containers carry their own frame boundaries.
      */
    def frames(blob: Array[Byte], frameBytes: Int): Iterator[Array[Byte]] =
      if (SniffCodec.isGif(blob)) gifFrames(blob)
      else if (SniffCodec.isAvi(blob)) aviFrames(blob)
      else throw new IllegalArgumentException(
        s"no pure-JVM demuxer for blob (${blob.length} bytes); " +
          "supported containers: GIF, AVI/MJPEG")

    private def gifFrames(blob: Array[Byte]): Iterator[Array[Byte]] = {
      if (System.getProperty("java.awt.headless") == null)
        System.setProperty("java.awt.headless", "true")
      if (javax.imageio.ImageIO.getUseCache) javax.imageio.ImageIO.setUseCache(false)
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(blob))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext)
          throw new IllegalArgumentException("no ImageIO reader for GIF blob")
        val reader = readers.next()
        try {
          reader.setInput(iis, false, true)
          // allowSearch=true: the frame count needs one pass over the chunk
          // headers, no pixel decode
          val n = math.min(reader.getNumImages(true), MaxFrames)
          val out = new Array[Array[Byte]](n)
          var total = 0L
          var i = 0
          while (i < n) {
            val dw = reader.getWidth(i); val dh = reader.getHeight(i)
            if (dw <= 0 || dh <= 0 || dw.toLong * dh > MaxPixels)
              throw new IllegalArgumentException(
                s"GIF frame $i declares ${dw}x$dh, over the $MaxPixels-pixel budget")
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(reader.read(i), "png", bos)
            out(i) = bos.toByteArray
            total += out(i).length
            if (total > MaxTotalFrameBytes)
              throw new IllegalArgumentException(
                s"GIF demux emitted $total bytes over ${i + 1} frames, " +
                  s"past the $MaxTotalFrameBytes-byte per-blob budget")
            i += 1
          }
          out.iterator
        } finally reader.dispose()
      } finally iis.close()
    }

    /** RIFF is length-prefixed fourcc chunks; `LIST` chunks nest. Video
      * frames live in `##dc` (compressed) / `##db` (uncompressed) chunks,
      * conventionally under the `movi` list, but the walk accepts them
      * anywhere — real-world AVIs are sloppy. A size that runs past the
      * enclosing chunk stops the walk (truncated/hostile file) rather than
      * reading out of bounds.
      */
    private def aviFrames(blob: Array[Byte]): Iterator[Array[Byte]] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      def u32(off: Int): Long =
        (blob(off) & 0xffL) | (blob(off + 1) & 0xffL) << 8 |
          (blob(off + 2) & 0xffL) << 16 | (blob(off + 3) & 0xffL) << 24
      def isVideoChunk(off: Int): Boolean = {
        def digit(b: Byte) = b >= '0' && b <= '9'
        digit(blob(off)) && digit(blob(off + 1)) &&
          (blob(off + 2) == 'd' && (blob(off + 3) == 'c' || blob(off + 3) == 'b'))
      }
      def walk(start: Int, end: Int): Unit = {
        var p = start
        while (p + 8 <= end && out.length < MaxFrames) {
          val size = u32(p + 4)
          val body = p + 8
          if (size < 0 || size > Int.MaxValue || body + size > end) return
          val sz = size.toInt
          val isList = blob(p) == 'L' && blob(p + 1) == 'I' &&
            blob(p + 2) == 'S' && blob(p + 3) == 'T'
          if (isList && sz >= 4) walk(body + 4, body + sz)
          else if (isVideoChunk(p) && sz > 0)
            out += java.util.Arrays.copyOfRange(blob, body, body + sz)
          p = body + sz + (sz & 1) // chunks are 16-bit aligned
        }
      }
      if (blob.length < 12)
        throw new IllegalArgumentException(s"AVI blob too short (${blob.length} bytes)")
      walk(12, blob.length) // skip RIFF header: 'RIFF' + size + 'AVI '
      out.iterator
    }
  }

  /** Magic-number router: real media decodes for real (ImageIO), anything
    * else falls back to the deterministic stub — the shape a mixed/dirty
    * 100 TB corpus needs, where a junk blob must not kill the task.
    */
  object SniffCodec extends ImageCodec {
    private[multimodal] def isGif(b: Array[Byte]): Boolean =
      b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8'

    private[multimodal] def isAvi(b: Array[Byte]): Boolean =
      b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '

    private def isImage(b: Array[Byte]): Boolean =
      (b.length >= 3 &&
        (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff) || // JPEG
      (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') || // PNG
      isGif(b) || // GIF
      (b.length >= 2 && b(0) == 'B' && b(1) == 'M') // BMP

    def decodeImage(docId: Long, blob: Array[Byte]): DecodedImage =
      if (isImage(blob)) {
        // magic bytes can lie: a truncated/corrupt body behind a valid
        // header must degrade to the stub, not kill the task (Spark would
        // retry the same deterministic blob 4× and fail the job)
        try ImageIoCodec.decodeImage(docId, blob)
        catch { case scala.util.control.NonFatal(_) => FakeCodec.decodeImage(docId, blob) }
      } else FakeCodec.decodeImage(docId, blob)

    /** Real demux for real containers (GIF animation, AVI/MJPEG), stub
      * chunking for everything else — same degrade-don't-die contract as
      * image decode: a corrupt body behind a valid container magic falls
      * back to the stub instead of fail-looping the task.
      */
    def frames(blob: Array[Byte], frameBytes: Int): Iterator[Array[Byte]] =
      if (isGif(blob) || isAvi(blob)) {
        // a container that throws OR yields zero recoverable frames (e.g.
        // truncated before its first video chunk) counts as junk; the
        // materialization is bounded by MaxFrames either way
        val real =
          try ImageIoCodec.frames(blob, frameBytes).toArray
          catch { case scala.util.control.NonFatal(_) => Array.empty[Array[Byte]] }
        if (real.nonEmpty) real.iterator else FakeCodec.frames(blob, frameBytes)
      } else FakeCodec.frames(blob, frameBytes)
  }

  /** Decode a binary column into typed images — one codec instance per
    * partition batch, no shuffle. Default codec stays [[FakeCodec]] (the
    * synthetic-testdata oracles pin it); pass [[SniffCodec]] for a corpus
    * with real media payloads.
    */
  def decodeImages(df: DataFrame, idCol: String = "doc_id",
      blobCol: String = "blob", codec: ImageCodec = FakeCodec): Dataset[DecodedImage] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec setup would happen here (native handles etc.)
        it.map { case (id, blob) => codec.decodeImage(id, blob) }
      }
  }

  /** Nearest-neighbor resize to (targetW, targetH) — real pixel math over
    * the decoded schema, channel-preserving.
    */
  def resize(images: Dataset[DecodedImage], targetW: Int, targetH: Int): Dataset[DecodedImage] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.mapPartitions(_.map { im =>
      val out = new Array[Byte](targetW * targetH * im.channels)
      var y = 0
      while (y < targetH) {
        val sy = y * im.height / targetH
        var x = 0
        while (x < targetW) {
          val sx = x * im.width / targetW
          var c = 0
          while (c < im.channels) {
            out((y * targetW + x) * im.channels + c) =
              im.pixels((sy * im.width + sx) * im.channels + c)
            c += 1
          }
          x += 1
        }
        y += 1
      }
      DecodedImage(im.doc_id, targetW, targetH, im.channels, out)
    })
  }

  /** Sample every `everyN`-th frame from a video blob column — flatMap
    * (1 row in, k rows out), still partition-local. `frame_idx` is the
    * frame's position in the SOURCE stream, so sampling density is
    * recoverable downstream. Default codec stays [[FakeCodec]] (the
    * synthetic-testdata oracles pin it); pass [[SniffCodec]] for a corpus
    * with real GIF/AVI payloads — each emitted frame is then itself a
    * decodable image blob, feeding straight back into [[decodeImages]].
    */
  def sampleFrames(df: DataFrame, everyN: Int, frameBytes: Int = 256,
      idCol: String = "doc_id", blobCol: String = "blob",
      codec: ImageCodec = FakeCodec): Dataset[SampledFrame] = {
    require(everyN > 0, s"everyN must be positive, got $everyN")
    require(frameBytes > 0, s"frameBytes must be positive, got $frameBytes")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, blob) =>
        codec.frames(blob, frameBytes).zipWithIndex.collect {
          case (f, i) if i % everyN == 0 => SampledFrame(id, i, f)
        }
      }
  }

  /** 4×4 average-pool feature vector per image (channel-averaged) — the
    * feature-extraction stage that would feed the `embeddings` table and the
    * ANN operators. Real pooling math; `array<float>` output matches the
    * embeddings schema.
    */
  def extractFeatures(images: Dataset[DecodedImage]): DataFrame = {
    val spark = images.sparkSession
    import spark.implicits._
    images.map { im =>
      val grid = 4
      val feat = new Array[Float](grid * grid)
      var gy = 0
      while (gy < grid) {
        var gx = 0
        while (gx < grid) {
          val y0 = gy * im.height / grid; val y1 = (gy + 1) * im.height / grid
          val x0 = gx * im.width / grid; val x1 = (gx + 1) * im.width / grid
          var sum = 0L; var cnt = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              var c = 0
              while (c < im.channels) {
                sum += im.pixels((y * im.width + x) * im.channels + c) & 0xff
                cnt += 1; c += 1
              }
              x += 1
            }
            y += 1
          }
          feat(gy * grid + gx) = if (cnt == 0) 0f else sum.toFloat / cnt
          gx += 1
        }
        gy += 1
      }
      (im.doc_id, feat)
    }.toDF("doc_id", "features")
  }

  /** Fixed-point twin of [[extractFeatures]]: the same 4×4 average pool, but
    * each cell lands as an integer ppm value `⌊sum·10⁶ / count⌋` instead of a
    * float mean. Integer features make every downstream dot product and
    * squared norm an EXACT 64-bit sum (order-independent, so engine-
    * reproducible — the sim4 fixed-point discipline applied to pooling);
    * ppm ≤ 255·10⁶ and 16-dim dots stay under 2⁶³. `m3` pools through this
    * so its cosines are bit-stable against the DuckDB oracle.
    */
  def extractFeaturesPpm(images: Dataset[DecodedImage]): DataFrame = {
    val spark = images.sparkSession
    import spark.implicits._
    images.map { im =>
      val grid = 4
      val feat = new Array[Long](grid * grid)
      var gy = 0
      while (gy < grid) {
        var gx = 0
        while (gx < grid) {
          val y0 = gy * im.height / grid; val y1 = (gy + 1) * im.height / grid
          val x0 = gx * im.width / grid; val x1 = (gx + 1) * im.width / grid
          var sum = 0L; var cnt = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              var c = 0
              while (c < im.channels) {
                sum += im.pixels((y * im.width + x) * im.channels + c) & 0xff
                cnt += 1; c += 1
              }
              x += 1
            }
            y += 1
          }
          feat(gy * grid + gx) = if (cnt == 0) 0L else sum * 1000000L / cnt
          gx += 1
        }
        gy += 1
      }
      (im.doc_id, feat)
    }.toDF("doc_id", "features_ppm")
  }
}

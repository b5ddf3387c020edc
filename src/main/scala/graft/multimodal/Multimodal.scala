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

    /** REAL container demux for the three formats a pure JVM carries:
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
      *  - MP4 / motion-JPEG: an ISO-BMFF box walk reads the sample tables
      *    (`stsd` codec check, `stsz` sizes, `stsc` sample→chunk runs,
      *    `stco`/`co64` chunk offsets) and slices each JPEG sample out of
      *    the blob verbatim — MJPEG-in-MP4 needs only the demuxer, never a
      *    codec. H.264/H.265 tracks (and any other compressed-codec
      *    `stsd` entry) still throw: decoding them is native-codec work.
      *
      * Anything else throws — route mixed corpora through [[SniffCodec]],
      * which degrades to the stub. All paths are bounded: at most
      * [[MaxFrames]] frames per blob; GIF frames pass the same per-image
      * pixel budget as decode AND a cumulative [[MaxTotalFrameBytes]]
      * output budget (the per-frame caps alone admit their product); AVI
      * chunks are disjoint blob ranges, so their total is bounded by the
      * blob itself; MP4 sample ranges come from an INDEX (a hostile file
      * can alias overlapping ranges), so the walk enforces the same
      * cumulative output budget as GIF.
      * `frameBytes` is the stub codec's chunk width and is ignored here —
      * real containers carry their own frame boundaries.
      */
    def frames(blob: Array[Byte], frameBytes: Int): Iterator[Array[Byte]] =
      if (SniffCodec.isGif(blob)) gifFrames(blob)
      else if (SniffCodec.isAvi(blob)) aviFrames(blob)
      else if (SniffCodec.isMp4(blob)) mp4Frames(blob)
      else throw new IllegalArgumentException(
        s"no pure-JVM demuxer for blob (${blob.length} bytes); " +
          "supported containers: GIF, AVI/MJPEG, MP4/MJPEG")

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

    /** `stsd` sample-entry formats whose samples are complete JPEGs —
      * the codec-free MJPEG-in-MP4 family (QuickTime `jpeg`, Motion-JPEG
      * A/B). Anything else in the stsd needs a real codec and is rejected.
      */
    private val Mp4JpegFormats = Set("jpeg", "mjpa", "mjpb")

    /** ISO-BMFF (MP4/QuickTime) demux for MJPEG tracks. The container is
      * big-endian length-prefixed boxes; the sample tables under
      * `moov/trak/mdia/minf/stbl` index the media bytes:
      *
      *  - `stsd` names the codec (first sample entry's fourcc — must be a
      *    JPEG family, see [[Mp4JpegFormats]]);
      *  - `stsz` gives per-sample byte sizes (or one fixed size);
      *  - `stsc` maps samples onto chunks as (first_chunk,
      *    samples_per_chunk) runs;
      *  - `stco`/`co64` give ABSOLUTE file offsets of each chunk, and
      *    samples within a chunk are contiguous.
      *
      * The walk re-plays that index and copies each sample range out of the
      * blob verbatim — each is a complete JPEG. Defenses: box sizes are
      * validated against the enclosing range (truncated/hostile sizes stop
      * the walk rather than read out of bounds); sample ranges must lie
      * inside the blob; and because offsets are an index rather than a
      * linear scan, overlapping/aliased ranges are possible in a hostile
      * file, so the cumulative [[MaxTotalFrameBytes]] budget and
      * [[MaxFrames]] cap both apply. Fragmented MP4 (`moof`) and non-JPEG
      * codecs throw — [[SniffCodec]] degrades those to the stub.
      */
    private def mp4Frames(blob: Array[Byte]): Iterator[Array[Byte]] = {
      def u32(off: Int): Long =
        (blob(off) & 0xffL) << 24 | (blob(off + 1) & 0xffL) << 16 |
          (blob(off + 2) & 0xffL) << 8 | (blob(off + 3) & 0xffL)
      def u64(off: Int): Long = u32(off) << 32 | u32(off + 4)
      def fourcc(off: Int): String = new String(blob, off, 4, "ISO-8859-1")

      /** Top-down scan of the box sequence in [start, end): yields
        * (type, bodyStart, bodyEnd). Stops at the first malformed size.
        */
      def boxes(start: Int, end: Int): Iterator[(String, Int, Int)] =
        new Iterator[(String, Int, Int)] {
          private var p = start
          def hasNext: Boolean = p + 8 <= end && {
            val size = u32(p)
            // a 64-bit-size header (size==1) truncated before its largesize
            // field is malformed — stop, don't fall through to size.toInt
            size == 0 || (size == 1 && p + 16 <= end) ||
              (size >= 8 && size <= end - p)
          }
          def next(): (String, Int, Int) = {
            val size0 = u32(p)
            val tpe = fourcc(p + 4)
            val (body, boxEnd) =
              if (size0 == 1) { // hasNext guarantees p + 16 <= end here
                val s = u64(p + 8)
                if (s < 16 || s > end - p) (p + 16, end) else (p + 16, p + s.toInt)
              } else if (size0 == 0) (p + 8, end) // box extends to enclosing end
              else (p + 8, p + size0.toInt)
            p = boxEnd
            (tpe, body, boxEnd)
          }
        }
      def find(start: Int, end: Int, tpe: String): Option[(Int, Int)] =
        boxes(start, end).collectFirst { case (`tpe`, b, e) => (b, e) }

      val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var total = 0L
      val moov = find(0, blob.length, "moov").getOrElse(
        throw new IllegalArgumentException("MP4 blob has no moov box"))
      for ((tpe, tb, te) <- boxes(moov._1, moov._2) if tpe == "trak") {
        val stbl = for {
          (mb, me) <- find(tb, te, "mdia")
          (nb, ne) <- find(mb, me, "minf")
          st <- find(nb, ne, "stbl")
        } yield st
        stbl.foreach { case (sb, se) =>
          // stsd body: version/flags(4) entry_count(4), then sample entries
          // (each itself a box whose type is the codec fourcc)
          val jpegTrack = find(sb, se, "stsd").exists { case (db, de) =>
            db + 16 <= de && Mp4JpegFormats(fourcc(db + 12).toLowerCase)
          }
          if (jpegTrack) {
            val sizes: IndexedSeq[Long] = find(sb, se, "stsz").map { case (zb, ze) =>
              if (ze - zb < 12) IndexedSeq.empty[Long]
              else {
                val fixed = u32(zb + 4); val n = u32(zb + 8).toInt
                if (n < 0 || n > MaxFrames * 4) IndexedSeq.empty[Long]
                else if (fixed != 0) IndexedSeq.fill(n)(fixed)
                else if (zb + 12 + 4L * n <= ze)
                  (0 until n).map(i => u32(zb + 12 + 4 * i))
                else IndexedSeq.empty[Long]
              }
            }.getOrElse(IndexedSeq.empty)
            val chunkOffsets: IndexedSeq[Long] =
              find(sb, se, "stco").map { case (cb, ce) =>
                val n = if (ce - cb < 8) -1 else u32(cb + 4).toInt
                if (n < 0 || cb + 8 + 4L * n > ce) IndexedSeq.empty[Long]
                else (0 until n).map(i => u32(cb + 8 + 4 * i))
              }.orElse(find(sb, se, "co64").map { case (cb, ce) =>
                val n = if (ce - cb < 8) -1 else u32(cb + 4).toInt
                if (n < 0 || cb + 8 + 8L * n > ce) IndexedSeq.empty[Long]
                else (0 until n).map(i => u64(cb + 8 + 8 * i))
              }).getOrElse(IndexedSeq.empty)
            val stscRuns: IndexedSeq[(Long, Long)] = // (first_chunk, samples_per_chunk)
              find(sb, se, "stsc").map { case (cb, ce) =>
                val n = if (ce - cb < 8) -1 else u32(cb + 4).toInt
                if (n < 0 || cb + 8 + 12L * n > ce) IndexedSeq.empty[(Long, Long)]
                else (0 until n).map(i => (u32(cb + 8 + 12 * i), u32(cb + 12 + 12 * i)))
              }.getOrElse(IndexedSeq.empty)
            var sample = 0
            var chunk = 0
            var bail = false // truncated/hostile index: stop, keep what's sound
            while (!bail && sample < sizes.length && chunk < chunkOffsets.length &&
                   out.length < MaxFrames) {
              // samples_per_chunk of the last run whose first_chunk ≤ this one
              val spc = stscRuns.takeWhile(_._1 <= chunk + 1).lastOption.map(_._2).getOrElse(0L)
              var off = chunkOffsets(chunk)
              var k = 0L
              while (!bail && k < spc && sample < sizes.length && out.length < MaxFrames) {
                val sz = sizes(sample)
                if (sz <= 0 || off < 0 || off + sz > blob.length) bail = true
                else {
                  total += sz
                  if (total > MaxTotalFrameBytes)
                    throw new IllegalArgumentException(
                      s"MP4 demux emitted $total bytes over ${out.length + 1} samples, " +
                        s"past the $MaxTotalFrameBytes-byte per-blob budget")
                  out += java.util.Arrays.copyOfRange(blob, off.toInt, (off + sz).toInt)
                  off += sz
                  sample += 1
                  k += 1
                }
              }
              chunk += 1
            }
          }
        }
      }
      if (out.isEmpty)
        throw new IllegalArgumentException(
          "MP4 blob has no demuxable MJPEG track (compressed codecs need a native decoder)")
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

    private[multimodal] def isMp4(b: Array[Byte]): Boolean =
      b.length >= 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

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

    /** Real demux for real containers (GIF animation, AVI/MJPEG,
      * MP4/MJPEG), stub chunking for everything else — same
      * degrade-don't-die contract as image decode: a corrupt body behind a
      * valid container magic (or an MP4 whose track needs a native codec)
      * falls back to the stub instead of fail-looping the task.
      */
    def frames(blob: Array[Byte], frameBytes: Int): Iterator[Array[Byte]] =
      if (isGif(blob) || isAvi(blob) || isMp4(blob)) {
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

  /** 64-bit perceptual hashes per image — the signature stage of image
    * near-dup dedup (m6), computed from decoded pixels with the same
    * integer-exact discipline as [[extractFeaturesPpm]] so a SQL oracle can
    * replay it bit-for-bit:
    *
    *  - `ahash` (average hash): channel-SUMMED gray values pooled onto an
    *    8×8 grid (cell value = ⌊sum·10⁶ / count⌋ ppm, the ppm fixed-point);
    *    bit k = gy·8+gx is set iff that cell's ppm exceeds the global mean
    *    ⌊Σppm / 64⌋. Robust to small pixel noise: a per-pixel ±1 shifts a
    *    cell mean by ~10⁶/count ppm against bit gaps of ~10⁷ ppm.
    *  - `dhash` (difference hash): the same pooling onto 8 rows × 9 columns;
    *    bit k = r·8+j is set iff cell (r, j+1) > cell (r, j) — gradient
    *    signs, invariant to global brightness shifts.
    *
    * All arithmetic is nonnegative 64-bit integer (no float, no rounding
    * mode), so Spark and the DuckDB oracle agree exactly. Narrow map work:
    * one pass over each image's pixels, no shuffle — hashing a 100 TB image
    * corpus is scan-bound, and the downstream pair stage works on 16 bytes
    * per image, not pixels.
    */
  def perceptualHashes(images: Dataset[DecodedImage]): DataFrame = {
    val spark = images.sparkSession
    import spark.implicits._
    images.map { im =>
      val w = im.width; val h = im.height; val c = im.channels
      // pooled ppm over an R×C grid of the channel-summed gray image
      def pool(rows: Int, cols: Int): Array[Long] = {
        val sum = new Array[Long](rows * cols)
        val cnt = new Array[Long](rows * cols)
        var y = 0
        while (y < h) {
          val gy = (rows * y + rows - 1) / h
          var x = 0
          while (x < w) {
            val gx = (cols * x + cols - 1) / w
            var g = 0L
            var ch = 0
            while (ch < c) { g += im.pixels((y * w + x) * c + ch) & 0xff; ch += 1 }
            sum(gy * cols + gx) += g
            cnt(gy * cols + gx) += 1
            x += 1
          }
          y += 1
        }
        Array.tabulate(rows * cols)(i => if (cnt(i) == 0) 0L else sum(i) * 1000000L / cnt(i))
      }
      val a = pool(8, 8)
      var tot = 0L
      var i = 0
      while (i < 64) { tot += a(i); i += 1 }
      val mu = tot / 64
      var ahash = 0L
      i = 0
      while (i < 64) { if (a(i) > mu) ahash |= 1L << i; i += 1 }
      val d = pool(8, 9)
      var dhash = 0L
      var r = 0
      while (r < 8) {
        var j = 0
        while (j < 8) {
          if (d(r * 9 + j + 1) > d(r * 9 + j)) dhash |= 1L << (r * 8 + j)
          j += 1
        }
        r += 1
      }
      (im.doc_id, ahash, dhash)
    }.toDF("doc_id", "ahash", "dhash")
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

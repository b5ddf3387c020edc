package graft.covsonar

/** BGZF (blocked gzip, SAM spec v1 §4.1) output stream — what `bgzip`
  * emits and what tabix/bcftools require for indexed access. Every block
  * is an independent ≤64 KiB gzip member whose FEXTRA carries the `BC`
  * subfield with the compressed block size, so a reader can virtual-seek
  * to (blockOffset, intraOffset) without inflating the prefix; the stream
  * ends with the spec's fixed 28-byte empty EOF block. A BGZF file is by
  * construction also a valid multi-member plain-gzip file, so every
  * existing gzip consumer keeps working.
  *
  * The reference exports bgzip-compressed, tabix-indexable VCFs
  * (ref: lib/sonartoVCF.py:92-129 pipes through bgzip); round 8 emitted
  * plain whole-stream gzip as a documented divergence — this closes it,
  * pure-JVM (java.util.zip.Deflater in raw mode), no native bgzip.
  */
final class BgzfOutputStream(out: java.io.OutputStream) extends java.io.OutputStream {
  // uncompressed payload per block: bgzip's own default (0xff00), which
  // leaves headroom under the u16 BSIZE field for typical text
  private val MaxChunk = 0xff00
  private val buf = new Array[Byte](MaxChunk)
  private var n = 0
  private var finished = false
  // one native zlib stream and one compression buffer per BGZF stream,
  // reset per block — a GB-scale sharded export writes ~16k blocks/GB and
  // per-block Deflater alloc/end() is measurable native churn
  private val deflater = new java.util.zip.Deflater(
    java.util.zip.Deflater.DEFAULT_COMPRESSION, true) // raw deflate
  private val cbuf = new Array[Byte](MaxChunk + 1024)
  private val crc = new java.util.zip.CRC32()

  override def write(b: Int): Unit = {
    buf(n) = b.toByte; n += 1
    if (n == MaxChunk) { writeBlock(buf, 0, n); n = 0 }
  }

  override def write(b: Array[Byte], off: Int, len: Int): Unit = {
    var o = off; var rem = len
    while (rem > 0) {
      val take = math.min(rem, MaxChunk - n)
      System.arraycopy(b, o, buf, n, take)
      n += take; o += take; rem -= take
      if (n == MaxChunk) { writeBlock(buf, 0, n); n = 0 }
    }
  }

  /** Flush the pending partial block and append the EOF marker block.
    * Idempotent; the underlying stream stays open (close() closes it).
    */
  def finish(): Unit = if (!finished) {
    if (n > 0) { writeBlock(buf, 0, n); n = 0 }
    out.write(BgzfOutputStream.EofBlock)
    finished = true
  }

  override def flush(): Unit = out.flush()

  override def close(): Unit = {
    finish()
    deflater.end()
    out.close()
  }

  private def writeBlock(d: Array[Byte], off: Int, len: Int): Unit = {
    deflater.reset()
    deflater.setInput(d, off, len)
    deflater.finish()
    var clen = 0
    while (!deflater.finished())
      clen += deflater.deflate(cbuf, clen, cbuf.length - clen)
    if (clen + 26 > 0xffff) {
      // pathological incompressible chunk would overflow the u16 BSIZE:
      // split and recurse (each half compresses into its own block) — the
      // htsjdk/bgzip discipline; unreachable on VCF text but total anyway
      writeBlock(d, off, len / 2)
      writeBlock(d, off + len / 2, len - len / 2)
      return
    }
    crc.reset()
    crc.update(d, off, len)
    val total = clen + 26 // 18 header + clen + 8 trailer
    val h = new Array[Byte](18)
    h(0) = 0x1f.toByte; h(1) = 0x8b.toByte // gzip magic
    h(2) = 8 // CM = deflate
    h(3) = 4 // FLG = FEXTRA
    // MTIME(4) = 0, XFL = 0 already; OS = 0xff (unknown)
    h(9) = 0xff.toByte
    h(10) = 6; h(11) = 0 // XLEN = 6
    h(12) = 'B'; h(13) = 'C'
    h(14) = 2; h(15) = 0 // SLEN = 2
    h(16) = ((total - 1) & 0xff).toByte // BSIZE = total block length - 1
    h(17) = (((total - 1) >> 8) & 0xff).toByte
    out.write(h)
    out.write(cbuf, 0, clen)
    val t = new Array[Byte](8)
    val c = crc.getValue
    t(0) = (c & 0xff).toByte; t(1) = ((c >> 8) & 0xff).toByte
    t(2) = ((c >> 16) & 0xff).toByte; t(3) = ((c >> 24) & 0xff).toByte
    t(4) = (len & 0xff).toByte; t(5) = ((len >> 8) & 0xff).toByte
    t(6) = ((len >> 16) & 0xff).toByte; t(7) = ((len >> 24) & 0xff).toByte
    out.write(t)
  }
}

object BgzfOutputStream {
  /** The spec's fixed EOF block: an empty BGZF block, byte-for-byte. */
  val EofBlock: Array[Byte] = Array(
    0x1f, 0x8b, 0x08, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00, 0xff,
    0x06, 0x00, 0x42, 0x43, 0x02, 0x00, 0x1b, 0x00, 0x03, 0x00,
    0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00).map(_.toByte)
}

/** Hadoop codec wrapper so Spark's text writer emits BGZF directly —
  * each task's part file is independently valid BGZF (blocks + EOF), and
  * BGZF files concatenate soundly (an interior EOF block is just an empty
  * block), so the format survives Spark's many-part layout. Extends
  * GzipCodec: the READ side inherits gzip's (BGZF is valid multi-member
  * gzip) and the `.gz` extension is correct for bgzip output by
  * convention.
  *
  * READ-SIDE REQUIREMENT: reading multi-block BGZF through the Hadoop
  * codec factory depends on the resolved gzip decompressor handling
  * CONCATENATED gzip members. Hadoop's pure-Java
  * `BuiltInGzipDecompressor` does; historical native-zlib decompressor
  * paths stopped at the first member, which would silently truncate a
  * readback to the first ~64 KiB block. SonarVcfSpec pins the full
  * codec-factory + spark.read.text chain against a multi-block fixture
  * on this runtime; a deployment overriding `io.compression.codecs`
  * with a native gzip codec must re-verify that property.
  */
final class BgzfCodec extends org.apache.hadoop.io.compress.GzipCodec {
  override def createOutputStream(out: java.io.OutputStream)
      : org.apache.hadoop.io.compress.CompressionOutputStream =
    new org.apache.hadoop.io.compress.CompressionOutputStream(out) {
      private val bgzf = new BgzfOutputStream(out)
      override def write(b: Int): Unit = bgzf.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        bgzf.write(b, off, len)
      override def finish(): Unit = bgzf.finish()
      override def resetState(): Unit = ()
      override def flush(): Unit = bgzf.flush()
      // The base close() would call finish() then out.close() and never
      // release the native Deflater; route through bgzf.close() (finish →
      // deflater.end() → out.close()) so every part file written through
      // the codec frees its zlib stream deterministically.
      override def close(): Unit = bgzf.close()
    }

  override def createOutputStream(out: java.io.OutputStream,
      c: org.apache.hadoop.io.compress.Compressor)
      : org.apache.hadoop.io.compress.CompressionOutputStream =
    createOutputStream(out) // BGZF blocks manage their own Deflaters
}

package graft.multimodal

/** WAV/RIFF audio plumbing — the audio member of the multimodal family
  * (images/video demux live in [[Multimodal]]). The writer emits genuine
  * RIFF/WAVE bytes (canonical 16-bit PCM mono, plus a LIST metadata chunk
  * so readers that assume a fixed 44-byte layout break — ours must not);
  * the reader is a real chunk walk with the same discipline as the
  * GIF/AVI/MP4 demuxers: magic-gated, bounds-checked against the blob,
  * odd-size chunk padding honored, truncation and hostile declared sizes
  * rejected rather than over-read, and a decoded-output budget so a small
  * blob can never declare its way into a huge allocation.
  *
  * Reference for the operator surface being mirrored: covsonar has no
  * audio path; this follows the container-demux contract established at
  * `Multimodal.scala` (header-first validation, budgets before
  * allocation).
  */
object Audio {

  /** Decoded-sample budget: 16 Mi samples (32 MiB) per blob — the audio
    * twin of the image family's pixel budget. The data chunk is ALSO
    * bounded by the physical blob length, so a lying header fails fast.
    */
  private val MaxSamples = 16 * 1024 * 1024

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def rd32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def rd16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Serialize 16-bit PCM mono samples as a real WAV blob: RIFF header,
    * `fmt ` chunk, a LIST(INFO) metadata chunk BEFORE `data` (real
    * encoders emit these; a reader hard-coding offset 44 mis-parses), then
    * the `data` chunk, little-endian throughout.
    */
  def synthWav(samples: Array[Short], sampleRate: Int = 8000): Array[Byte] = {
    // LIST form 'INFO' with one conforming ISFT sub-chunk: id + le32 size
    // + 8-byte payload (a parser that reads sub-chunk headers must see a
    // real size field, not payload bytes)
    val info = "ISFT".getBytes("US-ASCII") ++ le32(8) ++
      "graft   ".getBytes("US-ASCII")
    val listBody = "INFO".getBytes("US-ASCII") ++ info
    val dataLen = samples.length * 2
    val riffLen = 4 + (8 + 16) + (8 + listBody.length) + (8 + dataLen)
    val out = new java.io.ByteArrayOutputStream(8 + riffLen)
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32(riffLen))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); out.write(le32(16))
    out.write(le16(1))               // PCM
    out.write(le16(1))               // mono
    out.write(le32(sampleRate))
    out.write(le32(sampleRate * 2))  // byte rate
    out.write(le16(2))               // block align
    out.write(le16(16))              // bits per sample
    out.write("LIST".getBytes("US-ASCII")); out.write(le32(listBody.length))
    out.write(listBody)
    out.write("data".getBytes("US-ASCII")); out.write(le32(dataLen))
    samples.foreach(sv => out.write(le16(sv & 0xffff)))
    out.toByteArray
  }

  /** Parse a WAV blob back to its 16-bit PCM mono samples via a generic
    * RIFF chunk walk: unknown chunks (LIST, fact, …) are skipped with
    * odd-length pad bytes honored; the walk stops at the first `data`
    * chunk after a valid PCM/mono/16-bit `fmt `. Malformed input — bad
    * magic, truncated chunk, declared sizes past the blob or past
    * [[MaxSamples]], unsupported encodings — throws
    * IllegalArgumentException (callers route through the SniffCodec-style
    * degrade if they want a soft failure).
    */
  def decodeWav(blob: Array[Byte]): Array[Short] = {
    def fail(msg: String): Nothing = throw new IllegalArgumentException(s"WAV: $msg")
    if (blob.length < 12 ||
      new String(blob, 0, 4, "US-ASCII") != "RIFF" ||
      new String(blob, 8, 4, "US-ASCII") != "WAVE") fail("bad magic")
    val riffLen = rd32(blob, 4)
    if (riffLen < 4 || 8L + riffLen > blob.length) fail("declared RIFF size exceeds blob")
    var off = 12
    var fmtOk = false
    var result: Array[Short] = null
    while (result == null && off + 8 <= blob.length) {
      val id = new String(blob, off, 4, "US-ASCII")
      val len = rd32(blob, off + 8 - 4)
      if (len < 0 || off + 8L + len > blob.length) fail(s"chunk '$id' truncated")
      id match {
        case "fmt " =>
          if (len < 16) fail("fmt chunk too short")
          val codec = rd16(blob, off + 8)
          val channels = rd16(blob, off + 10)
          val bits = rd16(blob, off + 22)
          if (codec != 1 || channels != 1 || bits != 16)
            fail(s"unsupported encoding codec=$codec ch=$channels bits=$bits")
          fmtOk = true
        case "data" =>
          if (!fmtOk) fail("data chunk before fmt")
          if ((len & 1) != 0) fail(s"odd data length $len for 16-bit samples")
          val n = len / 2
          if (n > MaxSamples) fail(s"declares $n samples, over the $MaxSamples budget")
          val s = new Array[Short](n)
          var i = 0
          while (i < n) { s(i) = rd16(blob, off + 8 + 2 * i).toShort; i += 1 }
          result = s
        case _ => () // LIST, fact, bext, … — skip
      }
      off += 8 + len + (len & 1) // RIFF chunks pad to even length
    }
    if (result == null) fail("no data chunk")
    result
  }
}

package graft.covsonar

import java.io.{BufferedInputStream, EOFException, FileInputStream, FileOutputStream, InputStream, RandomAccessFile}
import scala.collection.mutable

/** Tabix (`.tbi`) index writer + region reader for BGZF-compressed VCF —
  * the final piece of the reference's export contract: `sonar var2vcf`
  * pipes through `bgzip` and runs `tabix -p vcf` on the result
  * (ref: lib/sonartoVCF.py:100), so a consumer expects indexed regional
  * access. Implements the public tabix format (Li 2011, Bioinformatics
  * 27(5); the SAM spec's UCSC-binning appendix): R-tree-style bins over
  * [0, 2^29) plus a 16 kb linear index, chunk (virtual-offset) intervals
  * per bin, all little-endian inside an outer BGZF wrapper.
  *
  * Virtual offsets are `(compressedBlockOffset << 16) | intraBlockOffset`
  * — exactly what [[BgzfOutputStream]]'s block structure supports, and
  * why the sharded export's byte-concatenated parts stay indexable.
  *
  * Indexing is a single streaming pass over the BGZF file (no Spark —
  * the index is metadata-sized and the pass is I/O-bound; at population
  * scale it runs once per merged export, or per shard prefix range).
  */
object Tabix {

  // ---- UCSC binning (SAM spec appendix; [beg, end) 0-based) ----------------

  private[covsonar] def reg2bin(beg: Int, end0: Int): Int = {
    val end = end0 - 1
    if ((beg >> 14) == (end >> 14)) 4681 + (beg >> 14)
    else if ((beg >> 17) == (end >> 17)) 585 + (beg >> 17)
    else if ((beg >> 20) == (end >> 20)) 73 + (beg >> 20)
    else if ((beg >> 23) == (end >> 23)) 9 + (beg >> 23)
    else if ((beg >> 26) == (end >> 26)) 1 + (beg >> 26)
    else 0
  }

  private[covsonar] def reg2bins(beg: Int, end0: Int): Seq[Int] = {
    val end = end0 - 1
    val out = mutable.ArrayBuffer[Int](0)
    var k = 1 + (beg >> 26); while (k <= 1 + (end >> 26)) { out += k; k += 1 }
    k = 9 + (beg >> 23); while (k <= 9 + (end >> 23)) { out += k; k += 1 }
    k = 73 + (beg >> 20); while (k <= 73 + (end >> 20)) { out += k; k += 1 }
    k = 585 + (beg >> 17); while (k <= 585 + (end >> 17)) { out += k; k += 1 }
    k = 4681 + (beg >> 14); while (k <= 4681 + (end >> 14)) { out += k; k += 1 }
    out.toSeq
  }

  // ---- BGZF block reader ----------------------------------------------------

  /** One BGZF block: compressed-stream offset of its first byte and the
    * inflated payload.
    */
  private final case class Block(coffset: Long, data: Array[Byte])

  private def readFully(in: InputStream, buf: Array[Byte], off: Int, len: Int): Boolean = {
    var got = 0
    while (got < len) {
      val r = in.read(buf, off + got, len - got)
      if (r < 0) return false
      got += r
    }
    true
  }

  /** Stream BGZF blocks, tracking compressed offsets. Total: malformed
    * framing throws IllegalArgumentException with the offset.
    */
  private def blocks(in: InputStream): Iterator[Block] = new Iterator[Block] {
    private var coffset = 0L
    private var nextBlock: Block = _
    private var done = false
    private val inflater = new java.util.zip.Inflater(true)

    private def advance(): Unit = {
      val hdr = new Array[Byte](12)
      val first = in.read()
      if (first < 0) { done = true; return }
      hdr(0) = first.toByte
      if (!readFully(in, hdr, 1, 11))
        throw new IllegalArgumentException(s"truncated BGZF header at $coffset")
      require((hdr(0) & 0xff) == 0x1f && (hdr(1) & 0xff) == 0x8b && hdr(2) == 8,
        s"not a BGZF block at offset $coffset")
      require((hdr(3) & 4) != 0, s"BGZF block without FEXTRA at $coffset")
      val xlen = (hdr(10) & 0xff) | ((hdr(11) & 0xff) << 8)
      val extra = new Array[Byte](xlen)
      require(readFully(in, extra, 0, xlen), s"truncated FEXTRA at $coffset")
      var bsize = -1
      var p = 0
      while (p + 4 <= xlen) {
        val slen = (extra(p + 2) & 0xff) | ((extra(p + 3) & 0xff) << 8)
        if (extra(p) == 'B' && extra(p + 1) == 'C' && slen == 2)
          bsize = (extra(p + 4) & 0xff) | ((extra(p + 5) & 0xff) << 8)
        p += 4 + slen
      }
      require(bsize >= 0, s"BGZF block missing BC subfield at $coffset")
      val total = bsize + 1
      val cdataLen = total - 12 - xlen - 8
      require(cdataLen >= 0, s"bad BSIZE at $coffset")
      val cdata = new Array[Byte](cdataLen)
      require(readFully(in, cdata, 0, cdataLen), s"truncated block at $coffset")
      val trailer = new Array[Byte](8)
      require(readFully(in, trailer, 0, 8), s"truncated trailer at $coffset")
      val isize = (trailer(4) & 0xff) | ((trailer(5) & 0xff) << 8) |
        ((trailer(6) & 0xff) << 16) | ((trailer(7) & 0xff) << 24)
      // BGZF caps uncompressed block size at 64 KiB — an out-of-range ISIZE
      // is corruption, not a big block; reject before allocating.
      require(isize >= 0 && isize <= 0x10000, s"corrupt BGZF ISIZE $isize at $coffset")
      val out = new Array[Byte](isize)
      inflater.reset()
      inflater.setInput(cdata)
      var got = 0
      while (got < isize && !inflater.finished())
        got += inflater.inflate(out, got, isize - got)
      require(got == isize, s"BGZF block inflated $got of $isize at $coffset")
      val crcStored = (trailer(0) & 0xffL) | ((trailer(1) & 0xffL) << 8) |
        ((trailer(2) & 0xffL) << 16) | ((trailer(3) & 0xffL) << 24)
      val crc = new java.util.zip.CRC32()
      crc.update(out, 0, isize)
      require(crc.getValue == crcStored,
        s"BGZF block CRC mismatch at $coffset (stored $crcStored, computed ${crc.getValue})")
      nextBlock = Block(coffset, out)
      coffset += total
    }

    override def hasNext: Boolean = {
      if (!done && nextBlock == null) advance()
      !done && nextBlock != null
    }
    override def next(): Block = {
      if (!hasNext) throw new EOFException()
      val b = nextBlock; nextBlock = null; b
    }
  }

  // ---- index building --------------------------------------------------------

  private final class RefIndex(val name: String) {
    val bins = mutable.LinkedHashMap[Int, mutable.ArrayBuffer[(Long, Long)]]()
    val linear = mutable.ArrayBuffer[Long]()

    def add(beg: Int, end: Int, voffBeg: Long, voffEnd: Long): Unit = {
      val b = reg2bin(beg, end)
      val chunks = bins.getOrElseUpdate(b, mutable.ArrayBuffer())
      // merge adjacent chunks (records written back-to-back)
      if (chunks.nonEmpty && chunks.last._2 == voffBeg)
        chunks(chunks.length - 1) = (chunks.last._1, voffEnd)
      else chunks += ((voffBeg, voffEnd))
      var w = beg >> 14
      val wEnd = (end - 1) >> 14
      while (w <= wEnd) {
        while (linear.length <= w) linear += 0L
        if (linear(w) == 0L || voffBeg < linear(w)) linear(w) = voffBeg
        w += 1
      }
    }
  }

  /** Build a `.tbi` index for a BGZF-compressed VCF file. Single pass;
    * returns the number of data records indexed. VCF end positions follow
    * tabix's own rule: `end = (POS-1) + len(REF)`.
    */
  def indexVcf(vcfGzPath: String, tbiPath: String): Long = {
    val refs = mutable.LinkedHashMap[String, RefIndex]()
    var nRecords = 0L

    val in = new BufferedInputStream(new FileInputStream(vcfGzPath), 1 << 16)
    try {
      // line reassembly across block boundaries, keeping each line's start
      // virtual offset. A line ending at the last byte of a block gets its
      // end voffset as (thisBlock, dataLength): the 0xff00 block cap keeps
      // the intra offset under 2^16 and the reader treats it as "end of
      // this block" — equivalent to htslib's next-block-start convention.
      var pending = new java.io.ByteArrayOutputStream()
      var pendingVoff = 0L
      var lastCoffset = 0L
      var lastLen = 0
      blocks(in).foreach { blk =>
        val d = blk.data
        if (d.nonEmpty) { lastCoffset = blk.coffset; lastLen = d.length }
        var lineStart = 0
        var i = 0
        while (i < d.length) {
          if (d(i) == '\n') {
            val voffEnd = (blk.coffset << 16) | (i + 1)
            val startVoff =
              if (pending.size() > 0) pendingVoff
              else (blk.coffset << 16) | lineStart
            pending.write(d, lineStart, i - lineStart)
            if (handleLine(pending.toByteArray, startVoff, voffEnd, refs))
              nRecords += 1
            pending = new java.io.ByteArrayOutputStream()
            lineStart = i + 1
          }
          i += 1
        }
        if (lineStart < d.length) {
          if (pending.size() == 0) pendingVoff = (blk.coffset << 16) | lineStart
          pending.write(d, lineStart, d.length - lineStart)
        }
      }
      // a final data line without a trailing newline still gets indexed —
      // its end voffset is the end of the last non-empty block
      if (pending.size() > 0) {
        val voffEnd = (lastCoffset << 16) | lastLen
        if (handleLine(pending.toByteArray, pendingVoff, voffEnd, refs))
          nRecords += 1
      }
    } finally in.close()

    writeTbi(tbiPath, refs)
    nRecords
  }

  /** Returns true iff the line was a data record (indexed). */
  private def handleLine(line: Array[Byte], voffBeg: Long, voffEnd: Long,
      refs: mutable.LinkedHashMap[String, RefIndex]): Boolean = {
    if (line.isEmpty || line(0) == '#') return false
    // columns: CHROM \t POS \t ID \t REF \t ...
    var t1 = -1; var t2 = -1; var t3 = -1; var t4 = -1
    var i = 0
    while (i < line.length && t4 < 0) {
      if (line(i) == '\t') {
        if (t1 < 0) t1 = i else if (t2 < 0) t2 = i
        else if (t3 < 0) t3 = i else t4 = i
      }
      i += 1
    }
    require(t3 > 0, "malformed VCF data line (fewer than 4 columns)")
    if (t4 < 0) t4 = line.length
    val chrom = new String(line, 0, t1, "US-ASCII")
    val pos = new String(line, t1 + 1, t2 - t1 - 1, "US-ASCII").toLong
    val refAllele = t4 - t3 - 1
    val beg = (pos - 1).toInt
    val end = beg + math.max(1, refAllele)
    refs.getOrElseUpdate(chrom, new RefIndex(chrom)).add(beg, end, voffBeg, voffEnd)
    true
  }

  private def writeTbi(path: String, refs: mutable.LinkedHashMap[String, RefIndex]): Unit = {
    val raw = new java.io.ByteArrayOutputStream()
    def i32(v: Int): Unit = {
      raw.write(v & 0xff); raw.write((v >> 8) & 0xff)
      raw.write((v >> 16) & 0xff); raw.write((v >> 24) & 0xff)
    }
    def i64(v: Long): Unit = { i32((v & 0xffffffffL).toInt); i32((v >>> 32).toInt) }
    raw.write('T'); raw.write('B'); raw.write('I'); raw.write(1)
    i32(refs.size)
    i32(2)  // format: VCF
    i32(1)  // col_seq
    i32(2)  // col_beg
    i32(0)  // col_end (derived from REF for VCF)
    i32('#')
    i32(0)  // skip
    val names = refs.keys.map(_ + "\u0000").mkString
    i32(names.length)
    raw.write(names.getBytes("US-ASCII"))
    refs.values.foreach { r =>
      i32(r.bins.size)
      r.bins.foreach { case (bin, chunks) =>
        i32(bin)
        i32(chunks.length)
        chunks.foreach { case (b, e) => i64(b); i64(e) }
      }
      // fill linear-index gaps with the previous offset (htslib convention)
      var prev = 0L
      val lin = r.linear.map { v => if (v == 0L) prev else { prev = v; v } }
      i32(lin.length)
      lin.foreach(i64)
    }
    val out = new BgzfOutputStream(new FileOutputStream(path))
    try { out.write(raw.toByteArray, 0, raw.size()) } finally out.close()
  }

  // ---- region reader (consumes the index for random access) -----------------

  /** Parsed `.tbi` for querying. */
  final case class Index(names: Seq[String],
      bins: Seq[Map[Int, Seq[(Long, Long)]]],
      linear: Seq[Array[Long]])

  def readTbi(path: String): Index = {
    val in = new BufferedInputStream(new FileInputStream(path), 1 << 16)
    val bytes = try blocks(in).map(_.data).reduce(_ ++ _) finally in.close()
    var p = 0
    def u8(): Int = { val v = bytes(p) & 0xff; p += 1; v }
    def i32(): Int = u8() | (u8() << 8) | (u8() << 16) | (u8() << 24)
    def i64(): Long = (i32() & 0xffffffffL) | (i32().toLong << 32)
    require(u8() == 'T' && u8() == 'B' && u8() == 'I' && u8() == 1, "bad TBI magic")
    val nRef = i32()
    val _format = i32(); val _cs = i32(); val _cb = i32(); val _ce = i32()
    val _meta = i32(); val _skip = i32()
    val lNm = i32()
    val names = new String(bytes, p, lNm, "US-ASCII").split('\u0000').toSeq
    p += lNm
    val allBins = Seq.newBuilder[Map[Int, Seq[(Long, Long)]]]
    val allLin = Seq.newBuilder[Array[Long]]
    (0 until nRef).foreach { _ =>
      val nBin = i32()
      val m = Map.newBuilder[Int, Seq[(Long, Long)]]
      (0 until nBin).foreach { _ =>
        val bin = i32()
        val nChunk = i32()
        m += bin -> Seq.fill(nChunk)((i64(), i64()))
      }
      allBins += m.result()
      val nIntv = i32()
      allLin += Array.fill(nIntv)(i64())
    }
    Index(names, allBins.result(), allLin.result())
  }

  /** Random-access region query: all data lines overlapping
    * `[beg, end)` (0-based half-open) on `chrom`, via the index — seeks
    * straight to candidate chunks, inflating only the blocks they cover.
    */
  def query(vcfGzPath: String, idx: Index, chrom: String, beg: Int, end: Int): Seq[String] = {
    val rid = idx.names.indexOf(chrom)
    if (rid < 0) return Nil
    val binMap = idx.bins(rid)
    val minVoff = {
      val lin = idx.linear(rid)
      val w = beg >> 14
      if (w < lin.length) lin(w) else if (lin.nonEmpty) lin.last else 0L
    }
    val chunks = reg2bins(beg, end).flatMap(binMap.getOrElse(_, Nil))
      .filter(_._2 > minVoff)
      .sortBy(_._1)
    if (chunks.isEmpty) return Nil
    // merge overlapping/adjacent chunk runs to avoid re-reading blocks
    val merged = mutable.ArrayBuffer[(Long, Long)]()
    chunks.foreach { c =>
      if (merged.nonEmpty && c._1 <= merged.last._2)
        merged(merged.length - 1) = (merged.last._1, math.max(merged.last._2, c._2))
      else merged += c
    }
    val raf = new RandomAccessFile(vcfGzPath, "r")
    val results = mutable.ArrayBuffer[String]()
    try {
      merged.foreach { case (vBeg, vEnd) =>
        val cBeg = vBeg >>> 16
        val iBeg = (vBeg & 0xffff).toInt
        val cEnd = vEnd >>> 16
        val iEnd = (vEnd & 0xffff).toInt
        // inflate exactly the blocks the chunk covers into one buffer,
        // then slice [chunk start, chunk end): chunk boundaries are record
        // boundaries by construction, so the slice splits into whole lines
        raf.seek(cBeg)
        // shares the RAF's descriptor — not closed (raf.close() owns it)
        val in = new BufferedInputStream(new FileInputStream(raf.getFD), 1 << 16)
        val buf = new java.io.ByteArrayOutputStream()
        var endPos = -1
        val it = blocks(in)
        var done = false
        while (!done && it.hasNext) {
          val blk = it.next()
          val abs = cBeg + blk.coffset // blocks() counts from the seek point
          if (abs > cEnd) done = true
          else {
            if (abs == cEnd) { endPos = buf.size() + iEnd; done = true }
            buf.write(blk.data, 0, blk.data.length)
          }
        }
        val all = buf.toByteArray
        val hi = if (endPos >= 0) math.min(endPos, all.length) else all.length
        if (iBeg < hi)
          new String(all, iBeg, hi - iBeg, "US-ASCII").split('\n').foreach { line =>
            if (line.nonEmpty && line.charAt(0) != '#') results += line
          }
      }
    } finally raf.close()
    // exact overlap filter (bins are a superset). No dedup needed: the
    // merged chunk ranges are disjoint in virtual-offset space (the merge
    // above collapses any overlap), so each record instance is sliced out
    // exactly once — genuinely identical lines at different file positions
    // stay distinct, matching htslib tabix.
    results.toSeq.filter { line =>
      val cols = line.split("\t", 5)
      cols.length >= 4 && cols(0) == chrom && {
        val b = cols(1).toLong - 1
        val e = b + math.max(1, cols(3).length)
        b < end && e > beg
      }
    }
  }
}

package graft.covsonar

/** Pairwise global DNA alignment with affine gaps, equivalent in role to the
  * reference engine's EMBOSS Stretcher call (rki-mf1/covsonar
  * lib/sonardb.py:861-946: Myers-Miller global alignment, EDNAFULL scoring,
  * gapopen 16 / gapextend 4, followed by a left-align-gaps normalization).
  *
  * Implementation: banded Gotoh DP with adaptive band widening. Query genomes
  * are near-identical to the 29,903 bp reference, so the optimal path stays
  * within a narrow diagonal band; we verify optimality by checking whether the
  * traceback touches the band boundary and widen exponentially if it does.
  * This is O(n·W) time/space instead of O(n·m) — ~100× less work than a full
  * Myers-Miller pass at covsonar's sequence sizes, and the per-task memory
  * (a few MB) is what makes it safe to run thousands of alignments
  * concurrently inside Spark executors.
  *
  * Scoring follows NUC.4.4/EDNAFULL (match 5, mismatch −4, reduced penalties
  * against ambiguity codes) as shipped by the reference at lib/EDNAFULL, with
  * gap(k) = gapOpen + k·gapExtend.
  */
object Aligner {

  // EDNAFULL / NUC.4.4 scoring matrix over the 15 IUPAC nucleotide codes.
  private val alphabet = "ATGCSWRYKMBVHDN"
  private val code: Array[Int] = {
    val a = Array.fill(128)(-1)
    alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }
  private val matrix: Array[Array[Int]] = Array(
    Array(5, -4, -4, -4, -4, 1, 1, -4, -4, 1, -4, -1, -1, -1, -2),
    Array(-4, 5, -4, -4, -4, 1, -4, 1, 1, -4, -1, -4, -1, -1, -2),
    Array(-4, -4, 5, -4, 1, -4, 1, -4, 1, -4, -1, -1, -4, -1, -2),
    Array(-4, -4, -4, 5, 1, -4, -4, 1, -4, 1, -1, -1, -1, -4, -2),
    Array(-4, -4, 1, 1, -1, -4, -2, -2, -2, -2, -1, -1, -3, -3, -1),
    Array(1, 1, -4, -4, -4, -1, -2, -2, -2, -2, -3, -3, -1, -1, -1),
    Array(1, -4, 1, -4, -2, -2, -1, -4, -2, -2, -3, -1, -3, -1, -1),
    Array(-4, 1, -4, 1, -2, -2, -4, -1, -2, -2, -1, -3, -1, -3, -1),
    Array(-4, 1, 1, -4, -2, -2, -2, -2, -1, -4, -1, -3, -3, -1, -1),
    Array(1, -4, -4, 1, -2, -2, -2, -2, -4, -1, -3, -1, -1, -3, -1),
    Array(-4, -1, -1, -1, -1, -3, -3, -1, -1, -3, -1, -2, -2, -2, -1),
    Array(-1, -4, -1, -1, -1, -3, -1, -3, -3, -1, -2, -1, -2, -2, -1),
    Array(-1, -1, -4, -1, -3, -1, -3, -1, -3, -1, -2, -2, -1, -2, -1),
    Array(-1, -1, -1, -4, -3, -1, -1, -3, -1, -3, -2, -2, -2, -1, -1),
    Array(-2, -2, -2, -2, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1))

  @inline private def score(a: Char, b: Char): Int = {
    val ia = if (a < 128) code(a.toInt) else -1
    val ib = if (b < 128) code(b.toInt) else -1
    // unknown characters score like N
    matrix(if (ia < 0) 14 else ia)(if (ib < 0) 14 else ib)
  }

  /** Flattened matrix + per-sequence code arrays: the DP inner loop runs
    * ~4M cells per 30 kb alignment, so one bounds-checked flat lookup per
    * cell instead of charAt + 2D deref is a measurable share of ingest.
    */
  private val flatMatrix: Array[Int] = {
    val f = new Array[Int](15 * 15)
    for (i <- 0 until 15; j <- 0 until 15) f(i * 15 + j) = matrix(i)(j)
    f
  }

  private def codesOf(s: String): Array[Int] = {
    val out = new Array[Int](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val ic = if (c < 128) code(c.toInt) else -1
      out(i) = if (ic < 0) 14 else ic
      i += 1
    }
    out
  }

  private val NegInf = Int.MinValue / 4

  /** Reusable per-thread traceback buffer. The banded pass needs
    * (n+1)·bandwidth bytes (~4 MB at covsonar sizes) — allocated fresh per
    * alignment this is a G1 "humongous" allocation; at 32 concurrent
    * ingest tasks the churn was measurable (IngestRateProbe n=1024:
    * 59 → 72 genomes/s end-to-end from this cache + the target-code cache).
    * No clearing needed: the traceback only reads cells the current run
    * wrote (every in-band cell of rows 1..n is assigned, and row-0 bytes are
    * never consumed by the traceback's edge transitions).
    */
  private val tbCache = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](0)
  }

  /** The target is the same 30 kb reference for every alignment in a task:
    * cache its code array per thread instead of re-deriving 30k lookups.
    */
  private val tCodesCache = new ThreadLocal[(String, Array[Int])] {
    override def initialValue(): (String, Array[Int]) = ("", Array.empty)
  }

  /** Globally align `query` against `target` (the reference). Returns
    * (alignedQuery, alignedTarget) with '-' gap characters, gaps left-aligned.
    */
  def align(query: String, target: String, gapOpen: Int = 16, gapExtend: Int = 4): (String, String) = {
    var w = 64
    val maxW = math.max(2048, math.abs(query.length - target.length) + 64)
    var res = alignBanded(query, target, gapOpen, gapExtend, w)
    while (res == null && w < maxW) {
      w = math.min(w * 4, maxW)
      res = alignBanded(query, target, gapOpen, gapExtend, w)
    }
    if (res == null) // pathological input: accept the widest-band result
      res = alignBanded(query, target, gapOpen, gapExtend, maxW, acceptEdge = true)
    leftAlignGaps(res._1, res._2)
  }

  /** One banded Gotoh pass. Band: j - i ∈ [lo, hi] where i indexes target,
    * j indexes query. Returns null if the optimal traceback touches the band
    * boundary (meaning the band may have clipped the true optimum).
    */
  private def alignBanded(
      query: String, target: String, gapOpen: Int, gapExtend: Int, w: Int,
      acceptEdge: Boolean = false): (String, String) = {
    val n = target.length
    val m = query.length
    val lo = math.min(0, m - n) - w
    val hi = math.max(0, m - n) + w
    val bw = hi - lo + 1
    val openCost = gapOpen + gapExtend
    val tCodes = {
      val cached = tCodesCache.get()
      if (cached._1 eq target) cached._2
      else {
        val codes = codesOf(target)
        tCodesCache.set((target, codes))
        codes
      }
    }
    val qCodes = codesOf(query)

    // DP rows indexed by band offset b = j - i - lo ∈ [0, bw)
    val prevM = new Array[Int](bw); val prevX = new Array[Int](bw); val prevY = new Array[Int](bw)
    val curM = new Array[Int](bw); val curX = new Array[Int](bw); val curY = new Array[Int](bw)
    // packed traceback: per cell, 2 bits each for M/X/Y predecessor choice
    // M: 0=fromM 1=fromX 2=fromY ; X: 0=openFromM 1=extend 2=openFromY ; Y likewise
    val tb = {
      val need = (n + 1) * bw
      val cached = tbCache.get()
      if (cached.length >= need) cached
      else {
        val grown = new Array[Byte](need)
        tbCache.set(grown)
        grown
      }
    }

    // row i=0: only Y (gaps in target) possible along j
    java.util.Arrays.fill(prevM, NegInf)
    java.util.Arrays.fill(prevX, NegInf)
    java.util.Arrays.fill(prevY, NegInf)
    var b0 = -lo // offset of j=0 in row 0
    if (b0 >= 0 && b0 < bw) prevM(b0) = 0
    var j = 1
    while (j <= m && j - lo < bw) {
      val b = j - lo
      if (b >= 0) {
        prevY(b) = -(gapOpen + j * gapExtend)
        tb(b) = (1 << 4).toByte // Y extends Y
      }
      j += 1
    }

    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(curM, NegInf)
      java.util.Arrays.fill(curX, NegInf)
      java.util.Arrays.fill(curY, NegInf)
      val jMin = math.max(0, i + lo)
      val jMax = math.min(m, i + hi)
      val rowBase = i * bw
      var jj = jMin
      while (jj <= jMax) {
        val b = jj - i - lo
        var tbByte = 0
        // X: target char vs gap — predecessor at (i-1, jj) = prev row, offset b+1
        if (b + 1 < bw) {
          val mo = prevM(b + 1) - openCost
          val xe = prevX(b + 1) - gapExtend
          val yo = prevY(b + 1) - openCost
          var best = mo; var c = 0
          if (xe > best) { best = xe; c = 1 }
          if (yo > best) { best = yo; c = 2 }
          if (jj == 0 && i > 0) { // left edge: force continuation semantics
            curX(b) = -(gapOpen + i * gapExtend)
            c = if (i == 1) 0 else 1
          } else curX(b) = best
          tbByte |= (c << 2)
        }
        // Y: query char vs gap — predecessor at (i, jj-1) = cur row, offset b-1
        if (jj > 0 && b - 1 >= 0) {
          val mo = curM(b - 1) - openCost
          val ye = curY(b - 1) - gapExtend
          val xo = curX(b - 1) - openCost
          var best = mo; var c = 0
          if (ye > best) { best = ye; c = 1 }
          if (xo > best) { best = xo; c = 2 }
          curY(b) = best
          tbByte |= (c << 4)
        }
        // M: diagonal — predecessor at (i-1, jj-1) = prev row, same offset b
        if (jj > 0) {
          val pm = prevM(b); val px = prevX(b); val py = prevY(b)
          var best = pm; var c = 0
          if (px > best) { best = px; c = 1 }
          if (py > best) { best = py; c = 2 }
          if (best > NegInf)
            curM(b) = best + flatMatrix(tCodes(i - 1) * 15 + qCodes(jj - 1))
          tbByte |= c
        }
        tb(rowBase + b) = tbByte.toByte
        jj += 1
      }
      System.arraycopy(curM, 0, prevM, 0, bw)
      System.arraycopy(curX, 0, prevX, 0, bw)
      System.arraycopy(curY, 0, prevY, 0, bw)
      i += 1
    }

    // terminal cell (n, m)
    val bEnd = m - n - lo
    require(bEnd >= 0 && bEnd < bw, "band does not contain terminal cell")
    var state = 0 // 0=M 1=X 2=Y
    var bestScore = prevM(bEnd)
    if (prevX(bEnd) > bestScore) { bestScore = prevX(bEnd); state = 1 }
    if (prevY(bEnd) > bestScore) { bestScore = prevY(bEnd); state = 2 }

    // traceback
    val qa = new StringBuilder(m + 64)
    val ta = new StringBuilder(m + 64)
    var ci = n; var cj = m
    var touched = false
    while (ci > 0 || cj > 0) {
      val b = cj - ci - lo
      if ((b == 0 || b == bw - 1) && ci > 0 && cj > 0) touched = true
      val byteVal = tb(ci * bw + b)
      state match {
        case 0 =>
          if (ci == 0) { state = 2 } // top row: only Y possible
          else if (cj == 0) { state = 1 }
          else {
            qa.append(query.charAt(cj - 1)); ta.append(target.charAt(ci - 1))
            state = byteVal & 3
            ci -= 1; cj -= 1
          }
        case 1 =>
          qa.append('-'); ta.append(target.charAt(ci - 1))
          state = if (cj == 0) (if (ci == 1) 0 else 1) else ((byteVal >> 2) & 3) match {
            case 0 => 0; case 1 => 1; case 2 => 2
          }
          ci -= 1
        case 2 =>
          qa.append(query.charAt(cj - 1)); ta.append('-')
          state = if (ci == 0) (if (cj == 1) 0 else 2) else ((byteVal >> 4) & 3) match {
            case 0 => 0; case 1 => 2; case 2 => 1
          }
          cj -= 1
      }
    }
    if (touched && !acceptEdge) null
    else (qa.reverseIterator.mkString, ta.reverseIterator.mkString)
  }

  /** Shift every gap run as far left as the flanking context allows, on both
    * sequences — reference semantics at lib/sonardb.py:912-946
    * (left_align_gaps): a gap block moves one step left while the character
    * immediately before it equals the aligned character at its right end.
    */
  def leftAlignGaps(query0: String, target0: String): (String, String) = {
    val query = query0.toCharArray
    val target = target0.toCharArray
    val last = query.length - 1

    def shift(a: Array[Char], other: Array[Char]): Unit = {
      var i = 0
      while (i < a.length) {
        if (a(i) == '-') {
          var e = i
          while (e + 1 < a.length && a(e + 1) == '-') e += 1
          // gap run [i, e]; s = char before run
          var s = i - 1
          var ge = e
          while (s >= 0 && ge < last && a(s) == other(ge)) {
            a(ge) = a(s); a(s) = '-'
            s -= 1; ge -= 1
          }
          i = e + 1
        } else i += 1
      }
    }
    shift(query, target)
    shift(target, query)
    (new String(query), new String(target))
  }
}

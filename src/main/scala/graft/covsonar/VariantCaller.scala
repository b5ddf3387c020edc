package graft.covsonar

/** One nucleotide- or amino-acid-level variation derived from an alignment.
  *
  * Coordinates are 0-based; `end` is defined only for deletions/multi-residue
  * events (half-open), mirroring the reference's 6-tuples
  * (rki-mf1/covsonar lib/sonardb.py:1036-1220). Insertions carry the anchor
  * base (VCF-style); a leading insertion has start == -1 and empty ref.
  */
final case class Variant(
    ref: String,
    alt: String,
    start: Int,
    end: Option[Int],
    protein: Option[String],
    locus: Option[String])

/** Variant calling + profile building over a pairwise alignment — the Scala
  * re-expression of the reference's sonarALIGN/sonarDB profile machinery
  * (lib/sonardb.py:1036-1220 variant iteration, 2806-2941 profile building,
  * 2945-2990 frameshift filtering). Pure functions: executed inside Spark
  * `flatMap`/`mapPartitions` during ingest with the RefModel broadcast.
  */
object VariantCaller {

  /** Alignment positions of each `.-*` group of the aligned target — the
    * group starting index array; alignPos(x) = start of group x
    * (reference: _target_coords_matrix + align_pos, lib/sonardb.py:855-860,
    * 1012-1034).
    */
  private def groupStarts(alignedTarget: String): Array[Int] = {
    val starts = Array.newBuilder[Int]
    var i = 0
    val n = alignedTarget.length
    while (i < n) {
      starts += i
      i += 1
      while (i < n && alignedTarget.charAt(i) == '-') i += 1
    }
    starts += n // sentinel: alignPos(#groups) == alignment length
    starts.result()
  }

  /** Nucleotide-level variations (reference: iter_dna_vars,
    * lib/sonardb.py:1036-1125). Deletions are per-position and unfused;
    * insertions use the upstream anchor base.
    */
  def dnaVariants(alignedQuery: String, alignedTarget: String): List[Variant] = {
    val out = List.newBuilder[Variant]
    val n = alignedTarget.length

    // leading target gap = query overhang, pseudo-position -1
    var lead = 0
    while (lead < n && alignedTarget.charAt(lead) == '-') lead += 1
    if (lead > 0)
      out += Variant("", alignedQuery.substring(0, lead), -1, None, None, None)

    // prefix gap counts for alignment→reference coordinate mapping
    val gapsBefore = new Array[Int](n + 1)
    var i = 0
    while (i < n) {
      gapsBefore(i + 1) = gapsBefore(i) + (if (alignedTarget.charAt(i) == '-') 1 else 0)
      i += 1
    }
    @inline def realPos(x: Int) = x - gapsBefore(x + 1) // x minus gaps in target[0..x]

    // insertions: a non-gap target char followed by target gaps
    val isites = new java.util.HashSet[Int]()
    i = lead
    while (i < n) {
      if (alignedTarget.charAt(i) != '-' && i + 1 < n && alignedTarget.charAt(i + 1) == '-') {
        var e = i + 1
        while (e < n && alignedTarget.charAt(e) == '-') e += 1
        isites.add(i)
        out += Variant(alignedTarget.charAt(i).toString, alignedQuery.substring(i, e),
          realPos(i), None, None, None)
        i = e
      } else i += 1
    }

    // SNPs and per-position deletions
    i = 0
    while (i < n) {
      val t = alignedTarget.charAt(i)
      val q = alignedQuery.charAt(i)
      if (t != '-' && t != q && !isites.contains(i)) {
        val alt = if (q == '-') "" else q.toString
        out += Variant(t.toString, alt, realPos(i), None, None, None)
      }
      i += 1
    }
    out.result()
  }

  /** Amino-acid-level variations per CDS (reference: iter_aa_vars,
    * lib/sonardb.py:1127-1220). Codons are matched in alignment space with
    * interspersed/trailing gaps attached to the codon; both sides are
    * translated and differences emitted. Minus-strand CDS are not supported
    * (the reference's own '-' branch is unreachable dead code for SARS-CoV-2).
    */
  def aaVariants(alignedQuery: String, alignedTarget: String, cdsList: List[Cds]): List[Variant] = {
    val starts = groupStarts(alignedTarget)
    val nGroups = starts.length - 1
    @inline def alignPos(x: Int) = if (x >= nGroups) starts(nGroups) else starts(x)

    val out = List.newBuilder[Variant]
    cdsList.foreach { cds =>
      val tb = new StringBuilder
      val qb = new StringBuilder
      cds.coords.foreach { case (s, e) =>
        val as = alignPos(s)
        val ae = alignPos(e)
        tb ++= alignedTarget.substring(as, ae)
        qb ++= alignedQuery.substring(as, ae)
      }
      val target = tb.toString
      val query = qb.toString
      val n = target.length

      // codon scan: three non-gap target chars, gaps attached greedily
      var i = 0
      var gapsSoFar = 0
      while (i < n && target.charAt(i) == '-') { gapsSoFar += 1; i += 1 }
      while (i < n) {
        val s = i
        val gapsBeforeS = gapsSoFar
        var found = 0
        var j = i
        while (j < n && found < 3) {
          if (target.charAt(j) != '-') found += 1 else gapsSoFar += 1
          j += 1
        }
        if (found == 3) {
          // attach trailing gaps to this codon
          while (j < n && target.charAt(j) == '-') { gapsSoFar += 1; j += 1 }
          val e = j
          val start = (s - gapsBeforeS) / 3
          val tcodon = target.substring(s, e).replace("-", "")
          val qcodon = query.substring(s, e).replace("-", "")
          val taa = Genetics.translate(tcodon)
          val qaa = Genetics.translate(qcodon)
          if (qaa.isEmpty)
            out += Variant(taa, "", start, Some(start + 1), Some(cds.symbol), Some(cds.locus))
          else if (qaa != taa) {
            val endPos = if (qaa.length == 1) None else Some(start + qaa.length)
            out += Variant(taa, qaa, start, endPos, Some(cds.symbol), Some(cds.locus))
          }
          i = e
        } else i = n
      }
    }
    out.result()
  }

  /** Format a single variation (reference: format_var, lib/sonardb.py:2903-2941):
    * SNP/insertion → `[SYM:]ref(pos+1)alt`; deletion → `[SYM:]del:(pos+1):len`.
    */
  def formatVar(ref: String, alt: String, start: Int, end: Option[Int],
      protein: Option[String]): String = {
    val prefix = protein.map(_ + ":").getOrElse("")
    if (alt.nonEmpty) s"$prefix$ref${start + 1}$alt"
    else s"${prefix}del:${start + 1}:${end.get - start}"
  }

  /** Build the space-joined variant profile, fusing runs of adjacent
    * single-residue deletions into `del:pos:len` (reference: build_profile,
    * lib/sonardb.py:2806-2901 — ported with its exact fusion/dedup behavior,
    * including the final-variant-only dedup).
    */
  def buildProfile(vars0: Seq[Variant]): String = {
    if (vars0.isEmpty) return ""
    val profile = scala.collection.mutable.ArrayBuffer.empty[String]
    if (vars0.size == 1) {
      val v = vars0.head
      val end = if (v.alt.isEmpty && v.end.isEmpty) Some(v.start + v.ref.length) else v.end
      val s = formatVar(v.ref, v.alt, v.start, end, v.protein)
      return s
    }
    val vars = vars0.sortBy(v => (v.locus.getOrElse(""), v.protein.getOrElse(""), v.start)).toArray
    var l = 0
    while (l < vars.length - 1) {
      val cur = vars(l)
      val nxt = vars(l + 1)
      if (cur.alt.nonEmpty) {
        profile += formatVar(cur.ref, cur.alt, cur.start, cur.end, cur.protein)
      } else if (nxt.alt.isEmpty && cur.start + cur.ref.length == nxt.start &&
          cur.protein == nxt.protein && cur.locus == nxt.locus) {
        // fuse into the next deletion
        vars(l + 1) = Variant(cur.ref + nxt.ref, "", cur.start, Some(nxt.start + 1),
          cur.protein, cur.locus)
      } else {
        val end = if (cur.end.isEmpty) Some(cur.start + cur.ref.length) else cur.end
        profile += formatVar(cur.ref, cur.alt, cur.start, end, cur.protein)
      }
      l += 1
    }
    val lastV = vars(vars.length - 1)
    val lastEnd =
      if (lastV.alt.isEmpty && lastV.end.isEmpty) Some(lastV.start + lastV.ref.length)
      else lastV.end
    val lastS = formatVar(lastV.ref, lastV.alt, lastV.start, lastEnd, lastV.protein)
    if (!profile.contains(lastS)) profile += lastS
    profile.mkString(" ")
  }

  private val delRe = "^del:([0-9]+):([0-9]+)$".r
  private val grepRe = "^([^0-9:]*)([0-9]+)([^0-9]*)$".r

  /** True iff a formatted dna variant shifts the reading frame of any CDS
    * (reference: is_frameshift, lib/sonardb.py:2945-2971).
    */
  def isFrameshift(dnaVar: String, cdsList: List[Cds]): Boolean = dnaVar match {
    case delRe(pos, len) =>
      val x = pos.toInt - 1
      val y = x + len.toInt
      cdsList.exists(_.isFrameshiftDel(x, y))
    case grepRe(_, pos, alt) =>
      val x = pos.toInt - 1
      val l = alt.length - 1
      l % 3 != 0 && cdsList.exists(_.isFrameshiftIns(x, l))
    case _ => false
  }

  /** dna_profile reduced to its frameshift variants (reference:
    * filter_frameshifts, lib/sonardb.py:2973-2990).
    */
  def filterFrameshifts(dnaProfile: String, cdsList: List[Cds]): String =
    if (dnaProfile.trim.isEmpty) ""
    else dnaProfile.split(" ").iterator.filter(_.nonEmpty)
      .filter(isFrameshift(_, cdsList)).mkString(" ")

  /** Full per-sequence processing: align against the reference, call dna+aa
    * variants, build the three profiles (reference: process_fasta,
    * lib/sonardb.py:2508-2580). This is the ingest hot path — one call per
    * *unique* sequence (dedup upstream by seqhash).
    */
  def processSequence(seq: String, ref: RefModel): ProcessedSeq = {
    val (aq, at) = Aligner.align(seq, ref.refSeq)
    val dnad = dnaVariants(aq, at)
    val aad = aaVariants(aq, at, ref.cds)
    val dnaProfile = buildProfile(dnad)
    val aaProfile = buildProfile(aad)
    val fsProfile = filterFrameshifts(dnaProfile, ref.cds)
    ProcessedSeq(dnad, aad, dnaProfile, aaProfile, fsProfile)
  }
}

final case class ProcessedSeq(
    dnaDiff: List[Variant],
    aaDiff: List[Variant],
    dnaProfile: String,
    aaProfile: String,
    fsProfile: String)

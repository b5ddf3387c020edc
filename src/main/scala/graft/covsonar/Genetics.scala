package graft.covsonar

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.Base64

/** Sequence-level primitives shared by ingest and query paths.
  *
  * Semantics follow the reference engine (rki-mf1/covsonar):
  *  - harmonize: /root/reference/lib/sonardb.py:2425-2441
  *  - SEGUID hash: lib/sonardb.py:2406-2423 (Biopython seguid = base64 of
  *    SHA-1 over the upper-case sequence, trailing '=' padding stripped)
  *  - IUPAC nucleotide/amino-acid code tables: lib/sonardb.py:2288-2368
  *  - ambiguity-aware translation (table 1): lib/sonardb.py:1222-1257
  *    (Biopython behavior: codon trimmed to a multiple of 3; an ambiguous
  *    codon translates to its unique amino acid if all expansions agree,
  *    otherwise 'X')
  */
object Genetics {

  /** Upper-case, trimmed, RNA→DNA (U→T). */
  def harmonize(seq: String): String = seq.trim.toUpperCase.replace('U', 'T')

  /** SEGUID: base64(SHA-1(seq)) without trailing '=' padding. */
  def seguid(seq: String): String = {
    val digest = MessageDigest.getInstance("SHA-1")
      .digest(seq.getBytes(StandardCharsets.US_ASCII))
    Base64.getEncoder.encodeToString(digest).replaceAll("=+$", "")
  }

  /** IUPAC nucleotide code → the set of codes it matches (each ambiguous
    * code includes itself, exactly as the reference table does — this is
    * the *query-expansion* table, not the base-expansion table).
    */
  val iupacNt: Map[Char, Set[Char]] = {
    val base = Map(
      'A' -> "A", 'C' -> "C", 'G' -> "G", 'T' -> "T",
      'R' -> "AGR", 'Y' -> "CTY", 'S' -> "GCS", 'W' -> "ATW",
      'K' -> "GTK", 'M' -> "ACM", 'B' -> "CGTB", 'D' -> "AGTD",
      'H' -> "ACTH", 'V' -> "ACGV").map { case (k, v) => k -> v.toSet }
    base + ('N' -> (base.keySet + 'N'))
  }

  val iupacNtExplicit: Set[Char] = iupacNt.collect { case (k, v) if v.size == 1 => k }.toSet

  /** IUPAC amino-acid code incl. the non-standard class codes the reference
    * supports (Φ Ω Ψ π ζ + −); X matches everything.
    */
  val iupacAa: Map[Char, Set[Char]] = {
    val singles = "ARNDCQEGHILKMFPSTWYVUO".map(c => c -> Set(c)).toMap
    val multi = Map(
      'B' -> "DNB", 'Z' -> "EQZ", 'J' -> "ILJ",
      'Φ' -> "VILFWYMΦ", 'Ω' -> "FWYHΩ", 'Ψ' -> "VILMΨ",
      'π' -> "PGASπ", 'ζ' -> "STHNQEDKRζ",
      '+' -> "KRH+", '-' -> "DE-").map { case (k, v) => k -> v.toSet }
    val base = singles ++ multi
    base + ('X' -> (base.keySet + 'X'))
  }

  val iupacAaExplicit: Set[Char] = iupacAa.collect { case (k, v) if v.size == 1 => k }.toSet

  /** Pure base expansion used for translation (no self-inclusion). */
  private val ntExpand: Map[Char, String] = Map(
    'A' -> "A", 'C' -> "C", 'G' -> "G", 'T' -> "T", 'U' -> "T",
    'R' -> "AG", 'Y' -> "CT", 'S' -> "GC", 'W' -> "AT", 'K' -> "GT",
    'M' -> "AC", 'B' -> "CGT", 'D' -> "AGT", 'H' -> "ACT", 'V' -> "ACG",
    'N' -> "ACGT")

  /** NCBI translation table 1, codon order indexed by (b1, b2, b3) over TCAG. */
  private val aaByCodon: Map[String, Char] = {
    val bases = "TCAG"
    val aas = "FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG"
    (for {
      (b1, i) <- bases.zipWithIndex
      (b2, j) <- bases.zipWithIndex
      (b3, k) <- bases.zipWithIndex
    } yield s"$b1$b2$b3" -> aas(i * 16 + j * 4 + k)).toMap
  }

  private def translateCodon(codon: String): Char = {
    aaByCodon.get(codon) match {
      case Some(aa) => aa
      case None =>
        // ambiguity-aware: unique translation or X
        val options = codon.map(c => ntExpand.getOrElse(c, ""))
        if (codon.length != 3 || options.exists(_.isEmpty)) 'X'
        else {
          val aas = for {
            a <- options(0); b <- options(1); c <- options(2)
          } yield aaByCodon(s"$a$b$c")
          if (aas.toSet.size == 1) aas.head else 'X'
        }
    }
  }

  /** Translate a nucleotide sequence with table 1; length clipped down to a
    * multiple of 3 (reference: lib/sonardb.py:1247-1257).
    */
  def translate(seq: String): String = {
    val l = seq.length - (seq.length % 3)
    val sb = new StringBuilder(l / 3)
    var i = 0
    while (i < l) { sb.append(translateCodon(seq.substring(i, i + 3))); i += 3 }
    sb.toString
  }

  /** Set of non-IUPAC characters in a sequence (lib/sonardb.py:2443-2458). */
  def invalidNtChars(seq: String): Set[Char] = seq.toSet.diff(iupacNt.keySet)

  private val complement: Map[Char, Char] = Map(
    'A' -> 'T', 'T' -> 'A', 'G' -> 'C', 'C' -> 'G', 'U' -> 'A',
    'R' -> 'Y', 'Y' -> 'R', 'S' -> 'S', 'W' -> 'W', 'K' -> 'M', 'M' -> 'K',
    'B' -> 'V', 'V' -> 'B', 'D' -> 'H', 'H' -> 'D', 'N' -> 'N')

  /** Reverse complement (IUPAC-aware; unknown chars pass through). */
  def reverseComplement(seq: String): String =
    seq.reverseIterator.map(c => complement.getOrElse(c, c)).mkString
}

package graft.covsonar

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

/** Golden tests ported from the reference engine's doctests
  * (rki-mf1/covsonar lib/sonardb.py — b117 fixture goldens at 1048-1084,
  * 1143-1174, 2528-2531; GFF coords at 676-679; translate at 1228-1231) and
  * from test/expected.csv (SEGUID of the reference genome itself).
  */
class CovsonarCoreSpec extends AnyFunSuite {

  private def resource(path: String): String = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing $path")
    try Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  private lazy val ref = Reference.sarsCov2
  private lazy val b117 = {
    val (_, _, raw) = Reference.parseFasta(resource("/covsonar/doctest_b117.fna")).head
    Genetics.harmonize(raw)
  }
  private lazy val processed = VariantCaller.processSequence(b117, ref)

  test("translate: ATGTGAAA -> M* (len clipped to codons)") {
    assert(Genetics.translate("ATGTGAAA") == "M*")
  }

  test("seguid of harmonized reference matches covsonar's stored seqhash") {
    assert(Genetics.seguid(ref.refSeq) == "TGmvT2vKTXx8/+dSNEdefxwTreY")
  }

  test("GFF3 CDS coords match the reference doctest") {
    val coords = ref.cds.map(c => c.symbol -> ((c.start, c.end))).toMap
    val expected = Map(
      "ORF1a" -> ((265, 13483)), "ORF1b" -> ((265, 21555)), "S" -> ((21562, 25384)),
      "ORF3a" -> ((25392, 26220)), "E" -> ((26244, 26472)), "M" -> ((26522, 27191)),
      "ORF6" -> ((27201, 27387)), "ORF7a" -> ((27393, 27759)), "ORF7b" -> ((27755, 27887)),
      "ORF8" -> ((27893, 28259)), "N" -> ((28273, 29533)), "ORF10" -> ((29557, 29674)))
    assert(coords == expected)
  }

  test("b117 dna variants match the reference doctest tuple list") {
    val expected = List(
      ("C", "T", 3266), ("C", "A", 5387), ("T", "C", 6953),
      ("T", "", 11287), ("C", "", 11288), ("T", "", 11289), ("G", "", 11290),
      ("G", "", 11291), ("T", "", 11292), ("T", "", 11293), ("T", "", 11294),
      ("T", "", 11295),
      ("T", "", 21764), ("A", "", 21765), ("C", "", 21766), ("A", "", 21767),
      ("T", "", 21768), ("G", "", 21769),
      ("T", "", 21990), ("T", "", 21991), ("A", "", 21992),
      ("A", "T", 23062), ("C", "A", 23270), ("C", "A", 23603), ("C", "T", 23708),
      ("T", "G", 24505), ("G", "C", 24913), ("C", "T", 27971), ("G", "T", 28047),
      ("A", "G", 28110), ("G", "C", 28279), ("A", "T", 28280), ("T", "A", 28281),
      ("C", "T", 28976))
    val got = processed.dnaDiff.map(v => (v.ref, v.alt, v.start))
    assert(got == expected)
  }

  test("b117 aa variants match the reference doctest tuple list") {
    val expected = Set(
      ("T", "I", 1000, "ORF1b"), ("A", "D", 1707, "ORF1b"), ("I", "T", 2229, "ORF1b"),
      ("S", "", 3674, "ORF1b"), ("G", "", 3675, "ORF1b"), ("F", "", 3676, "ORF1b"),
      ("T", "I", 1000, "ORF1a"), ("A", "D", 1707, "ORF1a"), ("I", "T", 2229, "ORF1a"),
      ("S", "", 3674, "ORF1a"), ("G", "", 3675, "ORF1a"), ("F", "", 3676, "ORF1a"),
      ("I", "", 67, "S"), ("H", "", 68, "S"), ("V", "", 69, "S"),
      ("V", "", 142, "S"), ("Y", "", 143, "S"),
      ("N", "Y", 500, "S"), ("A", "D", 569, "S"), ("P", "H", 680, "S"),
      ("T", "I", 715, "S"), ("S", "A", 981, "S"), ("D", "H", 1117, "S"),
      ("Q", "*", 26, "ORF8"), ("R", "I", 51, "ORF8"), ("Y", "C", 72, "ORF8"),
      ("D", "L", 2, "N"), ("S", "F", 234, "N"))
    val got = processed.aaDiff.map(v => (v.ref, v.alt, v.start, v.protein.get)).toSet
    assert(got == expected)
    assert(processed.aaDiff.size == 28)
  }

  test("b117 profiles match the reference doctest strings") {
    assert(processed.dnaProfile ==
      "C3267T C5388A T6954C del:11288:9 del:21765:6 del:21991:3 A23063T C23271A " +
      "C23604A C23709T T24506G G24914C C27972T G28048T A28111G G28280C A28281T " +
      "T28282A C28977T")
    assert(processed.aaProfile ==
      "ORF1a:T1001I ORF1a:A1708D ORF1a:I2230T ORF1a:del:3675:3 ORF1b:T1001I " +
      "ORF1b:A1708D ORF1b:I2230T ORF1b:del:3675:3 S:del:68:3 S:del:143:2 S:N501Y " +
      "S:A570D S:P681H S:T716I S:S982A S:D1118H ORF8:Q27* ORF8:R52I ORF8:Y73C " +
      "N:D3L N:S235F")
    assert(processed.fsProfile == "")
  }

  test("aligning the reference to itself yields no variants") {
    val p = VariantCaller.processSequence(ref.refSeq, ref)
    assert(p.dnaDiff.isEmpty && p.aaDiff.isEmpty && p.dnaProfile == "")
  }

  test("frameshift classification: CDS doctest truth table") {
    val cds = Cds("loc1", "prot1", List((10, 15), (25, 32)),
      List("ATGTG", "CTAATGA"), "+")
    assert(cds.isFrameshiftDel(11, 13))
    assert(cds.isFrameshiftDel(14, 16))
    assert(!cds.isFrameshiftDel(15, 17))
    assert(!cds.isFrameshiftDel(27, 30))
    val cds2 = Cds("loc1", "prot1", List((10, 15), (15, 16), (15, 20)),
      List("ATGTG", "G", "GATC"), "+")
    assert(!cds2.isFrameshiftDel(15, 16))
    assert(cds2.isFrameshiftDel(13, 16))
    val cds3 = Cds("loc1", "prot1", List((10, 16), (15, 21)),
      List("ATGTGC", "GATNTC"), "+")
    assert(!cds3.isFrameshiftIns(12, 3))
    assert(cds3.isFrameshiftIns(12, 7))
    assert(cds3.isFrameshiftIns(15, 4))
    assert(!cds3.isFrameshiftIns(15, 3))
  }
}

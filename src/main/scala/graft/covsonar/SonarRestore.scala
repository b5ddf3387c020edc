package graft.covsonar

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Genome reconstruction from stored variants (reference:
  * restore_genome_using_dnavars / restore_genome_using_dnaprofile,
  * lib/sonardb.py:3490-3617) — used both by the `restore` command (J6/A9)
  * and by the paranoid ingest validation (§2.9).
  */
object SonarRestore {

  /** Apply per-position dna variants to the reference sequence. Each variant
    * rewrites exactly one reference position (deletion → "", SNP → base,
    * insertion → anchor+insert); a start of -1 is a prefix insertion.
    * Mirrors lib/sonardb.py:3517-3549 including the ref-base consistency check.
    */
  def applyVariants(vars: Seq[Variant], refSeq: String): String = {
    var prefix = ""
    val edits = new java.util.HashMap[Int, String]()
    vars.foreach { v =>
      if (v.start == -1) prefix = v.alt
      else {
        require(v.ref.length != 1 || v.ref.charAt(0) == refSeq.charAt(v.start),
          s"data error: data inconsistency (${v.ref} expected at position " +
            s"${v.start + 1} of the reference sequence, got ${refSeq.charAt(v.start)})")
        edits.put(v.start, v.alt)
      }
    }
    render(prefix, edits, refSeq)
  }

  private val delRe = "^del:([0-9]+):([0-9]+)$".r
  private val grepRe = "^([^0-9:]*)([0-9]+)([^0-9]*)$".r

  /** Apply a formatted dna profile to the reference sequence
    * (lib/sonardb.py:3551-3617).
    */
  def applyProfile(dnaProfile: String, refSeq: String): String = {
    var prefix = ""
    val edits = new java.util.HashMap[Int, String]()
    dnaProfile.split(" ").iterator.filter(_.nonEmpty).foreach {
      case delRe(p, l) =>
        val s = p.toInt - 1
        (s until s + l.toInt).foreach(edits.put(_, ""))
      case v @ grepRe(ref, p, alt) =>
        val pos = p.toInt - 1
        require(pos == -1 || ref.isEmpty || ref.charAt(0) == refSeq.charAt(pos),
          s"data error: data inconsistency ($ref expected at position ${pos + 1})")
        if (pos == -1) prefix = alt else edits.put(pos, alt)
      case other => throw new IllegalArgumentException(s"invalid profile token: $other")
    }
    render(prefix, edits, refSeq)
  }

  private def render(prefix: String, edits: java.util.HashMap[Int, String], refSeq: String): String = {
    val sb = new StringBuilder(refSeq.length + prefix.length + 64)
    sb ++= prefix
    var i = 0
    while (i < refSeq.length) {
      val e = edits.get(i)
      if (e == null) sb += refSeq.charAt(i) else sb ++= e
      i += 1
    }
    sb.toString
  }

  /** Restore FASTA records for the given accessions as a DataFrame
    * (header, sequence). Distributed gather: dna_view filtered by accession,
    * variants collected per accession, edits applied against the broadcast
    * reference (SURVEY §2.3 J6 / §2.5 A9). Accessions without variant rows
    * restore to the reference sequence itself (lib/sonardb.py:3544-3549).
    */
  def restore(store: SonarStore, accessions: Seq[String]): DataFrame = {
    val spark = store.spark
    import spark.implicits._
    val refB = spark.sparkContext.broadcast(Reference.sarsCov2.refSeq)

    val rows = SonarOps.filterByList(store.dnaView, "accession", accessions)
      .groupBy(col("accession"))
      .agg(first(col("description")).as("description"),
        collect_list(when(col("start").isNotNull,
          struct(col("start"), col("end"), col("ref"), col("alt")))).as("vars"))

    rows.map { r =>
      val vars = r.getAs[scala.collection.Seq[Row]]("vars").toSeq.map { v =>
        Variant(v.getAs[String]("ref"), v.getAs[String]("alt"), v.getAs[Int]("start"),
          Option(v.getAs[Integer]("end")).map(_.intValue), None, None)
      }
      (">" + r.getAs[String]("description"), applyVariants(vars, refB.value))
    }.toDF("header", "sequence")
  }
}

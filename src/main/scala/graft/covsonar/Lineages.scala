package graft.covsonar

/** Pango-lineage alias handling + parent→sublineage closure building
  * (reference: lib/Lineages_UPDATER.py — SURVEY §2.7 F12 and §2.4 R5 input).
  *
  * The reference downloads pango-designation's lineages.csv/alias_key.json and
  * produces `lineage.all.tsv`; this port takes the same inputs from local
  * files (no egress) and produces the same lineage→comma-joined-sublineage
  * table the match engine's `--with-sublineage` expansion consumes.
  */
object Lineages {

  /** Alias compressor/uncompressor (reference: Aliasor,
    * lib/Lineages_UPDATER.py:27-76). `aliases` maps alias→full-prefix; list
    * or empty values alias to themselves (recombinant roots like XA).
    */
  final class Aliasor(aliases: Map[String, String]) {
    private val realias: Map[String, String] = aliases.map(_.swap)

    def uncompress(name: String): String = {
      if (name.isEmpty) return ""
      val parts = name.split("\\.")
      aliases.get(parts(0)) match {
        case None => name
        case Some(unaliased) =>
          if (parts.length == 1) name
          else unaliased + "." + parts.drop(1).mkString(".")
      }
    }

    def compress(name: String): String = {
      val parts = name.split("\\.")
      val levels = parts.length - 1
      val numIndirections = (levels - 1) / 3
      if (numIndirections <= 0) return name
      val alias = parts.take(3 * numIndirections + 1).mkString(".")
      val ending = parts.drop(3 * numIndirections + 1).mkString(".")
      realias.get(alias) match {
        case Some(a) => a + "." + ending
        case None => name
      }
    }
  }

  /** Parse alias_key.json (a flat map of string → string|list) with the
    * Jackson shipped inside Spark; list-valued and empty aliases map to
    * themselves (lib/Lineages_UPDATER.py:42-47).
    */
  def parseAliasKey(json: String): Map[String, String] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    val out = Map.newBuilder[String, String]
    root.properties().forEach { e =>
      val v = e.getValue
      if (v.isTextual && v.asText().nonEmpty) out += e.getKey -> v.asText()
      else out += e.getKey -> e.getKey
    }
    out.result()
  }

  /** Zero-padded numeric sort key (reference: lts, lib/Lineages_UPDATER.py:79-84). */
  def lts(lineage: String): String =
    lineage.split("\\.").map(p => ("0" * (5 - p.length)) + p).mkString

  /** Build the lineage → comma-joined sublineage closure ("none" for leaves),
    * sorted by lineage, exactly as `process_lineage` does
    * (lib/Lineages_UPDATER.py:105-164): B.1's sublineages are every lineage
    * whose uncompressed dotted path passes through B.1, in uncompressed sort
    * order, re-compressed for output.
    */
  def buildClosure(aliases: Map[String, String], lineages: Seq[String]): Seq[(String, String)] = {
    val aliasor = new Aliasor(aliases)
    val uncompressed = lineages.distinct.map(aliasor.uncompress).sortBy(lts)
    // every dotted prefix of every lineage, in that lineage's order — the
    // reference's inner double loop, precomputed once
    val prefixPaths: Seq[(String, Array[String])] = uncompressed.map { name =>
      val parts = name.split("\\.")
      name -> parts.indices.map(i => parts.take(i + 1).mkString(".")).toArray
    }
    uncompressed.map { lin =>
      val compressedSelf = aliasor.compress(lin)
      val subs = prefixPaths.collect {
        case (name, prefixes) if prefixes.contains(lin) => aliasor.compress(name)
      }.filterNot(_ == compressedSelf)
      compressedSelf -> (if (subs.nonEmpty) subs.mkString(",") else "none")
    }.filter(_._1.nonEmpty).sortBy(_._1)
  }

  /** Render the closure as lineage.all.tsv text (header included). */
  def toTsv(closure: Seq[(String, String)]): String =
    "lineage\tsublineage\n" + closure.map { case (l, s) => s"$l\t$s" }.mkString("\n") + "\n"
}

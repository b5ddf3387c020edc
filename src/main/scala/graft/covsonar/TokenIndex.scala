package graft.covsonar

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Inverted profile-token index: the data-skipping structure behind
  * interactive rare-variant `match` (ref: lib/sonardb.py:3133-3486 — the
  * reference's most common invocation, `match -i <variant>`, scans every
  * profile row in SQLite; at 10⁹ genomes that is a batch job, not a query).
  *
  * Layout (under `<store>/_token_index/`):
  *   - `tokens/`  parquet (token string, seqhash string), range-clustered and
  *     sorted by token, so a token-list lookup prunes files and row groups
  *     through ordinary parquet min/max stats — the index read is itself
  *     sublinear.
  *   - `META`     the profile table's listing signature at build time. Any
  *     later append/replace of `profile` changes the signature and the index
  *     silently degrades to the full-scan plan (exactly the reference's
  *     contract: `optimize` refreshes derived structures).
  *
  * Match-time use (see [[SonarMatch.matchGenomes]]): for include-profile
  * queries, resolve a *carrier superset* — a seqhash set that provably
  * contains every matching genome — from the index, and when it is small
  * (≤ `spark.graft.match.carrierCap`, default 10000), plan the match as
  *
  *   genome.filter(seqhash IN carriers) ⟕ profile.filter(seqhash IN carriers)
  *
  * instead of the full essence scan. The IN list is pushed to the parquet
  * scans (the store raises `spark.sql.parquet.pushdown.inFilterThreshold`
  * accordingly), where row-group seqhash bloom filters (written by
  * `optimize`), min/max stats and column-index page skipping drop granules
  * containing no carrier. Scanned bytes become O(carriers × granule size) —
  * flat in table size — and the essence join collapses to a broadcast of the
  * carrier slice.
  *
  * Exactness: the carrier set is a SUPERSET of matches by construction (no
  * bloom false-negative argument needed — the index is the exploded profile
  * content itself), and the original `array_contains` predicates still run
  * on top, so results are byte-identical to the unpruned plan. Verified by
  * TokenIndexSpec against the full-scan path on every golden shape.
  */
object TokenIndex {

  val DirName = "_token_index"
  private val MetaVersion = 1

  private def indexRoot(store: SonarStore) = new Path(new Path(store.dir), DirName)
  private def tokensPath(store: SonarStore) = new Path(indexRoot(store), "tokens")
  private def metaPath(store: SonarStore) = new Path(indexRoot(store), "META")

  /** `d:`/`a:` prefixes keep dna and aa token namespaces disjoint in one
    * index table (the aa token "S:N501Y" and a hypothetical dna token can
    * never collide).
    */
  private def prefixed(level: String, token: String): String = level + ":" + token

  // ---- build -----------------------------------------------------------------

  /** Build (or rebuild) the index from the CURRENT profile table. One
    * explode + one range-partitioned sort — shuffle volume is the exploded
    * token-pair count, the same order as a single profile scan. Called by
    * `SonarOps.optimize` after the table rewrites.
    */
  def build(store: SonarStore, nFiles: Int = 8): Unit = {
    if (!store.exists("profile")) { drop(store); return }
    val spark = store.spark
    // Signature BEFORE reading: if profile is rewritten mid-build the stored
    // signature won't match the new listing and the index self-invalidates.
    val sig = graft.Tables.listingSignature(spark, store.tableLocation("profile"))

    val empty = typedlit(Seq.empty[String])
    val toks = store.table("profile").select(
      col("seqhash"),
      explode(concat(
        transform(coalesce(col("dna_profile"), empty), t => concat(lit("d:"), t)),
        transform(coalesce(col("aa_profile"), empty), t => concat(lit("a:"), t))
      )).as("token"))

    val fs = indexRoot(store).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(indexRoot(store))
    val staging = new Path(indexRoot(store), s".staging-${java.util.UUID.randomUUID}")
    // range-cluster by token (seqhash as a secondary key splits hot tokens
    // across consecutive partitions without breaking token min/max pruning)
    toks.repartitionByRange(nFiles, col("token"), col("seqhash"))
      .sortWithinPartitions("token", "seqhash")
      .write
      .option("parquet.bloom.filter.enabled#token", "true")
      .mode("overwrite").parquet(staging.toString)

    val live = tokensPath(store)
    val trash = new Path(indexRoot(store), s".old-${java.util.UUID.randomUUID}")
    val hadLive = fs.exists(live)
    if (hadLive) require(fs.rename(live, trash), s"cannot move $live aside")
    if (!fs.rename(staging, live)) {
      if (hadLive) fs.rename(trash, live)
      throw new IllegalStateException(s"cannot activate token index (staging at $staging)")
    }
    if (hadLive) fs.delete(trash, true)

    val out = fs.create(metaPath(store), true)
    out.write(s"v=$MetaVersion\n$sig\n".getBytes("UTF-8"))
    out.close()
  }

  def drop(store: SonarStore): Unit = {
    val fs = indexRoot(store).getFileSystem(store.spark.sparkContext.hadoopConfiguration)
    fs.delete(indexRoot(store), true)
  }

  /** The signature stored at build time, if an index exists. */
  private def storedSignature(store: SonarStore): Option[String] = {
    val fs = metaPath(store).getFileSystem(store.spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(metaPath(store))) None
    else {
      val in = fs.open(metaPath(store))
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      lines match {
        case v :: sig :: _ if v == s"v=$MetaVersion" => Some(sig)
        case _ => None // unknown version: treat as absent, never mis-prune
      }
    }
  }

  /** Fresh ⇔ the stored signature matches the profile table's CURRENT
    * listing (file names, mtimes, lengths, footer lengths). Costs one
    * 8-byte ranged read per profile file — interactive-query overhead.
    */
  def isFresh(store: SonarStore): Boolean =
    storedSignature(store).exists { sig =>
      store.exists("profile") &&
        graft.Tables.listingSignature(store.spark, store.tableLocation("profile")) == sig
    }

  // ---- match-time carrier resolution ------------------------------------------

  /** A "cover" is a token list whose carrier union is a superset of one
    * group's matches; each group may offer several covers and we price them
    * against the index to pick the cheapest.
    *
    * Derivation mirrors [[SonarMatch]]'s predicate exactly: a group matches
    * rows satisfying dnaCond && aaCond, where each side is AND over its
    * tokens — or OR when any token ends in N (dna) / X (aa), the reference's
    * `search_all` mode (lib/sonardb.py:1623-1639). So:
    *   - an AND-mode side: ANY single token is a cover (matches carry all);
    *   - an OR-mode side: the whole token list is one cover (matches carry
    *     at least one).
    */
  private[covsonar] def coversFor(g: SonarMatch.ExplicitGroup): Seq[Seq[String]] = {
    val covers = Seq.newBuilder[Seq[String]]
    if (g.dna.nonEmpty) {
      val searchAll = g.dna.exists(t => t.nonEmpty && t.last == 'N')
      if (searchAll) covers += g.dna.map(prefixed("d", _))
      else g.dna.foreach(t => covers += Seq(prefixed("d", t)))
    }
    if (g.aa.nonEmpty) {
      val searchAll = g.aa.exists(t => t.nonEmpty && t.last == 'X')
      if (searchAll) covers += g.aa.map(prefixed("a", _))
      else g.aa.foreach(t => covers += Seq(prefixed("a", t)))
    }
    covers.result()
  }

  /** Resolve the carrier-seqhash superset for the include groups, or None
    * when pruning is unavailable (no/stale index, no effective groups, or
    * the carrier bound exceeds `cap` — at that selectivity the full scan is
    * the right plan anyway). Two index jobs, both token-range-pruned:
    * per-token counts to price covers, then the chosen tokens' carriers.
    */
  def carrierSuperset(store: SonarStore, groups: Seq[SonarMatch.ExplicitGroup],
      cap: Int): Option[Seq[String]] = {
    // Mirror profileGroupsCondition: token-less groups drop out of the OR;
    // if ALL groups are token-less there is no include condition to prune on.
    val effective = groups.map(coversFor).filter(_.nonEmpty)
    if (effective.isEmpty || !isFresh(store)) return None

    val spark = store.spark
    val idx = spark.read.parquet(tokensPath(store).toString)
    val allTokens = effective.flatten.flatten.distinct
    val counts: Map[String, Long] = idx
      .filter(col("token").isin(allTokens: _*))
      .groupBy("token").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // absent token → 0 carriers → its cover is free and prunes to nothing
    def cost(cover: Seq[String]): Long = cover.map(counts.getOrElse(_, 0L)).sum
    val chosen = effective.map(covers => covers.minBy(cost))
    // Σ of per-cover costs over-counts shared carriers — still a sound bound
    if (chosen.map(cost).sum > cap) return None

    val lookup = chosen.flatten.distinct
    val carriers = idx.filter(col("token").isin(lookup: _*))
      .select("seqhash").distinct()
      .collect().map(_.getString(0)).toSeq
    Some(carriers)
  }
}

package graft.covsonar

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The inverted token→seqhash index behind rare-variant match data skipping:
  * build/freshness lifecycle, carrier-superset derivation (AND / search_all
  * OR / mixed groups, cap fallback), exact-safety of the pruned plan against
  * the full-scan plan, and the physical pushdown (carrier IN list reaching
  * both parquet scans).
  */
class TokenIndexSpec extends SparkSpec {

  // 40 genomes; token t_i carried by a controlled subset so selectivities
  // are known: RARE in 3, MID in 12, COMMON in all, ABSENT in none.
  private val Rare = "A100T"
  private val Mid = "C241T"
  private val Common = "G3000A"
  private val Absent = "T9999G"
  private val RareAa = "S:N501Y"
  private val Del = "del:500:3"

  private def buildStore(): SonarStore = {
    val store = new SonarStore(spark, Files.createTempDirectory("tokidx").toString)
    val gSchema = SonarStore.schemas("genome")
    val gRows = (0 until 40).map { i =>
      Row(s"acc$i", "d", f"hash$i%03d", if (i % 2 == 0) "B.1.1.7" else "AY.4",
        "01778", "2021-01-05", null, null, null, "", "", s"L${i % 3}", "", "", "",
        "", "", "", Double.box(20.0 + i % 10), new java.sql.Timestamp(1700000000000L))
    }
    store.append("genome",
      spark.createDataFrame(spark.sparkContext.parallelize(gRows, 2), gSchema))
    val pSchema = SonarStore.schemas("profile")
    val pRows = (0 until 40).map { i =>
      val dna = Seq(Common) ++
        (if (i < 3) Seq(Rare) else Nil) ++
        (if (i % 3 == 0) Seq(Mid) else Nil) ++
        (if (i % 5 == 0) Seq(Del) else Nil)
      val aa = if (i >= 1 && i < 4) Seq(RareAa) else Nil
      Row(f"hash$i%03d", dna.sorted, aa, Seq.empty[String])
    }
    store.append("profile",
      spark.createDataFrame(spark.sparkContext.parallelize(pRows, 2), pSchema))
    store
  }

  private def accs(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select("accession").collect().map(_.getString(0)).toSet

  private def withIndexOff[T](body: => T): T = {
    spark.conf.set("spark.graft.match.tokenIndex", "false")
    try body finally spark.conf.unset("spark.graft.match.tokenIndex")
  }

  test("build → fresh; profile append → stale; rebuild → fresh again") {
    val store = buildStore()
    assert(!TokenIndex.isFresh(store), "no index built yet")
    SonarOps.optimize(store, maxFilesPerTable = 4)
    assert(TokenIndex.isFresh(store))
    // any profile mutation invalidates
    store.append("profile", store.table("profile").limit(0))
    assert(!TokenIndex.isFresh(store))
    TokenIndex.build(store, 4)
    assert(TokenIndex.isFresh(store))
  }

  test("carrier superset: AND group resolves via its rarest token") {
    val store = buildStore()
    SonarOps.optimize(store, 4)
    val groups = SonarMatch.fixXNSearch(Seq(Seq(Rare, Common))).map(SonarMatch.makeExplicit)
    val carriers = TokenIndex.carrierSuperset(store, groups, cap = 10000).get
    // the AND of (3-carrier, 40-carrier) tokens must be priced through the
    // rare one — exactly its 3 carriers, not all 40
    assert(carriers.toSet == Set("hash000", "hash001", "hash002"))
  }

  test("carrier superset: OR groups union; absent tokens cost nothing") {
    val store = buildStore()
    SonarOps.optimize(store, 4)
    val groups = SonarMatch.fixXNSearch(Seq(Seq(Rare), Seq(Absent)))
      .map(SonarMatch.makeExplicit)
    val carriers = TokenIndex.carrierSuperset(store, groups, cap = 10000).get
    assert(carriers.toSet == Set("hash000", "hash001", "hash002"))
  }

  test("cap exceeded / stale index / exclude-only → no pruning, same results") {
    val store = buildStore()
    SonarOps.optimize(store, 4)
    val groups = SonarMatch.fixXNSearch(Seq(Seq(Common))).map(SonarMatch.makeExplicit)
    assert(TokenIndex.carrierSuperset(store, groups, cap = 10).isEmpty,
      "40 carriers must exceed a cap of 10")
    // exclude-only queries have no include groups to prune on
    val exOnly = MatchArgs(excludeProfiles = Seq(Seq(Rare)))
    assert(accs(SonarMatch.matchGenomes(store, exOnly)) ==
      withIndexOff(accs(SonarMatch.matchGenomes(store, exOnly))))
    // stale: append then match — must fall back, not mis-prune
    store.append("profile", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("hashXYZ", Seq(Rare), Seq.empty[String], Seq.empty[String]))),
      SonarStore.schemas("profile")))
    store.append("genome", store.table("genome").limit(1)
      .withColumn("accession", lit("accXYZ")).withColumn("seqhash", lit("hashXYZ")))
    val args = MatchArgs(profiles = Seq(Seq(Rare)))
    val got = accs(SonarMatch.matchGenomes(store, args))
    assert(got.contains("accXYZ"), s"stale index must not hide new rows: $got")
    assert(got == withIndexOff(accs(SonarMatch.matchGenomes(store, args))))
  }

  test("pruned results are byte-identical to full-scan across golden shapes") {
    val store = buildStore()
    SonarOps.optimize(store, 4)
    val shapes = Seq(
      MatchArgs(profiles = Seq(Seq(Rare))),
      MatchArgs(profiles = Seq(Seq(RareAa))),
      MatchArgs(profiles = Seq(Seq(Rare, RareAa))), // dna+aa AND across levels
      MatchArgs(profiles = Seq(Seq(Mid), Seq(Rare))), // OR groups
      MatchArgs(profiles = Seq(Seq(Del))),
      MatchArgs(profiles = Seq(Seq(Absent))), // empty carrier set → 0 rows
      MatchArgs(profiles = Seq(Seq(Rare)), excludeProfiles = Seq(Seq(Mid))),
      MatchArgs(profiles = Seq(Seq(Rare)), lineages = Seq("B.1.1.7"),
        minCt = Some(20.0)),
      // trailing-N dna token: search_all OR-mode + ambiguity expansion
      MatchArgs(profiles = Seq(Seq("A100N"))),
      // trailing-X aa token
      MatchArgs(profiles = Seq(Seq("S:N501X"))))
    shapes.foreach { args =>
      val pruned = SonarMatch.matchGenomes(store, args)
        .collect().map(_.toString).sorted.toSeq
      val full = withIndexOff(
        SonarMatch.matchGenomes(store, args).collect().map(_.toString).sorted.toSeq)
      assert(pruned == full, s"pruned≠full for $args")
    }
    assert(accs(SonarMatch.matchGenomes(store, MatchArgs(profiles = Seq(Seq(Absent))))).isEmpty)
  }

  test("over-pushdown-cap carrier sets take the broadcast semi-join branch, same rows") {
    val store = buildStore()
    SonarOps.optimize(store, 4)
    // 600 carriers (> CarrierPushdownCap=512): 40 real + fakes — the
    // semi-join plan must agree with the plain filtered essence
    val hashes = (0 until 40).map(i => f"hash$i%03d") ++ (0 until 560).map(i => s"nope$i")
    val semi = store.essenceForSeqhashes(hashes)
    val plan = semi.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.toLowerCase.contains("leftsemi"),
      s"expected broadcast semi join for ${hashes.size} carriers:\n$plan")
    val expect = store.essence.filter(col("seqhash").isInCollection(hashes))
      .collect().map(_.toString).sorted.toSeq
    assert(semi.collect().map(_.toString).sorted.toSeq == expect)
  }

  test("carrier IN list is pushed into both parquet scans") {
    val store = buildStore()
    SonarOps.optimize(store, 4)
    val plan = SonarMatch.matchGenomes(store, MatchArgs(profiles = Seq(Seq(Rare))))
      .queryExecution.executedPlan.toString
    val scansWithIn = plan.linesIterator
      .filter(_.contains("PushedFilters"))
      .count(_.contains("In(seqhash"))
    assert(scansWithIn >= 2, s"expected carrier IN pushed to genome AND profile scans:\n$plan")
  }

  test("property fuzz: carrier superset ⊇ true matching seqhashes for random groups") {
    // the load-bearing invariant: for ANY include-group structure (AND
    // groups, N/X search_all flips, ambiguity expansions, absent tokens),
    // the derived carrier set must contain every seqhash whose profile
    // satisfies the group condition — a miss here silently drops matches
    val store = buildStore()
    SonarOps.optimize(store, 4)
    val rnd = new scala.util.Random(20260816L)
    val tokenPool = Vector(Rare, Mid, Common, Absent, RareAa, Del, "A100N", "S:N501X", "C241T")
    val profByHash: Map[String, (Set[String], Set[String])] =
      store.table("profile").collect().map { r =>
        r.getString(0) -> ((r.getSeq[String](1).toSet, r.getSeq[String](2).toSet))
      }.toMap
    (1 to 60).foreach { trial =>
      val groups0 = Seq.fill(1 + rnd.nextInt(3))(
        Seq.fill(1 + rnd.nextInt(3))(tokenPool(rnd.nextInt(tokenPool.size))).distinct)
      val explicit = SonarMatch.fixXNSearch(groups0).map(SonarMatch.makeExplicit)
      TokenIndex.carrierSuperset(store, explicit, cap = 10000).foreach { carriers =>
        // reference evaluation of the include condition per profile row
        def sideOk(have: Set[String], want: Seq[String], searchAllMark: Char): Boolean =
          if (want.isEmpty) true
          else if (want.exists(t => t.nonEmpty && t.last == searchAllMark))
            want.exists(have.contains)
          else want.forall(have.contains)
        val trueMatches = profByHash.collect {
          case (h, (dna, aa)) if explicit.exists(g =>
            (g.dna.nonEmpty || g.aa.nonEmpty) &&
              sideOk(dna, g.dna, 'N') && sideOk(aa, g.aa, 'X')) => h
        }.toSet
        val missed = trueMatches -- carriers.toSet
        assert(missed.isEmpty,
          s"trial $trial: carrier superset missed $missed for $groups0")
      }
    }
  }

  test("fuzz battery stays reference-exact on an optimized (indexed) store") {
    // reuse the golden shapes over a store whose tables went through the
    // clustered rewrite + bloom options — guards the physical layout path
    val store = buildStore()
    SonarOps.optimize(store, 3, rowGroupBytes = Some(1L << 20))
    val args = MatchArgs(profiles = Seq(Seq(Rare, Common), Seq(Mid)),
      lineages = Seq("B.1.1.7", "^AY.4"))
    assert(accs(SonarMatch.matchGenomes(store, args)) ==
      withIndexOff(accs(SonarMatch.matchGenomes(store, args))))
  }
}

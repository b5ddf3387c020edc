package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RelationalQueriesSpec extends SparkSpec {

  test("every registered query runs at sf0.001 and has an oracle or is rows-only") {
    RelationalQueries.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      // All relational queries are oracle-backed.
      assert(RelationalQueries.oracles.contains(name), s"$name lacks an oracle")
      // Every registered relational query matches rows at sf0.001 — an empty
      // result here means a predicate or join key regressed.
      assert(fn(spark, sf).count() > 0, s"$name returned no rows at sf0.001")
    }
  }

  test("the driver's flagship entry point returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("q1 aggregates are internally consistent") {
    val rows = RelationalQueries.q1PricingSummary(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sumQty = r.getAs[Double]("sum_qty")
      val avgQty = r.getAs[Double]("avg_qty")
      val n = r.getAs[Long]("count_order")
      assert(math.abs(sumQty / n - avgQty) < 1e-6)
      assert(r.getAs[Double]("sum_disc_price") <= r.getAs[Double]("sum_base_price"))
      assert(r.getAs[Double]("sum_charge") >= r.getAs[Double]("sum_disc_price"))
    }
  }

  test("q3 returns at most 10 rows ordered by revenue desc") {
    val rows = RelationalQueries.q3TopOrders(spark, sf).collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sortBy(-_)))
  }

  test("j8 bloom pruning is semantically invisible: matches the unpruned join") {
    val pruned = RelationalQueries.j8BloomSemi(spark, sf).collect()
    val urgent = graft.Tables.t(spark, sf, "orders")
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val plain = graft.Tables.t(spark, sf, "lineitem")
      .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(18,8)")).cast("double").as("revenue"))
      .orderBy("l_returnflag").collect()
    assert(pruned.map(_.toSeq).toSeq == plain.map(_.toSeq).toSeq)
  }

  test("j9 as-of join matches a brute-force per-purchase scan") {
    val ev = graft.Tables.t(spark, sf, "events")
      .select("user_id", "event_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3).getTime * 1000 + r.getTimestamp(3).getNanos / 1000 % 1000))
    val errorsByUser = ev.filter(_._3 == "error")
      .groupBy(_._1).view.mapValues(_.map(e => (e._4, e._2))).toMap
    val expected = ev.filter(_._3 == "purchase").map { case (u, pid, _, pus) =>
      // most recent error at-or-before the purchase in (micros, id) order
      val prior = errorsByUser.getOrElse(u, Array.empty)
        .filter { case (eus, eid) => eus < pus || (eus == pus && eid < pid) }
      val best = if (prior.isEmpty) None else Some(prior.max)
      (u, pid, best.map(_._2), best.map(b => pus - b._1))
    }.sortBy(t => (t._1, t._2)).toSeq
    val got = RelationalQueries.j9AsofJoin(spark, sf).collect().map { r =>
      (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]))
    }.toSeq
    assert(got == expected)
  }

  test("j10 bucketed range join matches a brute-force pair scan") {
    val band = 3600L * 1000000L
    val ev = graft.Tables.t(spark, sf, "events")
      .select("user_id", "event_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3).getTime * 1000 + r.getTimestamp(3).getNanos / 1000 % 1000))
    val expected = (for {
      (u, pid, "purchase", pus) <- ev
      (eu, eid, "error", eus) <- ev
      if eu == u && math.abs(eus - pus) <= band
    } yield (u, pid, eid, eus - pus)).sortBy(t => (t._1, t._2, t._3)).toSeq
    val got = RelationalQueries.j10RangeJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(expected.nonEmpty && got == expected)
  }

  test("a9 quartiles are exact quarter-values and ordered within each group") {
    val rows = RelationalQueries.a9Quartiles(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val Seq(q25, q50, q75) =
        Seq("q25", "q50", "q75").map(r.getAs[Double])
      assert(q25 <= q50 && q50 <= q75)
      // integer-valued input + k/4 fractions ⇒ every quartile is a multiple
      // of 0.25, exactly representable (the oracle-safety argument)
      Seq(q25, q50, q75).foreach(q => assert(q * 4 == math.rint(q * 4)))
    }
  }

  test("a11 rollup levels are internally consistent") {
    val rows = RelationalQueries.a11Rollup(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val leaves = rows.filter(_._3 == 0)
    val flags = rows.filter(_._3 == 1)
    val grand = rows.filter(_._3 == 3)
    assert(grand.length == 1)
    assert(grand.head._4 == leaves.map(_._4).sum)
    flags.foreach { case (f, s, _, n) =>
      assert(s == "ALL")
      assert(n == leaves.filter(_._1 == f).map(_._4).sum)
    }
  }

  test("a10 heavy hitters: ranks 1..3 with non-increasing counts per group") {
    val rows = RelationalQueries.a10TopkHeavy(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to sorted.length))
      assert(sorted.length <= 3)
      val counts = sorted.map(_.getAs[Long]("n_events"))
      assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    }
  }

  test("a10's bounded aggregator matches the window row_number formulation") {
    import org.apache.spark.sql.expressions.Window
    val counts = graft.Tables.t(spark, sf, "events")
      .groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy("event_type")
      .orderBy(col("n_events").desc, col("user_id").asc)
    val viaWindow = counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .orderBy("event_type", "rank")
      .collect().map(_.toSeq).toSeq
    val viaAgg = RelationalQueries.a10TopkHeavy(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(viaAgg == viaWindow)
  }

  test("p6 token membership honors include-AND / OR-group / exclude semantics") {
    import spark.implicits._
    val got = RelationalQueries.p6TokenMembership(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    val docs = graft.Tables.t(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toSet))
    val expect = docs.collect {
      case (id, tk) if ((tk("spark") && tk("join")) || tk("stream")) && !tk("slow") => id
    }.toSet
    assert(got == expect)
  }

  test("w1 keeps at most 3 rows per customer, numbered from 1") {
    val rows = RelationalQueries.w1RowNumber(spark, sf).collect()
    val byCust = rows.groupBy(_.getAs[Long]("o_custkey"))
    byCust.values.foreach { rs =>
      assert(rs.length <= 3)
      assert(rs.map(_.getAs[Int]("rn")).sorted.sameElements(1 to rs.length))
    }
  }

  test("k8 snapshot diff matches a driver-side snapshot compare") {
    val orders = graft.Tables.t(spark, sf, "orders")
      .select("o_orderkey", "o_orderstatus").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val vOld = orders.collect { case (k, st) if k % 7 != 0 => k -> st }.toMap
    val vNew = orders.collect { case (k, st) if k % 5 != 0 =>
      k -> (if (k % 3 == 0) "X" else st)
    }.toMap
    val expected = (vOld.keySet ++ vNew.keySet).toSeq.sorted.flatMap { k =>
      (vOld.get(k), vNew.get(k)) match {
        case (None, Some(n))                => Some((k, "I", None, Some(n)))
        case (Some(o), None)                => Some((k, "D", Some(o), None))
        case (Some(o), Some(n)) if o != n   => Some((k, "U", Some(o), Some(n)))
        case _                              => None
      }
    }
    val got = RelationalQueries.k8SnapshotDiff(spark, sf).collect().map { r =>
      def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getString(i))
      (r.getLong(0), r.getString(1), opt(2), opt(3))
    }.toSeq
    assert(got == expected)
    val ops = got.map(_._2).toSet
    assert(ops == Set("I", "D", "U"), s"fixture misses an op class: $ops")
  }

  test("k9 SCD2 intervals are contiguous, change-only, with one open row per user") {
    val rows = RelationalQueries.k9Scd2(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("state"),
        r.getAs[Long]("valid_from_us"),
        if (r.isNullAt(3)) None else Some(r.getAs[Long]("valid_to_us"))))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { hist =>
      val h = hist.sortBy(_._3)
      // contiguous: each interval closes exactly where the next opens
      h.sliding(2).foreach {
        case Array((_, s1, _, to1), (_, s2, from2, _)) =>
          assert(to1.contains(from2), "gap or overlap in history")
          assert(s1 != s2, "non-change row survived collapse")
        case _ =>
      }
      assert(h.init.forall(_._4.isDefined) && h.last._4.isEmpty,
        "exactly the last row must be open-ended")
    }
  }

  test("k10b batch bucketed MERGE rewrites only touched buckets; untouched seed files stay byte-identical") {
    def walkFiles(root: String): Map[String, (Long, java.nio.file.attribute.FileTime)] = {
      val p = java.nio.file.Paths.get(root)
      if (!java.nio.file.Files.isDirectory(p)) return Map.empty
      val walk = java.nio.file.Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
          .map(f => f.toString ->
            ((java.nio.file.Files.size(f), java.nio.file.Files.getLastModifiedTime(f))))
          .toMap
      } finally walk.close()
    }
    val out1 = RelationalQueries.k10bBucketedMerge(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    // the sparse mod-292 log touches at most lcm(292,64)/292 = 16 buckets
    // (exactly 16 once the key range covers all residue classes); compute
    // the expectation from the data rather than assuming the range
    val logRows = RelationalQueries.k8SnapshotDiff(spark, sf)
      .filter(org.apache.spark.sql.functions.col("o_orderkey") % 292 === 0)
      .selectExpr("pmod(o_orderkey, 64) AS bkt", "op").collect()
    val expectedTouched = logRows.map(_.getLong(0)).toSet
    // the log must exercise the MERGE, not just deletes: 292 is coprime to
    // the snapshot rules' 5 and 7, so I/U ops appear alongside D
    assert(logRows.map(_.getString(1)).toSet.intersect(Set("I", "U")).nonEmpty,
      s"log is all-deletes: ${logRows.map(_.getString(1)).toSet}")
    val rewritten = out1.filter(_._2 == 1).map(_._1)
    assert(expectedTouched.nonEmpty && expectedTouched.size <= 16,
      s"log bucket math broke: $expectedTouched")
    assert(rewritten.toSet == expectedTouched && out1.size > rewritten.size,
      s"rewritten $rewritten != log-touched $expectedTouched (of ${out1.size})")
    // state layout is target/k10b-state/<dataset-hash>/<vintage-sig>:
    // resolve THIS dataset's one vintage dir (other datasets' state may
    // coexist — that isolation is the point of the layout)
    val dsHash = java.security.MessageDigest.getInstance("MD5")
      .digest(new java.io.File(sf).getAbsolutePath.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val stateDir = {
      val l = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"target/k10b-state/$dsHash"))
      try {
        import scala.jdk.CollectionConverters._
        l.iterator().asScala.toSeq.head.toString
      } finally l.close()
    }
    // merged layout holds exactly the touched buckets
    val mergedBkts = {
      val l = java.nio.file.Files.list(java.nio.file.Paths.get(s"$stateDir/merged"))
      try {
        import scala.jdk.CollectionConverters._
        l.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("bkt=")).map(_.stripPrefix("bkt=").toLong).toSeq.sorted
      } finally l.close()
    }
    assert(mergedBkts == rewritten.sorted,
      s"merged dir buckets $mergedBkts != reported rewrites $rewritten")
    // a second run is idempotent AND never touches the seed
    val seedBefore = walkFiles(s"$stateDir/seed")
    assert(seedBefore.nonEmpty)
    val out2 = RelationalQueries.k10bBucketedMerge(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out2 == out1, "re-run diverged")
    assert(walkFiles(s"$stateDir/seed") == seedBefore,
      "a merge run rewrote untouched seed files")
  }

  test("k10b state is scoped per dataset: alternating sfDirs neither GC each other's seed nor invalidate earlier results") {
    def dsHash(dir: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(new java.io.File(dir).getAbsolutePath.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    def seedFiles(dir: String): Set[String] = {
      val root = java.nio.file.Paths.get(s"target/k10b-state/${dsHash(dir)}")
      if (!java.nio.file.Files.isDirectory(root)) return Set.empty
      val walk = java.nio.file.Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
          .filter(_.toString.contains("/seed/")) // merged/ legitimately rewrites per run
          .map(f => f.toString + "#" +
            java.nio.file.Files.getLastModifiedTime(f).toMillis).toSet
      } finally walk.close()
    }
    val sfB = "/root/testdata/sf0.01"
    // run A, hold its RESULT frame lazy-shaped (collect later)
    val resA = RelationalQueries.k10bBucketedMerge(spark, sf)
    val stateA = seedFiles(sf)
    assert(stateA.nonEmpty, "dataset A left no state")
    // run B on another dataset — the harness-alternation pattern
    val resB = RelationalQueries.k10bBucketedMerge(spark, sfB).collect()
    assert(resB.nonEmpty)
    // A's state survived B byte-for-byte (no cross-dataset GC, no re-seed)
    assert(seedFiles(sf) == stateA,
      "running dataset B GC'd or re-seeded dataset A's state")
    // and A's earlier result frame still collects — eagerly materialized,
    // independent of any files a later call might have deleted
    assert(resA.collect().nonEmpty)
    // run A again: vintage unchanged → same seed files (no re-seed churn)
    RelationalQueries.k10bBucketedMerge(spark, sf).collect()
    assert(seedFiles(sf) == stateA, "alternating datasets forced a re-seed")
  }

  test("k10 changelog apply lands exactly on the target snapshot") {
    // the query's own contract: applied counts equal target counts per status
    val rows = RelationalQueries.k10ChangelogApply(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r =>
      assert(r.getAs[Long]("n_applied") == r.getAs[Long]("n_target"),
        s"apply diverged for status ${r.getString(0)}"))
    // independent driver-side replay: applying k8's changelog to the old
    // snapshot must reproduce the new snapshot row-for-row, not just by count
    val orders = graft.Tables.t(spark, sf, "orders")
      .select("o_orderkey", "o_orderstatus").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val vOld = orders.collect { case (k, st) if k % 7 != 0 => k -> st }.toMap
    val vNew = orders.collect { case (k, st) if k % 5 != 0 =>
      k -> (if (k % 3 == 0) "X" else st)
    }.toMap
    val log = RelationalQueries.k8SnapshotDiff(spark, sf).collect().map { r =>
      (r.getLong(0), r.getString(1), if (r.isNullAt(3)) None else Some(r.getString(3)))
    }
    val applied = log.foldLeft(vOld) {
      case (acc, (k, "D", _)) => acc - k
      case (acc, (k, _, Some(n))) => acc + (k -> n) // I and U both upsert
      case (acc, _) => acc
    }
    assert(applied == vNew)
  }

  test("j11 interval lookup classifies every in-range event exactly once") {
    val rows = RelationalQueries.j11IntervalLookup(spark, sf).collect()
    assert(rows.nonEmpty)
    val classified = rows.map(_.getAs[Long]("n_events")).sum
    val inRange = graft.Tables.t(spark, sf, "events")
      .filter(col("value") >= 0.0 && col("value") < 1000.0).count()
    assert(classified == inRange, "bands must partition the value domain")
    // the fact side must not shuffle: a constant dim resolves as a
    // broadcast nested-loop join, never an exchange on the event stream
    val plan = RelationalQueries.j11IntervalLookup(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"))
  }

  test("a13 grouping sets: each slice independently totals the fact table") {
    val rows = RelationalQueries.a13GroupingSets(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._3).toSet == Set(1L, 2L), "exactly the two declared slices")
    val total = graft.Tables.t(spark, sf, "lineitem").count()
    val byFlag = rows.filter(_._3 == 1) // (l_returnflag) slice: status rolled up
    val byStatus = rows.filter(_._3 == 2) // (l_linestatus) slice: flag rolled up
    assert(byFlag.forall(_._2 == "ALL") && byStatus.forall(_._1 == "ALL"))
    assert(byFlag.map(_._4).sum == total && byStatus.map(_._4).sum == total)
  }

  test("w7 hourly top-k: ranks dense from 1, counts non-increasing per bucket") {
    val rows = RelationalQueries.w7HourlyTopk(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("bucket")).values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.length <= 3)
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to sorted.length))
      val counts = sorted.map(_.getAs[Long]("n"))
      assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    }
  }

  test("queries and oracleSql keys line up in SparkEntry") {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle-only keys: ${o.diff(q)}")
  }

  test("k12 z-order buckets match brute force and bound BOTH dimensions' extents") {
    // sf0.01: key ranges span several 512x512 tiles, so the bucket split
    // and the extent bound are both exercised (sf0.001 fits one tile)
    val dir001 = "/root/testdata/sf0.01"
    val rows = spark.read.parquet(s"$dir001/lineitem.parquet")
      .select("l_partkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def z(a: Long, b: Long): Long =
      (0 until 31).map(i => (((a >> i) & 1L) << (2 * i)) + (((b >> i) & 1L) << (2 * i + 1))).sum
    val expected = rows.map { case (p, sKey) => (z(p, sKey) / 262144L, p, sKey, z(p, sKey)) }
      .groupBy(_._1).toSeq.map { case (bk, grp) =>
        (bk, grp.length.toLong, grp.map(_._2).min, grp.map(_._2).max,
          grp.map(_._3).min, grp.map(_._3).max, grp.map(_._4).min, grp.map(_._4).max)
      }.sortBy(_._1)
    val got = RelationalQueries.k12ZorderLayout(spark, dir001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == expected)
    // an aligned 2^18 z-range is a 512 x 512 tile: BOTH dimensions'
    // extents are bounded inside every bucket — the property min/max
    // zone maps prune on, and the reason z-order beats a lexicographic
    // (a, b) sort (which bounds only `a`)
    assert(got.size > 1, s"only ${got.size} z-buckets — tile split unexercised")
    got.foreach { case (bk, _, pMin, pMax, sMin, sMax, _, _) =>
      assert(pMax - pMin < 512, s"bucket $bk part extent ${pMax - pMin} breaks the tile bound")
      assert(sMax - sMin < 512, s"bucket $bk supp extent ${sMax - sMin} breaks the tile bound")
    }
  }

  test("k14 as-of read matches brute force at every version; vmax equals k13's live set") {
    val inv = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("lang", "source")
      .agg(org.apache.spark.sql.functions.sum("n_chars").as("bytes"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_docs"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    def md5v(s0: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % 8
    }
    val log = inv.map { case (lang, src, bytes, nDocs) =>
      val addV = md5v(src)
      val remV = if (nDocs % 3 != 0) Some(addV + 1 + bytes % 4) else None
      (lang, src, bytes, addV, remV)
    }
    val vmax = log.map { case (_, _, _, a, r) => r.getOrElse(a) }.max
    def bruteAt(v: Long) = log
      .filter { case (_, _, _, a, r) => a <= v && r.forall(_ > v) }
      .sortBy(t => (t._1, t._2)).toSeq
    def runAt(v: Long) = RelationalQueries.k14TimeTravel(spark, sf, v).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
    (0L to vmax).foreach { v =>
      assert(runAt(v) == bruteAt(v), s"as-of read diverged at version $v")
    }
    // history is non-trivial: the snapshot actually changes across versions
    assert((0L to vmax).map(bruteAt(_).map(_._2).toSet).distinct.size > 1)
    // the registered entry is the mid-history read
    val reg = RelationalQueries.k14TimeTravel(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
    assert(reg == bruteAt(vmax / 2))
    // at vmax the as-of read is exactly k13's 'live' class
    val live = RelationalQueries.k13VacuumPlan(spark, sf).collect()
      .filter(_.getString(5) == "live")
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(runAt(vmax).map(t => (t._1, t._2)).toSet == live)
  }

  test("k15 zone-map pruning is lossless on real data and under a clustered layout") {
    import org.apache.spark.sql.functions.{col, expr}
    // Band = the planner's middle third, replayed independently.
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "n_chars")
    val rows = docs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val (gmin, gmax) = (rows.map(_._2).min, rows.map(_._2).max)
    val lo = gmin + (gmax - gmin) / 3
    val hi = gmin + 2 * ((gmax - gmin) / 3)
    val naive = rows.filter { case (_, nc) => nc >= lo && nc <= hi }.map(_._1).sorted.toSeq
    val pruned = RelationalQueries.zoneMapPrunedScan(docs, lo, hi, 64L)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(pruned == naive, "pruned scan diverged from the naive filter")
    // Planner decisions replay: a 'skip' file must hold no in-band row.
    val skips = RelationalQueries.k15ZoneMapPlan(spark, sf).collect()
      .filter(_.getAs[String]("decision") == "skip").map(_.getAs[Long]("file_id")).toSet
    val byFile = rows.groupBy(_._1 / 64)
    assert(skips.forall(f => byFile(f).forall { case (_, nc) => nc < lo || nc > hi }),
      "a skipped file contains an in-band row — pruning would lose data")
    // Clustered layout (doc_id reassigned in n_chars order — the post-k12
    // shape): pruning must actually bite AND stay lossless.
    val clustered = docs.orderBy("n_chars", "doc_id")
      .withColumn("doc_id", expr(
        "row_number() over (order by n_chars, doc_id) - 1").cast("long"))
    val cRows = clustered.collect().map(r => (r.getLong(0), r.getLong(1)))
    val cNaive = cRows.filter { case (_, nc) => nc >= lo && nc <= hi }.map(_._1).sorted.toSeq
    val cPruned = RelationalQueries.zoneMapPrunedScan(clustered, lo, hi, 64L)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(cPruned == cNaive)
    val cSkipped = cRows.groupBy(_._1 / 64).count { case (_, fr) =>
      fr.forall { case (_, nc) => nc < lo || nc > hi } }
    assert(cSkipped > 0, "clustered layout should produce at least one skippable file")
  }

  test("k13 vacuum plan matches brute force; deletable set shrinks as retention rises") {
    val inv = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("lang", "source")
      .agg(org.apache.spark.sql.functions.sum("n_chars").as("bytes"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_docs"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    def md5v(s0: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % 8
    }
    val log = inv.map { case (lang, src, bytes, nDocs) =>
      val addV = md5v(src)
      val remV = if (nDocs % 3 != 0) Some(addV + 1 + bytes % 4) else None
      (lang, src, bytes, addV, remV)
    }
    val vmax = log.map { case (_, _, _, a, r) => r.getOrElse(a) }.max
    def classify(retain: Long) = log.map { case (lang, src, bytes, a, r) =>
      val st = r match {
        case None                            => "live"
        case Some(v) if v > vmax - retain    => "retained"
        case _                               => "deletable"
      }
      (lang, src, bytes, a, r, st)
    }.sortBy(t => (t._6, t._1, t._2)).toSeq
    val got = RelationalQueries.k13VacuumPlan(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getString(5))).toSeq
    assert(got == classify(3L))
    // all three verdicts occur — live files, a time-travel window, and a
    // non-empty delete list — or the fixture proves nothing
    assert(got.map(_._6).distinct.toSet == Set("live", "retained", "deletable"))
    // retention monotonicity: raising retain can only shrink the delete list
    val dels = Seq(0L, 2L, 5L, 100L).map { rt =>
      RelationalQueries.k13VacuumPlan(spark, sf, rt).collect()
        .filter(_.getString(5) == "deletable").map(r => r.getString(1)).toSet
    }
    dels.sliding(2).foreach { case Seq(lo, hi) =>
      assert(hi.subsetOf(lo), "deletable set grew as retention rose")
    }
    assert(dels.head.nonEmpty && dels.last.isEmpty,
      "retain=0 should delete every dead file; retain≥all versions, none")
  }

  test("k11 compaction plan matches a driver-side brute force; the packing is sound") {
    val target = 4096L
    val files = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "source", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(d => (d._1, d._2)).map { case ((lang, src), grp) =>
        (lang, src, grp.map(_._3).sum, grp.length.toLong)
      }.toSeq
    val expected = files.groupBy(_._1).toSeq.flatMap { case (lang, fs) =>
      val ordered = fs.sortBy(f => (-f._3, f._2))
      val cums = ordered.scanLeft(0L)(_ + _._3).tail
      val groups = cums.map(c => (c + target - 1) / target)
      val gBytes = ordered.map(_._3).zip(groups).groupBy(_._2)
        .map { case (g, v) => (g, v.map(_._1).sum) }
      ordered.zip(groups).map { case ((l, s0, b, n), g) => (l, s0, n, b, g, gBytes(g)) }
    }.sortBy(r => (r._1, r._5, -r._4, r._2))
    val got = RelationalQueries.k11CompactionPlan(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    // every inventory file appears exactly once — the plan is a partition
    assert(got.map(r => (r._1, r._2)).distinct.size == files.size)
    // the packing actually merges: strictly fewer groups than files somewhere
    val merged = got.groupBy(r => (r._1, r._5)).exists(_._2.size > 1)
    assert(merged, "no merge group holds more than one file — planner vacuous")
  }
}

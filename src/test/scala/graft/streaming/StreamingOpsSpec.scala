package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

/** Streaming operators driven through MemoryStream micro-batches. */
class StreamingOpsSpec extends SparkSpec {

  // day-1 base: the engine's initial watermark is epoch 0, and an event AT
  // the watermark is dropped as late
  private val Base = 86400000L
  private def ts(minutes: Long): Timestamp = new Timestamp(Base + minutes * 60000L)

  test("tumbling window counts with watermark") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    val q = StreamingOps.tumblingCounts(in.toDF())
      .writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData(
        Event(1, ts(5), 1, "CLICK", 1.0),
        Event(2, ts(20), 1, "CLICK", 2.0),
        Event(3, ts(65), 2, "VIEW", 5.0))
      q.processAllAvailable()
      val rows = spark.table("tumbling").collect()
        .map(r => ((r.getAs[Timestamp]("window_start").getTime - Base) / 60000L,
          r.getAs[String]("event_type"), r.getAs[Long]("n_events"),
          r.getAs[Double]("total_value"))).toSet
      assert(rows == Set((0L, "CLICK", 2L, 3.0), (60L, "VIEW", 1L, 5.0)))
    } finally q.stop()
  }

  test("windowed approx-distinct folds across micro-batches without exact state") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    val q = StreamingOps.approxDistinctUsers(in.toDF())
      .writeStream.format("memory").queryName("adistinct")
      .outputMode(OutputMode.Update()).start()
    try {
      // same window fed from TWO micro-batches with overlapping users: the
      // HLL state must merge (3 distinct users, user 1 seen in both batches)
      in.addData(Event(1, ts(5), 1, "CLICK", 1.0), Event(2, ts(10), 2, "CLICK", 1.0))
      q.processAllAvailable()
      in.addData(Event(3, ts(20), 1, "CLICK", 1.0), Event(4, ts(30), 3, "CLICK", 1.0))
      q.processAllAvailable()
      val byWindow = spark.table("adistinct").collect()
        .map(r => ((r.getAs[Timestamp]("window_start").getTime - Base) / 60000L,
          r.getAs[String]("event_type")) -> r.getAs[Long]("approx_users")).toMap
      // at 2% rsd and n=3 the estimate is exact
      assert(byWindow((0L, "CLICK")) == 3L)
    } finally q.stop()
  }

  test("the same tumbling plan runs from a parquet file-stream source") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import org.apache.spark.sql.functions._
    // stage the events table as a file-source directory: readStream →
    // transform → writeStream over real files, same plan as the batch query
    val dir = Files.createTempDirectory("ev-stream").toString
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      Paths.get(dir, "events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    // schema-adaptive ts, same branch as Tables.t: raw-nanos vintages need
    // the micros conversion, TIMESTAMP(MICROS) vintages stream through
    val raw = spark.read.parquet(dir)
    val streamRaw = spark.readStream.schema(raw.schema).parquet(dir)
    val stream = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        streamRaw.withColumn("ts", expr("timestamp_micros(ts div 1000L)"))
      case _ => streamRaw
    }
    val q = StreamingOps.tumblingCounts(stream)
      .writeStream.format("memory").queryName("filetumbling")
      .outputMode(OutputMode.Update()).start()
    try {
      q.processAllAvailable()
      // one batch, watermark starts at 0 → nothing is late; totals must match
      val got = spark.table("filetumbling")
        .agg(sum("n_events")).collect()(0).getLong(0)
      assert(got == graft.Tables.t(spark, "/root/testdata/sf0.001", "events").count())
    } finally q.stop()
  }

  test("streaming incremental dedup agrees with batch d10 verdicts across micro-batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // same planted shape as the batch d10 fixture: corpus docs 1/5 (exact
    // base), 2 (near base), 3 (unrelated); streamed docs 4 (exact dup of
    // 1), 8 (one word off 2), 12 (novel), split across TWO micro-batches
    val base = (1 to 30).map(i => s"a$i").mkString(" ")
    val near = (1 to 29).map(i => s"w$i").mkString(" ") + " zz"
    val corpus = Seq(
      1L -> base, 5L -> base, 2L -> near.replace("zz", "yy"),
      3L -> "completely different text here entirely").toDF("doc_id", "text")
    val in = MemoryStream[StreamDoc]
    val got = new scala.collection.mutable.ArrayBuffer[(Long, String, Long, Long)]()
    val batchIds = new scala.collection.mutable.ArrayBuffer[Long]()
    val q = StreamingOps.dedupAgainstIndex(in.toDF(), corpus) { (out, batchId) =>
      got.synchronized {
        batchIds += batchId
        got ++= out.collect().map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))
      }
    }.start()
    try {
      in.addData(StreamDoc(4, ts(1), base), StreamDoc(8, ts(2), near))
      q.processAllAvailable()
      in.addData(StreamDoc(12, ts(3), "nothing shared with any corpus doc at all"))
      q.processAllAvailable()
      val byId = got.synchronized(got.toList).map(t => t._1 -> t).toMap
      assert(byId(4L) == ((4L, "exact_dup", 1L, 1000000L)), byId(4L))
      assert(byId(8L)._2 == "near_dup" && byId(8L)._3 == 2L && byId(8L)._4 >= 500000L,
        byId(8L))
      assert(byId(12L) == ((12L, "novel", -1L, -1L)), byId(12L))
      // micro-batched verdicts must equal the one-shot batch operator's
      val streamed = Seq(4L -> base, 8L -> near,
        12L -> "nothing shared with any corpus doc at all").toDF("doc_id", "text")
      val batch = graft.queries.PipelineQueries.incrementalDedup(streamed, corpus)
        .collect().map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
      assert(got.synchronized(got.toSet) == batch,
        "streaming verdicts diverge from the batch operator")
      // distinct, monotone batch ids — the idempotent-sink handle
      assert(batchIds.synchronized(batchIds.toList) == batchIds.synchronized(batchIds.toList).distinct.sorted)
      // null text must classify as novel, not kill the query
      in.addData(StreamDoc(16, ts(4), null))
      q.processAllAvailable()
      assert(got.synchronized(got.find(_._1 == 16L)).contains((16L, "novel", -1L, -1L)))
    } finally q.stop()
  }

  test("stream-static enrichment joins each micro-batch against the dimension") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    val dim = Seq((1L, "gold"), (2L, "trial")).toDF("user_id", "segment")
    val q = StreamingOps.enrichAgainstStatic(in.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        Event(1, ts(1), 1, "CLICK", 1.0),
        Event(2, ts(2), 2, "VIEW", 2.0),
        Event(3, ts(3), 9, "VIEW", 3.0)) // no dimension row → left join null
      q.processAllAvailable()
      val rows = spark.table("enriched").collect()
        .map(r => r.getAs[Long]("event_id") -> r.getAs[String]("segment")).toMap
      assert(rows == Map(1L -> "gold", 2L -> "trial", 3L -> null))
    } finally q.stop()
  }

  test("streaming content dedup keeps first copy, evicts state past watermark") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[StreamDoc]
    val q = StreamingOps.dedupByContent(in.toDF(), delay = "10 minutes")
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        StreamDoc(1, ts(0), "same text"),
        StreamDoc(2, ts(1), "same text"), // in-batch duplicate
        StreamDoc(3, ts(2), "other text"))
      q.processAllAvailable()
      in.addData(StreamDoc(4, ts(3), "same text")) // cross-batch, inside horizon
      q.processAllAvailable()
      def ids = spark.table("dedup").collect().map(_.getAs[Long]("doc_id")).toSet
      assert(ids == Set(1L, 3L), s"expected first copies only, got $ids")
      // advance the watermark far past the horizon, then the same content
      // arrives again: its state was evicted, so it emits as a fresh doc
      in.addData(StreamDoc(5, ts(60), "unrelated"))
      q.processAllAvailable()
      in.addData(StreamDoc(6, ts(61), "same text"))
      q.processAllAvailable()
      assert(ids.contains(6L), s"re-arrival after eviction not emitted: $ids")
    } finally q.stop()
  }

  test("built-in session_window twin matches the stateful sessionizer; exact-gap splits") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    val q = StreamingOps.sessionWindowCounts(in.toDF())
      .writeStream.format("memory").queryName("swsessions")
      .outputMode(OutputMode.Append()).start()
    try {
      def us(minutes: Long): Long = (Base + minutes * 60000L) * 1000L
      // the stateful sessionizer's fixture: 10-min gap merges, 40-min splits
      in.addData(
        Event(1, ts(0), 1, "CLICK", 1.0),
        Event(2, ts(10), 1, "CLICK", 2.0),
        Event(3, ts(50), 1, "VIEW", 4.0))
      // push the watermark past session end + gap, then one more batch so
      // the state-store eviction actually emits
      in.addData(Event(7, ts(300), 99, "W", 0.0))
      q.processAllAvailable()
      in.addData(Event(8, ts(301), 99, "W", 0.0))
      q.processAllAvailable()
      val u1 = spark.table("swsessions").as[Session].collect()
        .filter(_.user_id == 1).toSet
      assert(u1 == Set(Session(1, us(0), us(10), 2, 3.0),
        Session(1, us(50), us(50), 1, 4.0)),
        s"built-in windows diverged from the sessionizer's: $u1")
      // the boundary: a gap of EXACTLY 30 min MERGES (inclusive-end window
      // overlap) — the same verdict as w3's `gap > 30 min` keep rule, so
      // the built-in and the custom formulations agree even here
      in.addData(Event(9, ts(400), 5, "A", 1.0), Event(10, ts(430), 5, "B", 1.0))
      in.addData(Event(11, ts(700), 99, "W", 0.0))
      q.processAllAvailable()
      in.addData(Event(12, ts(701), 99, "W", 0.0))
      q.processAllAvailable()
      val u5 = spark.table("swsessions").as[Session].collect()
        .filter(_.user_id == 5).toSet
      assert(u5 == Set(Session(5, us(400), us(430), 2, 2.0)),
        s"exact-gap events must merge, matching w3's > rule: $u5")
    } finally q.stop()
  }

  test("stateful sessionizer closes sessions on the 30-minute gap") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    val q = StreamingOps.sessionize(in.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: two events 10 min apart, then a 40-min gap, then one more —
      // the first two form a session that closes when the third arrives
      in.addData(
        Event(1, ts(0), 1, "CLICK", 1.0),
        Event(2, ts(10), 1, "CLICK", 2.0))
      q.processAllAvailable()
      in.addData(Event(3, ts(50), 1, "VIEW", 4.0))
      q.processAllAvailable()
      def us(minutes: Long): Long = (Base + minutes * 60000L) * 1000L
      val rows = spark.table("sessions").as[Session].collect().toSet
      assert(rows == Set(Session(1, us(0), us(10), 2, 3.0)))
      // out-of-order arrival within one batch is sorted by event time
      in.addData(
        Event(5, ts(100), 2, "B", 1.0),
        Event(4, ts(95), 2, "A", 1.0),
        Event(6, ts(160), 2, "C", 1.0)) // closes the (95,100) session
      q.processAllAvailable()
      val u2 = spark.table("sessions").as[Session].collect().filter(_.user_id == 2).toSet
      assert(u2 == Set(Session(2, us(95), us(100), 2, 2.0)))
      // trailing sessions close via EventTimeTimeout once the watermark
      // passes end+gap: push the watermark far ahead with an unrelated user
      in.addData(Event(7, ts(300), 99, "W", 0.0))
      q.processAllAvailable()
      in.addData(Event(8, ts(301), 99, "W", 0.0)) // extra batch so timeouts fire
      q.processAllAvailable()
      val all = spark.table("sessions").as[Session].collect().toSet
      assert(all.contains(Session(1, us(50), us(50), 1, 4.0)),
        s"user 1 trailing session not emitted: $all")
      assert(all.contains(Session(2, us(160), us(160), 1, 1.0)),
        s"user 2 trailing session not emitted: $all")
    } finally q.stop()
  }

  test("streaming funnel agrees with batch w4 on first episodes and frees converted state") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    def tsOfUs(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }
    val evs = graft.Tables.t(spark, sfDir, "events")
      .selectExpr("event_id", "unix_micros(ts) as us", "user_id", "event_type", "value")
      .collect().sortBy(_.getAs[Long]("us"))
      .map(r => Event(r.getAs[Long]("event_id"), tsOfUs(r.getAs[Long]("us")),
        r.getAs[Long]("user_id"), r.getAs[String]("event_type"), r.getAs[Double]("value")))
    val lastUs = graft.Tables.t(spark, sfDir, "events")
      .selectExpr("max(unix_micros(ts))").collect()(0).getLong(0)
    val in = MemoryStream[Event]
    val q = StreamingOps.funnel(in.toDS())
      .writeStream.format("memory").queryName("funnelq")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 888888: a lone view — must surface as a stage-1 abandonment
      val (b1, b2) = evs.splitAt(evs.length / 2)
      in.addData(b1.toSeq)
      q.processAllAvailable()
      in.addData(b2.toSeq :+ Event(8888881, tsOfUs(lastUs - 1000000L), 888888L, "view", 0.0))
      q.processAllAvailable()
      // push the watermark past every abandonment horizon (7 days)
      val far = lastUs + 8L * 86400L * 1000000L
      in.addData(Event(9999991, tsOfUs(far), 999999L, "view", 0.0))
      q.processAllAvailable()
      in.addData(Event(9999992, tsOfUs(far + 60000000L), 999999L, "view", 0.0))
      q.processAllAvailable()
      val real = spark.table("funnelq").as[FunnelOutcome].collect()
        .filterNot(_.user_id == 999999L)
      val batch = graft.queries.PipelineQueries.w4Funnel(spark, sfDir).collect().map { r =>
        def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
        r.getLong(0) -> ((r.getInt(1), opt(2), opt(3), opt(4)))
      }.toMap
      // first conversion per user == the batch operator's stage-3 rows
      val firstConv = real.filter(_.converted).groupBy(_.user_id)
        .map { case (u, rs) => u -> rs.minBy(_.purchase_us.get) }
      val conv3 = batch.filter(_._2._1 == 3)
      assert(firstConv.keySet == conv3.keySet)
      firstConv.foreach { case (u, o) =>
        assert((o.stage, o.view_us, o.click_us, o.purchase_us) == conv3(u), s"user $u") }
      assert(conv3.nonEmpty, "no conversions at sf0.001 — test is vacuous")
      // batch non-converters emit exactly one abandonment row each, matching
      val nonConvUsers = batch.collect { case (u, st) if st._1 < 3 => u }.toSet
      val nonConvRows = real.filter(r => nonConvUsers(r.user_id))
      assert(nonConvRows.map(_.user_id).sorted.toSeq == nonConvUsers.toSeq.sorted)
      nonConvRows.foreach { o =>
        assert(!o.converted &&
          (o.stage, o.view_us, o.click_us, o.purchase_us) == batch(o.user_id)) }
      // the synthetic lone-view user abandoned at stage 1
      val lone = real.filter(_.user_id == 888888L)
      assert(lone.length == 1 && lone.head.stage == 1 && !lone.head.converted,
        s"lone-view abandonment wrong: ${lone.toSeq}")
    } finally q.stop()
  }

  test("streaming trending top-k emits each closed window once, equal to batch w7") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    def tsOfUs(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }
    val evs = graft.Tables.t(spark, sfDir, "events")
      .selectExpr("event_id", "unix_micros(ts) as us", "user_id", "event_type", "value")
      .collect().sortBy(_.getAs[Long]("us"))
      .map(r => Event(r.getAs[Long]("event_id"), tsOfUs(r.getAs[Long]("us")),
        r.getAs[Long]("user_id"), r.getAs[String]("event_type"), r.getAs[Double]("value")))
    val lastUs = evs.map(e => e.ts.getTime * 1000L).max
    val in = MemoryStream[Event]
    val q = StreamingOps.trendingTopK(in.toDS())
      .writeStream.format("memory").queryName("trending")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, b2) = evs.splitAt(evs.length / 2)
      in.addData(b1.toSeq); q.processAllAvailable()
      in.addData(b2.toSeq); q.processAllAvailable()
      // two ticks far ahead: the first advances the watermark past every
      // real window's end + 2 h delay, the second triggers the timeouts
      val far = lastUs + 10L * 3600L * 1000000L
      in.addData(Event(-1, tsOfUs(far), 0L, "tick", 0.0)); q.processAllAvailable()
      in.addData(Event(-2, tsOfUs(far + 3600L * 1000000L), 0L, "tick", 0.0))
      q.processAllAvailable()
      val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:00")
        .withZone(java.time.ZoneOffset.UTC)
      val got = spark.table("trending").as[Trending].collect()
        .filterNot(_.event_type == "tick")
        .map(t => (fmt.format(java.time.Instant.ofEpochSecond(t.window_start_us / 1000000L)),
          t.rank, t.event_type, t.n_events))
      // exactly-once: one row per (window, rank)
      assert(got.map(t => (t._1, t._2)).distinct.length == got.length)
      val batch = graft.queries.RelationalQueries.w7HourlyTopk(spark, sfDir).collect()
        .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3)))
      assert(got.sorted.toSeq == batch.sorted.toSeq)
      assert(batch.nonEmpty, "no closed windows — test is vacuous")
    } finally q.stop()
  }

  test("stream-stream band join emits exactly the batch j10 pair set") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    def tsOfUs(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }
    def side(kind: String): Array[Event] =
      graft.Tables.t(spark, sfDir, "events")
        .filter(org.apache.spark.sql.functions.col("event_type") === kind)
        .selectExpr("event_id", "unix_micros(ts) as us", "user_id", "event_type", "value")
        .collect().sortBy(_.getAs[Long]("us"))
        .map(r => Event(r.getAs[Long]("event_id"), tsOfUs(r.getAs[Long]("us")),
          r.getAs[Long]("user_id"), r.getAs[String]("event_type"), r.getAs[Double]("value")))
    val purchases = MemoryStream[Event]
    val errors = MemoryStream[Event]
    val q = StreamingOps.bandJoin(purchases.toDF(), errors.toDF())
      .writeStream.format("memory").queryName("bandjoin")
      .outputMode(OutputMode.Append()).start()
    try {
      // two batches per side, both sides advancing together in event time
      val (p1, p2) = side("purchase").splitAt(side("purchase").length / 2)
      val (e1, e2) = side("error").splitAt(side("error").length / 2)
      purchases.addData(p1.toSeq); errors.addData(e1.toSeq)
      q.processAllAvailable()
      purchases.addData(p2.toSeq); errors.addData(e2.toSeq)
      q.processAllAvailable()
      val got = spark.table("bandjoin").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("purchase_id"),
          r.getAs[Long]("error_id"), r.getAs[Long]("micros_offset"))).toSet
      val batch = graft.queries.RelationalQueries.j10RangeJoin(spark, sfDir).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("purchase_id"),
          r.getAs[Long]("error_id"), r.getAs[Long]("micros_offset"))).toSet
      assert(batch.nonEmpty, "no in-band pairs at sf0.001 — test is vacuous")
      assert(got == batch,
        s"stream pair set diverged: missing=${(batch -- got).take(5)} extra=${(got -- batch).take(5)}")
    } finally q.stop()
  }

  test("streaming profile folds stats across micro-batches in one state row") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[StreamDoc]
    val q = StreamingOps.profileStream(
      in.toDF().selectExpr("doc_id", "'en' as lang", "'s0' as source", "text"))
      .writeStream.format("memory").queryName("profilestream")
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData(StreamDoc(1, ts(0), "alpha"), StreamDoc(2, ts(1), "beta"))
      q.processAllAvailable()
      in.addData(StreamDoc(3, ts(2), "alpha")) // repeated text, new doc_id
      q.processAllAvailable()
      // memory sink in Update mode appends updated rows; take the LAST
      // emission per column = the running totals after both batches
      val last = spark.table("profilestream").collect()
        .zipWithIndex.groupBy(_._1.getAs[String]("column_name"))
        .map { case (c, rs) => c -> rs.maxBy(_._2)._1 }
      assert(last("doc_id").getAs[Long]("n_nonnull") == 3L)
      assert(last("doc_id").getAs[Long]("approx_distinct") == 3L) // exact at n=3
      assert(last("text").getAs[Long]("approx_distinct") == 2L, "HLL state did not merge")
      assert(last("text").getAs[String]("min_str") == "alpha" &&
        last("text").getAs[String]("max_str") == "beta")
    } finally q.stop()
  }

  test("streaming contamination screen agrees with the batch d7 operator") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    // rebuild the batch operator's two sides from the same split rule
    def splitOf(text: String): String =
      if (java.lang.Long.parseLong(
        graft.functions.Hashing.md5Hex(text).take(8), 16) % 100 < 95) "train" else "eval"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val evalGrams = docs.filter(d => splitOf(d._2) == "eval")
      .flatMap { case (_, t) =>
        val w = t.split(" ", -1)
        if (w.length < 4) Seq.empty
        else (0 to w.length - 4).map(i =>
          graft.functions.Hashing.md5Hex16(w.slice(i, i + 4).mkString(" ")))
      }.distinct.toSeq.toDF("gh")
    val in = MemoryStream[StreamDoc]
    val q = StreamingOps.screenContamination(in.toDS(), evalGrams)
      .writeStream.format("memory").queryName("decontam")
      .outputMode(OutputMode.Append()).start()
    try {
      val trainDocs = docs.filter(d => splitOf(d._2) == "train")
      // two micro-batches — the screen must be stateless across them
      val (b1, b2) = trainDocs.splitAt(trainDocs.length / 2)
      in.addData(b1.map { case (id, t) => StreamDoc(id, ts(0), t) }.toSeq)
      q.processAllAvailable()
      in.addData(b2.map { case (id, t) => StreamDoc(id, ts(1), t) }.toSeq)
      q.processAllAvailable()
      val got = spark.table("decontam").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared"))
        .filter(_._2 > 0).toMap
      val batch = graft.queries.PipelineQueries.d7Contamination(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == batch)
      assert(batch.nonEmpty, "no cross-split overlap at sf0.001 — test is vacuous")
      // every streamed doc was scored, contaminated or not
      assert(spark.table("decontam").count() == trainDocs.length)
    } finally q.stop()
  }

  test("streaming tokenization equals the batch encoder on every document") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // artifact trained ONCE on the static corpus, reused across micro-batches
    val merges = graft.queries.PipelineQueries.bpeTrain(spark, sf, 10)
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).take(6)
    val in = MemoryStream[StreamDoc]
    val q = StreamingOps.tokenizeStream(in.toDF(), merges)
      .writeStream.format("memory").queryName("bpetok")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(corpus.take(3).map { case (id, t) => StreamDoc(id, ts(0), t) }.toSeq)
      q.processAllAvailable()
      in.addData(corpus.drop(3).map { case (id, t) => StreamDoc(id, ts(1), t) }.toSeq)
      q.processAllAvailable()
      val got = spark.table("bpetok").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens")).toMap
      val batch = graft.queries.PipelineQueries.x19BpeEncode(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == corpus.map { case (id, _) => id -> batch(id) }.toMap)
    } finally q.stop()
  }

  test("streaming source quota admits first-cap-by-arrival; state is one counter per source") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val cap = 3
    // two sources; srcA overflows across the batch boundary, srcB never fills
    val b1 = Seq(SourcedDoc(1L, ts(0), "srcA"), SourcedDoc(2L, ts(1), "srcA"),
      SourcedDoc(3L, ts(2), "srcB"))
    val b2 = Seq(SourcedDoc(4L, ts(3), "srcA"), SourcedDoc(5L, ts(4), "srcA"),
      SourcedDoc(6L, ts(5), "srcB"))
    val in = MemoryStream[SourcedDoc]
    val q = StreamingOps.sourceQuotaStream(in.toDS(), cap)
      .writeStream.format("memory").queryName("quota")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(b1); q.processAllAvailable()
      in.addData(b2); q.processAllAvailable()
      val got = spark.table("quota").as[Admission].collect()
        .map(a => (a.doc_id, a.source, a.admitted_rank)).sortBy(_._1).toSeq
      // srcA: docs 1,2 admitted in batch 1; doc 4 takes the last slot in
      // batch 2 (arrival order), doc 5 rejected; srcB never reaches the cap
      assert(got == Seq((1L, "srcA", 1L), (2L, "srcA", 2L), (3L, "srcB", 1L),
        (4L, "srcA", 3L), (6L, "srcB", 2L)))
      // per-source admissions never exceed the cap, ranks are 1..n
      got.groupBy(_._2).foreach { case (_, as) =>
        assert(as.size <= cap)
        assert(as.map(_._3).sorted == (1 to as.size).map(_.toLong))
      }
      // state is the per-source counter: exactly one state row per source
      val prog = q.lastProgress
      assert(prog.stateOperators.nonEmpty &&
        prog.stateOperators.head.numRowsTotal == 2,
        s"expected 2 state rows (one per source), got ${prog.stateOperators.head.numRowsTotal}")
    } finally q.stop()
  }

  test("streaming drift monitor: closed windows report batch-exact TV contributions") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val D = graft.queries.PipelineQueries.X24Buckets
    def md5b(tk: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tk.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.substring(0, 15), 16) % D).toInt
    }
    // pinned reference distribution (the artifact a batch x24 run exports)
    val refTokens = Seq("spark", "join", "scan", "table", "row", "fast")
    val refPpm = refTokens.map(md5b).groupBy(identity)
      .map { case (b, v) => (b, v.length * 1000000L / refTokens.length) }
    // window 0: drifted mix; window 1: on-distribution mix
    val w0 = Seq(StreamDoc(1L, ts(10), "slow slow merge"), StreamDoc(2L, ts(20), "merge batch"))
    val w1 = Seq(StreamDoc(3L, ts(70), "spark join"), StreamDoc(4L, ts(80), "scan table row fast"))
    val in = MemoryStream[StreamDoc]
    val q = StreamingOps.driftStream(in.toDS(), refPpm)
      .writeStream.format("memory").queryName("drift")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(w0); q.processAllAvailable()
      in.addData(w1); q.processAllAvailable()
      // advance the watermark far past both windows, then tick the timeouts
      in.addData(StreamDoc(-1L, ts(10 * 60), "tick")); q.processAllAvailable()
      in.addData(StreamDoc(-2L, ts(11 * 60), "tick")); q.processAllAvailable()
      val got = spark.table("drift").as[DriftRow].collect()
        .filter(r => r.window_start_us < ts(10 * 60).getTime * 1000L)
        .map(r => (r.window_start_us, r.b, r.cnt, r.cand_ppm, r.ref_ppm, r.tv_contrib_ppm))
      // replicate per closed window with the batch operator's arithmetic
      val expected = (w0 ++ w1).flatMap(d =>
        d.text.split(" ", -1).map(tk => (d.ts.getTime / 3600000L * 3600000000L, md5b(tk))))
        .groupBy(_._1).toSeq.flatMap { case (wus, toks) =>
          val counts = toks.groupBy(_._2).map { case (b, v) => (b, v.length.toLong) }
          val total = counts.values.sum
          // union with the reference buckets: a token class that VANISHED
          // from the window must still contribute its full ref ppm
          (counts.keySet ++ refPpm.keySet).toSeq.sorted.map { b =>
            val cnt = counts.getOrElse(b, 0L)
            val cand = if (total == 0) 0L else cnt * 1000000L / total
            val ref = refPpm.getOrElse(b, 0L)
            (wus, b, cnt, cand, ref, math.abs(cand - ref))
          }
        }
      assert(got.toSeq.sorted == expected.sorted)
      // the vanished-class path is actually exercised: the drifted window
      // reports at least one reference-only bucket (cnt 0, full ref ppm)
      assert(got.exists(r => r._3 == 0L && r._5 > 0L && r._6 == r._5),
        "no reference-only bucket reported — the loudest drift signal is missing")
      // the drifted window alarms louder than the on-distribution one
      val tvByWindow = got.groupBy(_._1).view.mapValues(_.map(_._6).sum / 2).toMap
      val Seq(tv0, tv1) = tvByWindow.toSeq.sortBy(_._1).map(_._2)
      assert(tv0 > tv1, s"drifted window TV $tv0 not above on-distribution $tv1")
    } finally q.stop()
  }

  test("streaming ANN ingest equals the batch sim7 probe on every micro-batched vector") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) as v")
      .selectExpr("vec_id", "v", "sqrt(aggregate(v, 0D, (acc, x) -> acc + x * x)) as nrm")
      .filter("nrm > 0")
      .as[(Long, Array[Double], Double)]
    val index = graft.queries.PipelineQueries.prepareVectorIndex(
      vecs.filter(col("vec_id") % 4 =!= 0), 8)
    val inc = vecs.filter(col("vec_id") % 4 === 0).collect()
    assert(inc.length >= 4, "need enough increment vectors to split into batches")
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int, Long)]
    val in = MemoryStream[StreamVec]
    val q = StreamingOps.annAgainstIndex(in.toDF(), index, nProbe = 2) { (res, _) =>
      got ++= res.collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("home_cell"), r.getAs[Int]("rnk"), r.getAs[Long]("neighbor_id")))
    }.start()
    try {
      val (b1, b2) = inc.splitAt(inc.length / 2)
      in.addData(b1.map { case (id, v, n) => StreamVec(id, v, n) }.toSeq)
      q.processAllAvailable()
      in.addData(b2.map { case (id, v, n) => StreamVec(id, v, n) }.toSeq)
      q.processAllAvailable()
      val batch = graft.queries.PipelineQueries.sim7IncrementalAnn(spark, sf).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("home_cell"),
          r.getAs[Int]("rnk"), r.getAs[Long]("neighbor_id"))).toSet
      assert(got.toSet == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("streaming quality classifier equals the batch x20 scorer on every document") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).take(8)
    val in = MemoryStream[StreamDoc]
    val q = StreamingOps.classifyStream(in.toDF())
      .writeStream.format("memory").queryName("qclass")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(corpus.take(4).map { case (id, t) => StreamDoc(id, ts(0), t) }.toSeq)
      q.processAllAvailable()
      in.addData(corpus.drop(4).map { case (id, t) => StreamDoc(id, ts(1), t) }.toSeq)
      q.processAllAvailable()
      val got = spark.table("qclass").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("score_ppm"), r.getAs[Int]("keep")))).toMap
      val batch = graft.queries.PipelineQueries.x20QualityClassifier(spark, sf)
        .collect().map(r => (r.getLong(0), (r.getLong(2), r.getInt(3)))).toMap
      assert(got == corpus.map { case (id, _) => id -> batch(id) }.toMap)
      // the streamed plan is stateless: no state store operators anywhere
      val plan = q.lastProgress
      assert(plan == null || plan.stateOperators.isEmpty,
        "classifier twin must not carry streaming state")
    } finally q.stop()
  }

  test("streaming normalizer applies x26's exact rule statelessly per document") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[StreamDoc]
    val q = StreamingOps.normalizeStream(in.toDF())
      .writeStream.format("memory").queryName("normed")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        StreamDoc(1L, ts(0), "Hello,  WORLD!! spark"),
        StreamDoc(2L, ts(1), "already clean text"),
        StreamDoc(3L, ts(2), "  pad & trim.  "))
      q.processAllAvailable()
      val got = spark.table("normed").collect()
        .map(r => (r.getAs[Long]("doc_id"),
          r.getAs[String]("text"), r.getAs[Int]("was_dirty"))).toSet
      // independent reference replay of the same rule
      def norm(t: String): String =
        t.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim
      assert(got == Set(
        (1L, norm("Hello,  WORLD!! spark"), 1),
        (2L, "already clean text", 0),
        (3L, norm("  pad & trim.  "), 1)))
      assert(got.exists(_._2 == "hello world spark"))
      val plan = q.lastProgress
      assert(plan == null || plan.stateOperators.isEmpty,
        "normalizer twin must not carry streaming state")
    } finally q.stop()
    // the documented wiring composes: downstream text-keyed ops resolve the
    // normalized column without rewiring (classifyStream reads `text`)
    val in2 = MemoryStream[StreamDoc]
    val q2 = StreamingOps.classifyStream(StreamingOps.normalizeStream(in2.toDF()))
      .writeStream.format("memory").queryName("normclass")
      .outputMode(OutputMode.Append()).start()
    try {
      in2.addData(StreamDoc(9L, ts(0), "Spark,  JOIN!"))
      q2.processAllAvailable()
      assert(spark.table("normclass").count() == 1,
        "normalize -> classify composition produced no row")
    } finally q2.stop()
  }

  test("streaming chunker equals the batch x25 geometry on every document") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).take(8)
    val in = MemoryStream[StreamDoc]
    val q = StreamingOps.chunkStream(in.toDF())
      .writeStream.format("memory").queryName("chunks")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(corpus.take(4).map { case (id, t) => StreamDoc(id, ts(0), t) }.toSeq)
      q.processAllAvailable()
      in.addData(corpus.drop(4).map { case (id, t) => StreamDoc(id, ts(1), t) }.toSeq)
      q.processAllAvailable()
      val got = spark.table("chunks").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
          r.getAs[Long]("start_tok"), r.getAs[Long]("n_tokens"),
          r.getAs[String]("chunk"))).toSet
      val ids = corpus.map(_._1).toSet
      val batch = graft.queries.PipelineQueries.x25ChunkOverlap(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
        .filter(r => ids(r._1)).toSet
      assert(got == batch, "streamed chunks differ from the batch layout")
      assert(got.exists(_._2 > 0), "no document produced a second chunk — overlap untested")
      // the streamed plan is stateless: no state store operators anywhere
      val plan = q.lastProgress
      assert(plan == null || plan.stateOperators.isEmpty,
        "chunking twin must not carry streaming state")
    } finally q.stop()
  }

  test("streaming OOV monitor: per-window per-source rates, emitted once on close") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val vocab = Set("known", "words", "only")
    val in = MemoryStream[IngestDoc]
    val q = StreamingOps.oovMonitorStream(in.toDF(), vocab, delay = "30 minutes")
      .writeStream.format("memory").queryName("oovmon")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        IngestDoc(1, ts(5), "known words mystery", "s1"),   // hour 0: 3 toks 1 oov
        IngestDoc(2, ts(10), "known unknown alien", "s1"),  // hour 0: 3 toks 2 oov
        IngestDoc(3, ts(15), "only known", "s2"))           // hour 0: 2 toks 0 oov
      q.processAllAvailable()
      // window 0 is still open — Append emits nothing yet
      assert(spark.table("oovmon").isEmpty)
      // advance the watermark past hour 0 + delay → hour-0 rows close
      in.addData(IngestDoc(4, ts(120), "known novelty", "s1"))
      q.processAllAvailable()
      def rows = spark.table("oovmon").collect()
        .map(r => ((r.getAs[java.sql.Timestamp]("window_start").getTime - Base) / 3600000L,
          r.getAs[String]("source"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_oov"), r.getAs[Long]("oov_ppm"))).toSet
      assert(rows == Set(
        (0L, "s1", 6L, 3L, 500000L),
        (0L, "s2", 2L, 0L, 0L)), s"got $rows")
      // a straggler behind the watermark must not reopen the closed window
      in.addData(IngestDoc(5, ts(20), "late alien", "s1"))
      q.processAllAvailable()
      assert(rows.count(_._1 == 0L) == 2, "closed window re-emitted")
    } finally q.stop()
  }

  test("streaming span corruption equals the batch core doc-for-doc, statelessly") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[StreamDoc]
    val q = StreamingOps.corruptStream(in.toDF())
      .writeStream.format("memory").queryName("corrupted")
      .outputMode(OutputMode.Append()).start()
    try {
      val docs = (1L to 40L).map(i => i -> s"w${i} a b c d e f g h i j k l m ${i}x")
      in.addData(docs.map { case (id, t0) => StreamDoc(id, ts(0), t0) }: _*)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"), r.getAs[Long]("n_masked"),
          r.getAs[String]("corrupted"), r.getAs[String]("targets"))
      val got = spark.table("corrupted").collect().map(key).toSet
      val batch = graft.queries.PipelineQueries.corruptSpans(
        docs.toDF("doc_id", "text"), 4, 150000L).collect().map(key).toSet
      assert(got == batch)
      // the draw fires on this fixture and the twin carries no state
      assert(got.exists(_._3 > 0))
      val prog = q.lastProgress
      assert(prog == null || prog.stateOperators.isEmpty,
        "corruption twin must not carry streaming state")
    } finally q.stop()
  }

  test("composed curation ingest: every gate fires and only the quota holds state") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.functions.Hashing
    def weight(tok: String): Long = graft.queries.PipelineQueries
      .X20Weights((Hashing.md5Lane60(tok) % 64).toInt)
    val toks = (0 until 200).map(i => s"tok$i")
    val hi = toks.filter(t => weight(t) >= 500000L)
    val lo = toks.filter(t => weight(t) < 500000L)
    assert(hi.size >= 6 && lo.nonEmpty, "token pool cannot exercise the gate")
    // passes the gate only AFTER lowercasing — admitting it proves the
    // normalizer runs before the scorer
    val caseTok = toks.find(t =>
      weight(t) >= 500000L && weight(t.toUpperCase) < 500000L).get
    val gram = s"${hi(2)} ${hi(3)} ${hi(4)} ${hi(5)}"
    val evalGrams = Seq(Hashing.md5Hex16(gram)).toDF("gh")
    val in = MemoryStream[IngestDoc]
    val q = StreamingOps.curateIngest(in.toDF(), evalGrams, cap = 2)
      .writeStream.format("memory").queryName("curated")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        IngestDoc(1, ts(0), s"${hi(0)} ${hi(0)} ${hi(0)} ${hi(0)}", "s1"),
        IngestDoc(2, ts(1), s"  ${caseTok.toUpperCase}  ${caseTok.toUpperCase} !!", "s1"),
        IngestDoc(3, ts(2), s"${lo.head} ${lo.head} ${lo.head} ${lo.head}", "s1"),
        IngestDoc(4, ts(3), gram, "s1"),
        IngestDoc(5, ts(4), s"${hi(1)} ${hi(1)} ${hi(1)} ${hi(1)}", "s1"))
      q.processAllAvailable()
      def rows = spark.table("curated").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
          r.getAs[Long]("admitted_rank"))).toSet
      // 1 admitted; 2 admitted ONLY because normalization ran first;
      // 3 quality-rejected; 4 contamination-rejected; 5 quota-rejected
      assert(rows == Set((1L, "s1", 1L), (2L, "s1", 2L)), s"got $rows")
      // a second batch: another source has its own budget, s1 stays capped
      in.addData(
        IngestDoc(6, ts(5), s"${hi(0)} ${hi(0)} ${hi(0)} ${hi(0)}", "s2"),
        IngestDoc(7, ts(6), s"${hi(1)} ${hi(1)} ${hi(1)} ${hi(1)}", "s1"))
      q.processAllAvailable()
      assert(rows == Set((1L, "s1", 1L), (2L, "s1", 2L), (6L, "s2", 1L)), s"got $rows")
      // the composed plan's only state is the quota stage
      val prog = q.lastProgress
      assert(prog != null && prog.stateOperators.length == 1,
        "expected exactly the quota's state operator")
    } finally q.stop()
  }

  test("streaming audio features equal the batch core frame-for-frame, statelessly") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[StreamDoc]
    val q = StreamingOps.audioFeaturesStream(in.toDF())
      .writeStream.format("memory").queryName("audiof")
      .outputMode(OutputMode.Append()).start()
    try {
      val docs = Seq((101L, "streamed audio one"), (102L, "and another payload"))
      in.addData(docs.map { case (id, t0) => StreamDoc(id, ts(0), t0) }: _*)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      val got = spark.table("audiof").collect().map(key).toSet
      val batch = graft.queries.PipelineQueries
        .audioFrameFeatures(docs.toDS()).collect().map(key).toSet
      assert(got == batch && got.nonEmpty)
      val prog = q.lastProgress
      assert(prog == null || prog.stateOperators.isEmpty,
        "audio twin must not carry streaming state")
    } finally q.stop()
  }

  test("streaming audio pitch equals the batch core doc-for-doc, statelessly") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[StreamDoc]
    val q = StreamingOps.audioPitchStream(in.toDF())
      .writeStream.format("memory").queryName("audiop")
      .outputMode(OutputMode.Append()).start()
    try {
      val docs = Seq((201L, "streamed pitch probe"), (202L, "second audio doc"))
      in.addData(docs.map { case (id, t0) => StreamDoc(id, ts(0), t0) }: _*)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val got = spark.table("audiop").collect().map(key).toSet
      val batch = graft.queries.PipelineQueries
        .audioPitch(docs.toDS()).collect().map(key).toSet
      assert(got == batch && got.nonEmpty)
      val prog = q.lastProgress
      assert(prog == null || prog.stateOperators.isEmpty,
        "pitch twin must not carry streaming state")
    } finally q.stop()
  }

  test("streaming binidx export writes one shard per batch; re-publish is idempotent") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val vocab = Map("alpha" -> 1, "beta" -> 2, "gamma" -> 3)
    val dir = java.nio.file.Files.createTempDirectory("streamshards").toString
    def run(data: Seq[Seq[StreamDoc]]): Unit = {
      val in = MemoryStream[StreamDoc]
      var batches = Vector.empty[(Long, Long)]
      val q = StreamingOps.tokenShardExportStream(in.toDF(), vocab, dir) {
        (bid, n) => batches :+= ((bid, n))
      }.start()
      try {
        data.foreach { b => in.addData(b: _*); q.processAllAvailable() }
        assert(batches.map(_._2).sum == data.map(_.size).sum)
      } finally q.stop()
    }
    run(Seq(
      Seq(StreamDoc(1L, ts(0), "alpha beta"), StreamDoc(2L, ts(1), "beta unknown")),
      Seq(StreamDoc(3L, ts(2), "gamma gamma alpha"))))
    def snapshot(): Map[Long, Seq[Int]] =
      graft.sources.TokenShards.read(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Int](r.fieldIndex("ids"))).toMap
    val first = snapshot()
    assert(first == Map(1L -> Seq(1, 2), 2L -> Seq(2, 0), 3L -> Seq(3, 3, 1)),
      s"shard contents diverged from the vocabulary encoding: $first")
    assert(new java.io.File(dir).list().count(_.endsWith(".bin")) == 2,
      "expected exactly one shard file per micro-batch")
    // a fresh query re-publishing batch 0 with the same rows lands on
    // byte-identical shards: the atomic overwrite makes replay a no-op
    run(Seq(Seq(StreamDoc(1L, ts(0), "alpha beta"), StreamDoc(2L, ts(1), "beta unknown"))))
    assert(snapshot() == first, "re-publishing a batch changed the artifact")
  }

  test("crawl → trainer bytes end-to-end: WARC segments landing in the drop dir stream into binidx shards") {
    // the whole ingest path as ONE streaming query, no batch job anywhere:
    // [crawl segment files] → WarcDocs.readStream (documents contract)
    //   → tokenShardExportStream (vocab encode → atomic binidx publish)
    def rec(uri: String, body: String): Array[Byte] =
      (s"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: $uri\r\n" +
        s"WARC-Date: 2026-07-01T00:00:00Z\r\n" +
        s"Content-Length: ${body.getBytes("UTF-8").length}\r\n\r\n").getBytes("ISO-8859-1") ++
        body.getBytes("UTF-8") ++ "\r\n\r\n".getBytes("ISO-8859-1")
    val drop = java.nio.file.Files.createTempDirectory("crawl-drop").toString
    val shards = java.nio.file.Files.createTempDirectory("crawl-shards").toString
    val vocab = Map("alpha" -> 1, "beta" -> 2, "gamma" -> 3)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$drop/seg-0.warc"),
      rec("http://e2e.example/1", "alpha beta") ++ rec("http://e2e.example/2", "beta unknown gamma"))
    var batches = Vector.empty[(Long, Long)]
    val q = StreamingOps.tokenShardExportStream(
      graft.sources.WarcDocs.readStream(spark, drop), vocab, shards) {
      (bid, n) => batches :+= ((bid, n))
    }.start()
    try {
      q.processAllAvailable()
      // a segment landing later extends the corpus in place: its own shard
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$drop/seg-1.warc"),
        rec("http://e2e.example/3", "gamma gamma"))
      q.processAllAvailable()
    } finally q.stop()
    assert(batches.map(_._2).sum == 3, s"expected 3 documents through the pipe: $batches")
    // the published bytes decode to exactly the vocab-encode of the batch
    // WARC read — stream and batch agree from crawl bytes to trainer ids
    val back = graft.sources.TokenShards.read(spark, shards).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](3)).toMap
    val expected = graft.sources.WarcDocs.read(spark, drop).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ", -1).map(t => vocab.getOrElse(t, 0)).toSeq).toMap
    assert(back == expected, "trainer bytes diverge from the batch-read encode")
  }

  test("streaming binidx export: empty micro-batch reports 0 rows even over a stale shard file") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("streamshards-stale").toString
    // a prior run in the same dir left a batch-1 shard pair (2 fake docs);
    // without the pre-write clear the empty batch 1 below would report 2
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/shard-1.idx"), new Array[Byte](40))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/shard-1.bin"), new Array[Byte](8))
    val in = MemoryStream[StreamDoc]
    var batches = Vector.empty[(Long, Long)]
    val q = StreamingOps.tokenShardExportStream(in.toDF(), Map("alpha" -> 1), dir) {
      (bid, n) => batches :+= ((bid, n))
    }.start()
    try {
      in.addData(StreamDoc(1L, ts(0), "alpha")); q.processAllAvailable()
      in.addData(Seq.empty[StreamDoc]: _*); q.processAllAvailable()
    } finally q.stop()
    assert(batches == Vector((0L, 1L), (1L, 0L)),
      s"empty batch metric contaminated by directory state: $batches")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/shard-1.idx")),
      "stale shard file survived an empty batch")
  }

  test("streaming image dedup probes the prebuilt index like the batch operator, statelessly") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val corpus = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    // arriving docs: two byte-identical re-crawls of corpus documents
    // (hamming 0 against their originals) and two genuinely new payloads
    val recrawled = corpus.filter(col("doc_id") < 2).collect()
      .map(r => StreamDoc(r.getLong(0) + 5000000L, ts(0), r.getString(1)))
    val novel = Seq(StreamDoc(7000001L, ts(1), "wholly unseen payload alpha"),
      StreamDoc(7000002L, ts(1), "wholly unseen payload beta"))
    val in = MemoryStream[StreamDoc]
    var got = Vector.empty[(Long, String, Long)]
    val q = StreamingOps.imageDedupAgainstIndex(in.toDF(), corpus) { (df, _) =>
      got ++= df.collect().map(r =>
        (r.getLong(0), r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
    }.start()
    try {
      in.addData(recrawled.toIndexedSeq: _*); q.processAllAvailable()
      in.addData(novel: _*); q.processAllAvailable()
      val prog = q.lastProgress
      assert(prog == null || prog.stateOperators.isEmpty,
        "image dedup twin must not carry streaming state")
    } finally q.stop()
    val byId = got.map(t => t._1 -> (t._2, t._3)).toMap
    recrawled.foreach { d =>
      assert(byId(d.doc_id) == (("near_dup", d.doc_id - 5000000L)),
        s"re-crawled ${d.doc_id}: ${byId(d.doc_id)}")
    }
    novel.foreach { d =>
      assert(byId(d.doc_id)._1 == "novel", s"unseen ${d.doc_id}: ${byId(d.doc_id)}")
    }
    // and the stream's verdicts are exactly the batch operator's on the
    // same signatures against the same index — one rule, two surfaces
    val index = graft.queries.PipelineQueries.prepareImageIndex(
      graft.queries.PipelineQueries.imageSignatures(corpus))
    val batchGot = graft.queries.PipelineQueries.imageDedupProbe(
        graft.queries.PipelineQueries.imageSignatures(
          (recrawled ++ novel).map(d => (d.doc_id, d.text)).toSeq.toDF("doc_id", "text")),
        index).collect()
      .map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toSet
    assert(got.toSet == batchGot, "stream verdicts diverge from the batch operator")
  }

  test("streaming video dedup flags trimmed re-uploads against the prebuilt frame index, statelessly") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, length => sqlen}
    val corpus = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    // a long corpus video, trimmed like m8's planted variants → near_dup;
    // plus a genuinely new payload → novel
    val (srcId, srcText) = corpus
      .filter(sqlen(col("text")) > graft.queries.PipelineQueries.M8Chunk +
        graft.queries.PipelineQueries.M8Trim)
      .orderBy("doc_id").collect().head match {
      case r => (r.getLong(0), r.getString(1))
    }
    val trimmed = StreamDoc(9000001L, ts(0),
      srcText.substring(0, srcText.length - graft.queries.PipelineQueries.M8Trim))
    val unseen = StreamDoc(9000002L, ts(1), "x " * 300)
    val in = MemoryStream[StreamDoc]
    var got = Map.empty[Long, (String, Long)]
    val q = StreamingOps.videoDedupAgainstIndex(in.toDF(), corpus) { (df, _) =>
      got ++= df.collect().map(r =>
        r.getLong(0) -> ((r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))))
    }.start()
    try {
      in.addData(trimmed); q.processAllAvailable()
      in.addData(unseen); q.processAllAvailable()
      val prog = q.lastProgress
      assert(prog == null || prog.stateOperators.isEmpty,
        "video dedup twin must not carry streaming state")
    } finally q.stop()
    assert(got(trimmed.doc_id) == (("near_dup", srcId)),
      s"trimmed re-upload not flagged: ${got(trimmed.doc_id)}")
    assert(got(unseen.doc_id)._1 == "novel", s"unseen flagged: ${got(unseen.doc_id)}")
    // verdict-for-verdict the batch probe's output — one rule, two surfaces
    val index = graft.queries.PipelineQueries.prepareVideoIndex(corpus)
    val batchGot = graft.queries.PipelineQueries.videoDedupProbe(
        Seq((trimmed.doc_id, trimmed.text), (unseen.doc_id, unseen.text))
          .toDF("doc_id", "text"), index).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    assert(got == batchGot, "stream verdicts diverge from the batch probe")
  }

  test("persistent changelog apply survives a query restart: state reloads, committed batches don't reapply") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    def rowSet(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val (vOld, vNew) = graft.queries.RelationalQueries.snapshotPair(spark, sf)
    val initial = vOld.select(col("k_old").as("k"), col("old_status").as("status"))
    val log = graft.queries.RelationalQueries.k8SnapshotDiff(spark, sf).collect()
      .map(r => ChangeRow(r.getLong(0), r.getString(1), r.getString(3)))
    val batches = log.groupBy(_.k % 3).toSeq.sortBy(_._1).map(_._2.toSeq)
    val st = java.nio.file.Files.createTempDirectory("graft-cdc-state").toString
    val cp = java.nio.file.Files.createTempDirectory("graft-cdc-cp").toString
    // run A: two batches land, then the query is killed
    val in1 = MemoryStream[ChangeRow]
    var seen1 = Vector.empty[Long]
    val q1 = StreamingOps.changelogApplyStreamPersistent(in1.toDF(), initial, st) {
      (_, bid) => seen1 :+= bid
    }.option("checkpointLocation", cp).start()
    try {
      in1.addData(batches(0): _*); q1.processAllAvailable()
      in1.addData(batches(1): _*); q1.processAllAvailable()
    } finally q1.stop()
    assert(seen1 == Vector(0L, 1L))
    // a torn write from the "crash": an uncommitted snapshot dir (no
    // _SUCCESS) with a higher id must be invisible to recovery
    val torn = java.nio.file.Paths.get(s"$st/snapshot-9")
    java.nio.file.Files.createDirectories(torn)
    java.nio.file.Files.write(torn.resolve("part-00000.parquet"), Array[Byte](1))
    // restart: fresh driver state (new writer, new vars), same checkpoint +
    // state dir; the source re-serves all blocks, committed offsets skip
    val in2 = MemoryStream[ChangeRow]
    batches.foreach(b => in2.addData(b: _*))
    var seen2 = Vector.empty[(Long, Set[(Long, String)])]
    val q2 = StreamingOps.changelogApplyStreamPersistent(in2.toDF(), initial, st) {
      (snap, bid) => seen2 :+= ((bid, rowSet(snap)))
    }.option("checkpointLocation", cp).start()
    try q2.processAllAvailable() finally q2.stop()
    // only the unseen batch fired, and the final snapshot equals applying
    // ALL THREE batches — batches 0/1 came back from the persisted state,
    // not from replay and not from a reset to `initial`
    assert(seen2.map(_._1) == Vector(2L),
      s"restart re-fired committed batches: ${seen2.map(_._1)}")
    assert(seen2.last._2 == rowSet(vNew),
      "restarted apply lost the persisted state")
    // the persisted artifact is the target too, keyed by the last batch,
    // and older snapshots are GC'd while the torn dir stayed invisible
    val (loaded, bid) = StreamingOps.loadChangelogSnapshot(spark, st).get
    assert(bid == 2L && rowSet(loaded) == rowSet(vNew))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$st/snapshot-0")) &&
      !java.nio.file.Files.exists(java.nio.file.Paths.get(s"$st/snapshot-1")),
      "stale snapshots not GC'd")
  }

  test("bucketed changelog apply: only touched buckets rewrite, untouched files stay byte-identical, restart-safe at a 10⁶-row target") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val nB = 64
    val initial = spark.range(1000000L)
      .selectExpr("id AS k", "concat('s', id % 5) AS status")
    val st = java.nio.file.Files.createTempDirectory("graft-cdc-bkt").toString
    val cp = java.nio.file.Files.createTempDirectory("graft-cdc-bkt-cp").toString
    StreamingOps.prepareBucketedChangelogTarget(initial, st, nB)
    // fingerprint every seed file: (path -> (bytes, mtime)); the prune claim
    // is that a batch never touches these
    def seedFiles(): Map[String, (Long, java.nio.file.attribute.FileTime)] = {
      val root = java.nio.file.Paths.get(s"$st/seed")
      val walk = java.nio.file.Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
          .map(p => p.toString ->
            ((java.nio.file.Files.size(p), java.nio.file.Files.getLastModifiedTime(p))))
          .toMap
      } finally walk.close()
    }
    def bucketBytes(): Long = {
      val root = java.nio.file.Paths.get(st)
      val walk = java.nio.file.Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala
          .filter(p => java.nio.file.Files.isRegularFile(p) &&
            p.toString.contains("/b"))
          .filterNot(_.toString.contains("/seed/")).map(java.nio.file.Files.size(_)).sum
      } finally walk.close()
    }
    val seedBefore = seedFiles()
    val seedTotal = seedBefore.values.map(_._1).sum
    val b0 = Seq(ChangeRow(10L, "U", "u0"), ChangeRow(999999L, "U", "u1"),
      ChangeRow(500000L, "U", "u2"))
    val b1 = Seq(ChangeRow(1000001L, "I", "fresh"), ChangeRow(20L, "D", null))
    val b2 = Seq(ChangeRow(30L, "U", "u3"))
    // run A: two batches land, then the query dies
    val in1 = MemoryStream[ChangeRow]
    var seen1 = Vector.empty[Long]
    val q1 = StreamingOps.changelogApplyStreamBucketed(in1.toDF(), st, nB) {
      (_, bid) => seen1 :+= bid
    }.option("checkpointLocation", cp).start()
    try {
      in1.addData(b0: _*); q1.processAllAvailable()
      in1.addData(b1: _*); q1.processAllAvailable()
    } finally q1.stop()
    assert(seen1 == Vector(0L, 1L))
    // THE PRUNE, measured: every seed file untouched byte-for-byte, and the
    // rewritten volume is a few buckets of a 64-bucket target, never the
    // target (5 touched keys → ≤5 buckets → ≲5/64 ≈ 8% + parquet overhead)
    assert(seedFiles() == seedBefore, "a batch rewrote untouched seed files")
    val rewritten = bucketBytes()
    assert(rewritten > 0 && rewritten < seedTotal / 4,
      s"write volume not pruned: $rewritten of $seedTotal seed bytes")
    // torn bucket write from the crash: no _SUCCESS → invisible to recovery
    val torn = java.nio.file.Paths.get(s"$st/b3/snapshot-9")
    java.nio.file.Files.createDirectories(torn)
    java.nio.file.Files.write(torn.resolve("part-00000.parquet"), Array[Byte](1))
    // restart: fresh driver state, same checkpoint; committed batches skip
    val in2 = MemoryStream[ChangeRow]
    Seq(b0, b1, b2).foreach(b => in2.addData(b: _*))
    var seen2 = Vector.empty[Long]
    val q2 = StreamingOps.changelogApplyStreamBucketed(in2.toDF(), st, nB) {
      (_, bid) => seen2 :+= bid
    }.option("checkpointLocation", cp).start()
    try q2.processAllAvailable() finally q2.stop()
    assert(seen2 == Vector(2L), s"restart re-fired committed batches: $seen2")
    // the final view equals the three batches applied to the initial state
    val expected = Seq(b0, b1, b2).map(_.toDF())
      .foldLeft(initial)(graft.queries.RelationalQueries.applyChangelog)
    val got = StreamingOps.loadBucketedSnapshot(spark, st, nB)
    assert(got.count() == 1000000L)
    assert(expected.except(got).isEmpty && got.except(expected).isEmpty,
      "bucketed target diverged from the global merge")
  }

  test("bucketed changelog: an empty initial target is a valid empty layout, not a crash") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val nB = 8
    val st = java.nio.file.Files.createTempDirectory("graft-cdc-empty").toString
    val cp = java.nio.file.Files.createTempDirectory("graft-cdc-empty-cp").toString
    // empty seed: _SUCCESS lands but zero bkt= partitions exist
    StreamingOps.prepareBucketedChangelogTarget(
      Seq.empty[(Long, String)].toDF("k", "status"), st, nB)
    // the view over the empty layout must be an empty (k, status) frame —
    // the reduce over zero buckets used to throw UnsupportedOperationException
    val view0 = StreamingOps.loadBucketedSnapshot(spark, st, nB)
    assert(view0.isEmpty && view0.columns.toSeq == Seq("k", "status"))
    // and the stream over it works end to end: first batch inserts into
    // buckets that have neither seed partition nor committed snapshot
    val in = MemoryStream[ChangeRow]
    var last: Set[(Long, String)] = null
    val q = StreamingOps.changelogApplyStreamBucketed(in.toDF(), st, nB) {
      (snap, _) => last = snap.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    }.option("checkpointLocation", cp).start()
    try {
      in.addData(ChangeRow(1L, "I", "a"), ChangeRow(2L, "I", "b"))
      q.processAllAvailable()
    } finally q.stop()
    assert(last == Set((1L, "a"), (2L, "b")))
  }

  test("streaming changelog apply lands on the target snapshot and replays are no-ops") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    def rowSet(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val (vOld, vNew) = graft.queries.RelationalQueries.snapshotPair(spark, sf)
    val log = graft.queries.RelationalQueries.k8SnapshotDiff(spark, sf).collect()
      .map(r => ChangeRow(r.getLong(0), r.getString(1), r.getString(3)))
    assert(log.map(_.op).toSet == Set("I", "U", "D"), "fixture lacks an op kind")
    // the CDC feed arrives as 3 micro-batches (split by key — a k8 log has
    // one op per key, so ANY split is a valid arrival order)
    val batches = log.groupBy(_.k % 3).toSeq.sortBy(_._1).map(_._2.toSeq)
    assert(batches.size == 3)
    val in = MemoryStream[ChangeRow]
    var snaps = Vector.empty[(Long, Set[(Long, String)])]
    val q = StreamingOps.changelogApplyStream(in.toDF(),
      vOld.select(col("k_old").as("k"), col("old_status").as("status"))) {
      (snap, id) => snaps :+= ((id, rowSet(snap)))
    }.start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      val target = rowSet(vNew)
      assert(snaps.size == 3 && snaps.last._2 == target,
        "streamed apply did not land on the target snapshot")
      // intermediate snapshots are the partial applies, not the target
      assert(snaps.head._2 != target)
      // replayed micro-batch: the idempotent MERGE leaves the snapshot as-is
      in.addData(batches.last: _*); q.processAllAvailable()
      assert(snaps.last._2 == target, "replayed batch changed the snapshot")
      // no streaming state beyond the source checkpoint
      val prog = q.lastProgress
      assert(prog == null || prog.stateOperators.isEmpty,
        "changelog twin must not carry streaming state")
    } finally q.stop()
    // a batch with TWO ops for one key is undefined for the merge rule
    // (no order to collapse by) — it must fail loudly, not mis-merge
    val in2 = MemoryStream[ChangeRow]
    val q2 = StreamingOps.changelogApplyStream(in2.toDF(),
      vOld.select(col("k_old").as("k"), col("old_status").as("status"))) {
      (_, _) => ()
    }.start()
    try {
      in2.addData(ChangeRow(999999L, "I", "A"), ChangeRow(999999L, "D", null))
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
      assert(ex.getMessage.contains("multiple ops") ||
        Option(ex.getCause).exists(_.getMessage.contains("multiple ops")))
    } finally q2.stop()
  }
}

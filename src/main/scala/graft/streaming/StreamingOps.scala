package graft.streaming

import graft.Ckpt._
import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event on the stream (mirrors the batch `events` table schema). */
final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

/** A document arriving on an ingest stream. */
final case class StreamDoc(doc_id: Long, ts: Timestamp, text: String)

/** A document arriving with its source/domain attribution (the x22 quota
  * twin's input shape).
  */
final case class SourcedDoc(doc_id: Long, ts: Timestamp, source: String)

/** An embedding arriving on a vector-ingest stream (the sim7 twin's input
  * shape; nrm precomputed at embed time, as a feature store would).
  */
final case class StreamVec(vec_id: Long, v: Array[Double], nrm: Double)

/** One I/U/D changelog row arriving on a CDC feed (the k10 twin's input
  * shape; `new_status` is null for deletes, as a Debezium payload would be).
  */
final case class ChangeRow(k: Long, op: String, new_status: String)

/** A document arriving with text AND source attribution — the composed
  * curation ingest's input shape (normalize/quality need the text, quota
  * needs the source).
  */
final case class IngestDoc(doc_id: Long, ts: Timestamp, text: String,
    source: String)

/** One bucket of a CLOSED hour window's drift report (the x24 twin). */
final case class DriftRow(window_start_us: Long, b: Int, cnt: Long,
    cand_ppm: Long, ref_ppm: Long, tv_contrib_ppm: Long)

private final case class DriftState(counts: Map[Int, Long])

/** An admission issued by the streaming per-source quota: rank is the
  * document's 1-based position among its source's admitted documents.
  */
final case class Admission(doc_id: Long, source: String, ts: Timestamp,
    admitted_rank: Long)

/** A closed user session emitted by the stateful sessionizer. */
final case class Session(user_id: Long, session_start_us: Long,
    session_end_us: Long, n_events: Long, total_value: Double)

private final case class SessionState(startUs: Long, endUs: Long,
    n: Long, total: Double)

/** One trending row: a top-k event type of a CLOSED hour window. */
final case class Trending(window_start_us: Long, rank: Int,
    event_type: String, n_events: Long)

private final case class TrendState(counts: Map[String, Long])

/** A funnel outcome: emitted the moment a user converts (stage 3), or at
  * the abandonment horizon with the furthest stage reached.
  */
final case class FunnelOutcome(user_id: Long, stage: Int,
    view_us: Option[Long], click_us: Option[Long], purchase_us: Option[Long],
    converted: Boolean)

private final case class FunnelState(stage: Int, t1: Long, t2: Long,
    t3: Long, lastUs: Long)

/** Structured Streaming operators over the events stream — the streaming
  * counterparts of the batch `s_tumbling_window` and `w3_sessionize`
  * operators, built on watermarks + windowed aggregation and
  * `flatMapGroupsWithState` respectively.
  *
  * Scale notes: both transforms are keyed (window key / user_id), so state is
  * hash-partitioned across executors and bounded — the windowed agg drops
  * state past the watermark, and the sessionizer closes (and frees) a user's
  * state after the 30-minute gap timeout. Nothing buffers the raw stream.
  */
object StreamingOps {

  /** Watermarked tumbling hourly count/sum per event type — streaming analog
    * of the batch tumbling-window query; late events beyond 2 hours are
    * dropped instead of reopening windows.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Sessionization via Spark's BUILT-IN `session_window` aggregation — the
    * no-custom-state-code twin of [[sessionize]] (which demonstrates
    * `flatMapGroupsWithState`): the engine itself merges overlapping
    * [event, event+gap) ranges, Append emits each (user, session) row
    * exactly once when the watermark passes the session end, and state per
    * group is the engine's merged-window aggregate — no user code to leak
    * it. Output schema matches [[Session]] so the two formulations are
    * directly comparable — including the boundary: the engine merges a
    * gap of EXACTLY the session gap (inclusive-end window overlap), which
    * is precisely w3's `gap > 30 min` keep rule, so all three
    * formulations (batch window, custom state, built-in) agree everywhere
    * (the spec pins the exact-gap case).
    */
  def sessionWindowCounts(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(col("user_id"),
        expr("unix_micros(sw.start)").as("session_start_us"),
        expr(s"unix_micros(sw.end) - ${gapUs}L").as("session_end_us"),
        col("n_events"), col("total_value"))
  }

  /** Windowed approximate distinct users — the streaming twin of the batch
    * `a8s` HLL query. The HLL++ buffer is exactly what incremental
    * aggregation state wants to be: constant-size per (window, type) group
    * and mergeable, so each micro-batch folds into it without ever holding
    * the user-id set, and the watermark bounds how many window states live
    * at once. An EXACT streaming distinct would have to keep every id seen
    * per open window in state — unbounded in the hot dimension.
    */
  def approxDistinctUsers(events: DataFrame, rsd: Double = 0.02): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("approx_users"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("approx_users"))

  /** Streaming exact dedup — the ingest-time twin of the batch
    * `d1_exact_dedup` operator: first-seen wins on content hash, and
    * `dropDuplicatesWithinWatermark` evicts a hash's state once the
    * watermark passes it, so an unbounded corpus never accumulates
    * unbounded state (the knob is the watermark delay = the horizon within
    * which a re-crawled copy counts as a duplicate). State is
    * hash-partitioned on the content hash across executors.
    */
  def dedupByContent(docs: DataFrame, delay: String = "1 hour"): DataFrame =
    docs
      .withWatermark("ts", delay)
      .withColumn("content_hash", md5(col("text")))
      .dropDuplicatesWithinWatermark("content_hash")

  /** Stream–static enrichment join: each micro-batch of events joins a
    * static dimension (user → segment, device → model, …) that Spark re-reads
    * per batch, so slowly-changing dimensions pick up updates without a
    * restart. The static side is the build side (broadcast when small, which
    * a dimension keyed for enrichment should be); the stream never buffers —
    * stream–static inner/left joins are stateless by construction, so this
    * costs state exactly nothing regardless of stream length.
    */
  def enrichAgainstStatic(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Streaming decontamination — the ingest-time twin of the batch
    * `d7_contamination` screen: every arriving document is scored against
    * the held-out eval set's hashed n-grams and annotated with `n_shared`
    * (callers drop `n_shared > 0` or route them to quarantine). The eval
    * gram set is STATIC by definition (a benchmark release), so it is
    * collected once at query start and broadcast; each micro-batch then
    * pays a narrow per-partition membership pass — no join, no state, so
    * stream length costs nothing. When the eval set outgrows a broadcast
    * set, swap in a bloom filter the same way d7's scale note describes.
    */
  /** THE single per-document contamination rule — distinct 4-gram overlap
    * with the hashed eval set — shared by [[screenContamination]] and the
    * composed [[curateIngest]] so the two screens cannot drift.
    */
  private[graft] def sharedGramCount(text: String, evalSet: Set[String]): Long = {
    val w = text.split(" ", -1)
    if (w.length < 4) 0L
    else (0 to w.length - 4).iterator
      .map(i => w.slice(i, i + 4).mkString(" "))
      .toSet[String]
      .count(g => evalSet.contains(graft.functions.Hashing.md5Hex16(g)))
      .toLong
  }

  def screenContamination(docs: Dataset[StreamDoc], evalGrams: DataFrame): Dataset[(Long, Timestamp, String, Long)] = {
    import docs.sparkSession.implicits._
    val bc = docs.sparkSession.sparkContext.broadcast(
      evalGrams.select("gh").collect().map(_.getString(0)).toSet)
    docs.mapPartitions { it =>
      val set = bc.value
      it.map(d => (d.doc_id, d.ts, d.text, sharedGramCount(d.text, set)))
    }.toDF("doc_id", "ts", "text", "n_shared").as[(Long, Timestamp, String, Long)]
  }

  /** Streaming incremental dedup — the ingest-time twin of the batch
    * `d10_incremental_dedup` operator: each arriving micro-batch of
    * documents is screened against the STATIC corpus index (exact content
    * hash, then MinHash band candidates + exact-Jaccard verify) and its
    * per-document verdict handed to `onBatch` with the batch id. Runs the
    * batch operator per micro-batch via foreachBatch — the
    * SonarStreamIngest discipline — so the only streaming state is the
    * source checkpoint. The [[graft.queries.PipelineQueries.CorpusIndex]]
    * is built ONCE at query start (hash/signature/band tables checkpointed,
    * hot bands measured), so a batch pays only its own signature pass plus
    * the joins — the corpus is never re-read or re-shingled per trigger.
    * Verdicts are a pure function of (batch, index); `onBatch` receives the
    * foreachBatch `batchId` so its sink writes can be made idempotent under
    * replay (overwrite-by-batchId, the standard pattern). Within-stream
    * duplicates are `dedupByContent`'s job upstream, exactly as
    * within-corpus dedup is d1/d2's job in the batch pipeline.
    */
  def dedupAgainstIndex(docs: DataFrame, corpus: DataFrame)(
      onBatch: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val index = graft.queries.PipelineQueries.prepareCorpusIndex(corpus)
    docs.writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // checkpoint the (tiny) batch projection once: the exact tier, the
        // signature pass, and the final left joins each act on it, and an
        // unpersisted micro-batch frame would recompute from the source per
        // job
        val b = batch.select("doc_id", "text").lossTolerantCheckpoint()
        onBatch(graft.queries.PipelineQueries.incrementalDedup(b, index), batchId)
      }
  }

  /** Streaming binidx EXPORT — pipe3's byte-level sink maintained
    * incrementally, the last meter of the ingest→trainer path: each
    * micro-batch tokenizes through the PINNED vocabulary artifact (the
    * tokenization twin's zero-state encoding — the map rides the plan as
    * literals), becomes ONE binidx shard named by its batch id, and
    * publishes through [[graft.sources.TokenShards]]' atomic-rename write.
    * A replayed micro-batch therefore overwrites ITS OWN shard with
    * byte-identical content — the overwrite-by-batchId idempotency that
    * makes restart-after-partial-write safe — and existing shards are
    * never rewritten, which is how a nightly crawl extends a training
    * corpus in place. Within-shard order is doc_id (a pure function of
    * the rows, replay-stable). Zero streaming state beyond the source
    * checkpoint; cross-batch duplicates are the upstream dedup twin's job,
    * exactly as within-corpus dedup is d1/d2's in the batch pipeline.
    */
  def tokenShardExportStream(docs: DataFrame, vocab: Map[String, Int], dir: String)(
      onBatch: (Long, Long) => Unit = (_, _) => ())
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val m = map(vocab.toSeq.sortBy(_._1)
      .flatMap { case (t0, id) => Seq(lit(t0), lit(id)) }.toIndexedSeq: _*)
    docs.writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val enc = batch.select(col("doc_id"), col("text"))
          .withColumn("ids",
            transform(split(col("text"), " "), tk => coalesce(element_at(m, tk), lit(0))))
          .withColumn("shard", lit(batchId))
          .withColumn("pos", col("doc_id"))
          .select("doc_id", "shard", "pos", "ids")
        // clear THIS batch's shard pair first (idx — the commit marker —
        // before bin), so the post-write directory state is authoritative
        // for the metric: an EMPTY micro-batch writes no file, and without
        // this a leftover shard-$batchId from a prior run in the same dir
        // would be counted as the current batch's rows. A replayed
        // non-empty batch just re-deletes then republishes identical
        // bytes; other batches' shards are never touched.
        val idx = java.nio.file.Paths.get(s"$dir/shard-$batchId.idx")
        java.nio.file.Files.deleteIfExists(idx)
        java.nio.file.Files.deleteIfExists(
          java.nio.file.Paths.get(s"$dir/shard-$batchId.bin"))
        graft.sources.TokenShards.write(enc, dir, nShards = 1)
        // row count for the metric comes from the written idx artifact
        // (one fixed 20-byte record per document), NOT from enc.count() —
        // a second action would re-run the whole tokenize/encode plan
        val n = if (java.nio.file.Files.exists(idx))
          java.nio.file.Files.size(idx) / 20 else 0L
        onBatch(batchId, n)
      }
  }

  /** Streaming audio feature extraction — the ingest-time twin of the
    * batch `m4_audio_features`, and the multimodal member of the stateless
    * family (normalizer/chunker/classifier/tokenizer): arriving documents
    * run the SAME synth → WAV-codec roundtrip → frame → integer-feature
    * core ([[graft.queries.PipelineQueries.audioFrameFeatures]], one
    * definition), a narrow mapPartitions per micro-batch — no watermark,
    * no state store, so the plan carries zero state operators and replayed
    * batches emit identical frames (a pure per-row function).
    */
  def audioFeaturesStream(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    graft.queries.PipelineQueries.audioFrameFeatures(
      docs.select(col("doc_id"), col("text")).as[(Long, String)])
  }

  /** Streaming audio pitch — m5's ingest twin: the SAME
    * [[graft.queries.PipelineQueries.audioPitch]] core (synth → WAV
    * roundtrip → autocorrelation argmax), a stateless narrow mapPartitions
    * per micro-batch with zero state operators, spec-pinned doc-for-doc to
    * the batch operator.
    */
  def audioPitchStream(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    graft.queries.PipelineQueries.audioPitch(
      docs.select(col("doc_id"), col("text")).as[(Long, String)])
  }

  /** Streaming changelog apply — the ingest-time twin of the batch
    * `k10_changelog_apply`, and the CDC member of the foreachBatch family:
    * micro-batches of I/U/D changelog rows (`k`, `op`, `new_status`) — a
    * Debezium/CDC feed's shape — MERGE onto an evolving snapshot via the
    * batch operator's exact rule
    * ([[graft.queries.RelationalQueries.applyChangelog]], ONE definition of
    * the merge). In production the snapshot is a key-bucketed lakehouse
    * table and foreachBatch runs MERGE INTO against it; here the applied
    * snapshot is handed to `onBatch` with the batch id and threaded to the
    * next trigger, localCheckpointed per batch so lineage stays bounded
    * over an unbounded stream (the iterative-algorithm discipline). The
    * merge rule anti-joins on ALL batch keys, so re-applying a replayed
    * micro-batch is a NO-OP — the sink-side idempotency CDC replay needs.
    * Per trigger the log side is the small side (broadcast); the snapshot
    * never shuffles. No streaming state exists beyond the source
    * checkpoint and the snapshot itself — exactly the state a MERGE INTO
    * target holds.
    *
    * Restart caveat: this demo form keeps the snapshot only in driver
    * memory (the `snapshot` var). After a QUERY RESTART the var resets to
    * `initial` while the source checkpoint does NOT replay committed
    * batches, so previously applied changelogs are lost — the idempotency
    * claim covers same-process replays only. The restart-surviving form is
    * [[changelogApplyStreamPersistent]], which persists the snapshot keyed
    * by the last applied batchId and reloads it on start.
    */
  def changelogApplyStream(log: DataFrame, initial: DataFrame)(
      onBatch: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    var snapshot = initial.select("k", "status").lossTolerantCheckpoint()
    log.writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.select("k", "op", "new_status").lossTolerantCheckpoint()
        // The merge rule is only defined for one NET op per key — a raw
        // Debezium batch can hold I-then-D sequences for one key, and the
        // row set alone carries no order to collapse them by, so applying
        // it blind would resurrect deleted keys or duplicate inserted
        // ones. Enforce the precondition loudly (one metadata-cheap job
        // over the log-sized batch); the producer collapses to net ops by
        // its sequence number (LSN) BEFORE the feed, which is also what
        // makes the feed replayable at-least-once.
        val multi = b.groupBy("k").count().filter(col("count") > 1).limit(1).count()
        require(multi == 0L,
          s"micro-batch $batchId carries multiple ops for one key: collapse " +
            "the CDC feed to net per-key ops (by LSN) before applying")
        snapshot = graft.queries.RelationalQueries
          .applyChangelog(snapshot, b).lossTolerantCheckpoint()
        onBatch(snapshot, batchId)
      }
  }

  /** PRODUCTION form of [[changelogApplyStream]]: the evolving snapshot is
    * PERSISTED, so the MERGE target survives a query restart — the missing
    * half of the CDC story the demo form documents away. After each applied
    * batch the snapshot is written to `stateDir/snapshot-<batchId>` (parquet
    * with Spark's `_SUCCESS` commit marker — a crash mid-write leaves an
    * uncommitted directory that discovery ignores and replay overwrites),
    * older committed snapshots are GC'd, and on (re)start the latest
    * committed snapshot is reloaded in place of `initial`. The skip rule
    * `batchId <= lastApplied` makes the one replayable batch — the crash
    * window between the snapshot commit and the source-checkpoint commit —
    * a no-op, so the apply is exactly-once onto the persisted target.
    *
    * This is the library rendering of "the MERGE INTO target IS the
    * persistence": on a lakehouse the snapshot table itself plays the
    * `snapshot-<batchId>` role (with the batchId in the table's commit
    * metadata, the standard idempotent-MERGE pattern), and the per-batch
    * merge is the same key-bucketed join — the log side broadcasts, the
    * snapshot never shuffles. Per-batch write volume is the snapshot, not
    * the log — right for the dimension-table CDC this models; a fact-sized
    * target is where the real MERGE INTO's file-level pruning takes over.
    */
  def changelogApplyStreamPersistent(log: DataFrame, initial: DataFrame,
      stateDir: String)(
      onBatch: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    var snapshot: DataFrame = null
    var lastApplied = -1L
    log.writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (snapshot == null) { // first batch after (re)start: recover state
          loadChangelogSnapshot(batch.sparkSession, stateDir) match {
            case Some((df, bid)) => snapshot = df.lossTolerantCheckpoint(); lastApplied = bid
            case None => snapshot = initial.select("k", "status").lossTolerantCheckpoint()
          }
        }
        if (batchId <= lastApplied) {
          // replayed batch already folded into the persisted snapshot
          onBatch(snapshot, batchId)
        } else {
          val b = batch.select("k", "op", "new_status").lossTolerantCheckpoint()
          // same net-op precondition as the demo form (see its comment)
          val multi = b.groupBy("k").count().filter(col("count") > 1).limit(1).count()
          require(multi == 0L,
            s"micro-batch $batchId carries multiple ops for one key: collapse " +
              "the CDC feed to net per-key ops (by LSN) before applying")
          snapshot = graft.queries.RelationalQueries
            .applyChangelog(snapshot, b).lossTolerantCheckpoint()
          persistChangelogSnapshot(snapshot, stateDir, batchId)
          lastApplied = batchId
          onBatch(snapshot, batchId)
        }
      }
  }

  /** Latest COMMITTED persisted snapshot under `stateDir`, with its batchId.
    * Committed = the directory carries Spark's `_SUCCESS` marker; torn
    * writes (no marker) are invisible, exactly like TokenShards' torn pairs.
    */
  private[graft] def loadChangelogSnapshot(s: org.apache.spark.sql.SparkSession,
      stateDir: String): Option[(DataFrame, Long)] =
    committedSnapshotIds(s, stateDir).maxOption
      .map(bid => (s.read.parquet(s"$stateDir/snapshot-$bid"), bid))

  /** Write the snapshot for `batchId` and GC older committed ones — only
    * after the new write is fully committed, so there is always at least
    * one committed snapshot on disk once batch 0 lands.
    */
  private[graft] def persistChangelogSnapshot(df: DataFrame, stateDir: String,
      batchId: Long): Unit = {
    df.write.mode("overwrite").parquet(s"$stateDir/snapshot-$batchId")
    gcSnapshotsBelow(df.sparkSession, stateDir, batchId)
  }

  /** Hadoop FileSystem handle for a state path. ALL state-dir existence /
    * listing / GC goes through this — the data path already uses Spark's
    * writers and readers, so routing the bookkeeping through the same
    * FileSystem abstraction is what lets a non-local stateDir (HDFS, S3A)
    * work end to end instead of failing at the first java.nio check.
    */
  private def fsFor(s: org.apache.spark.sql.SparkSession,
      path: String): (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(s.sparkContext.hadoopConfiguration), p)
  }

  /** BatchIds of COMMITTED `snapshot-<id>` children of `dir` (committed =
    * Spark's `_SUCCESS` marker present; torn writes invisible).
    */
  private def committedSnapshotIds(s: org.apache.spark.sql.SparkSession,
      dir: String): Seq[Long] = {
    val (fs, p) = fsFor(s, dir)
    if (!fs.exists(p) || !fs.getFileStatus(p).isDirectory) return Seq.empty
    fs.listStatus(p).toSeq.flatMap { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.startsWith("snapshot-") &&
          fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
        scala.util.Try(n.stripPrefix("snapshot-").toLong).toOption
      else None
    }
  }

  /** Best-effort GC of `snapshot-<id>` children with id < `keep` —
    * committed or torn; a leftover is re-GC'd on the next commit.
    */
  private def gcSnapshotsBelow(s: org.apache.spark.sql.SparkSession,
      dir: String, keep: Long): Unit = {
    val (fs, p) = fsFor(s, dir)
    if (!fs.exists(p)) return
    fs.listStatus(p).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("snapshot-") &&
          scala.util.Try(n.stripPrefix("snapshot-").toLong).toOption.exists(_ < keep))
        try fs.delete(st.getPath, true)
        catch { case _: java.io.IOException => }
    }
  }

  /** Seeds the FACT-SIZED changelog target: the initial snapshot bucketed
    * by key into `nBuckets` hash buckets, one partitioned parquet write
    * (Spark's root `_SUCCESS` is the seed's commit marker). Bucket count is
    * the write-amplification dial: per-batch rewrite volume is
    * touchedBuckets × (rows/nBuckets), so size nBuckets to make a bucket
    * the MERGE rewrite unit you can afford — the library rendering of a
    * lakehouse MERGE INTO's file-level pruning, where the bucket plays the
    * data file.
    */
  def prepareBucketedChangelogTarget(initial: DataFrame, stateDir: String,
      nBuckets: Int): Unit = {
    require(nBuckets >= 1, s"nBuckets must be positive, got $nBuckets")
    initial.select(col("k"), col("status"))
      .withColumn("bkt", pmod(hash(col("k")), lit(nBuckets)))
      // repartition ON the partition column before the partitionBy write
      // (guide §6, the k10b seed's treatment): without it every upstream
      // task fans out across all bucket dirs — tasks × nBuckets splinter
      // files whose per-file open cost every later bucket read pays.
      // Clustered, each bucket is one file; rows are identical either way.
      .repartition(col("bkt"))
      .write.mode("overwrite").partitionBy("bkt").parquet(s"$stateDir/seed")
  }

  /** FACT-SIZED form of [[changelogApplyStreamPersistent]] — the
    * file-pruned MERGE its doc promised: the target lives bucketed by key
    * ([[prepareBucketedChangelogTarget]] runs first), and a micro-batch
    * rewrites ONLY the buckets its keys hash into. Untouched bucket files
    * are never opened, read, or rewritten — byte-identical across the
    * batch (spec-pinned) — so per-batch write volume is proportional to
    * touched buckets, never the target, which is exactly why a 10⁹-row
    * MERGE target is affordable under a trickle of CDC.
    *
    * Crash semantics are PER BUCKET, strictly stronger than the
    * whole-snapshot form's: each touched bucket commits
    * `b<i>/snapshot-<batchId>` (`_SUCCESS`-marked; torn writes invisible),
    * and on replay — including a crash that committed SOME touched buckets
    * but not others — each bucket's own `version >= batchId` check skips
    * exactly the work already folded in, completing the torn batch without
    * double-applying any bucket: exactly-once onto every bucket. Recovery
    * scans bucket versions from the directory layout; a bucket with no
    * committed version reads its seed partition (or starts empty — a key
    * range the seed never held). Per-bucket merge equals the global merge
    * filtered to the bucket because a key hashes to exactly one bucket.
    */
  def changelogApplyStreamBucketed(log: DataFrame, stateDir: String,
      nBuckets: Int)(
      onBatch: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(nBuckets >= 1, s"nBuckets must be positive, got $nBuckets")
    var version: Array[Long] = null // latest committed batchId per bucket; -1 = seed only
    log.writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        require({
            val (fs, _) = fsFor(s, stateDir)
            fs.exists(new org.apache.hadoop.fs.Path(s"$stateDir/seed/_SUCCESS"))
          },
          s"no committed seed under $stateDir — run prepareBucketedChangelogTarget first")
        if (version == null) // first batch after (re)start: recover bucket versions
          version = Array.tabulate(nBuckets)(latestBucketVersion(s, stateDir, _))
        val b = batch.select("k", "op", "new_status")
          .withColumn("bkt", pmod(hash(col("k")), lit(nBuckets))).lossTolerantCheckpoint()
        // same net-op precondition as the whole-snapshot forms
        val multi = b.groupBy("k").count().filter(col("count") > 1).limit(1).count()
        require(multi == 0L,
          s"micro-batch $batchId carries multiple ops for one key: collapse " +
            "the CDC feed to net per-key ops (by LSN) before applying")
        // the file prune: the batch's bucket list (bounded by nBuckets)
        val touched = b.select("bkt").distinct().collect().map(_.getInt(0)).sorted
        touched.foreach { i =>
          if (version(i) < batchId) { // replayed-and-committed buckets skip
            val cur = bucketState(s, stateDir, i, version(i), b)
            val merged = graft.queries.RelationalQueries
              .applyChangelog(cur, b.filter(col("bkt") === i).drop("bkt"))
            merged.write.mode("overwrite")
              .parquet(s"$stateDir/b$i/snapshot-$batchId")
            gcSnapshotsBelow(s, s"$stateDir/b$i", batchId)
            version(i) = batchId
          }
        }
        onBatch(loadBucketedSnapshot(s, stateDir, nBuckets), batchId)
      }
  }

  /** Current state of bucket `i`: its latest committed version, else its
    * seed partition, else empty (schema borrowed from the log batch — a
    * key range the seed never held).
    */
  private def bucketState(s: org.apache.spark.sql.SparkSession, stateDir: String,
      i: Int, v: Long, logBatch: DataFrame): DataFrame =
    if (v >= 0) s.read.parquet(s"$stateDir/b$i/snapshot-$v")
    else {
      val (fs, seed) = fsFor(s, s"$stateDir/seed/bkt=$i")
      if (fs.exists(seed) && fs.getFileStatus(seed).isDirectory)
        s.read.parquet(seed.toString).select("k", "status")
      else logBatch.filter(lit(false))
        .select(col("k"), col("new_status").as("status"))
    }

  private[graft] def latestBucketVersion(s: org.apache.spark.sql.SparkSession,
      stateDir: String, i: Int): Long =
    committedSnapshotIds(s, s"$stateDir/b$i").maxOption.getOrElse(-1L)

  /** The full-target VIEW over the bucketed layout: each bucket's latest
    * committed version, else its seed partition. A lazy union — nothing
    * materializes unless the caller reads it (production queries go
    * straight to the bucket files; this is the API-compatibility view
    * `onBatch` receives).
    */
  private[graft] def loadBucketedSnapshot(s: org.apache.spark.sql.SparkSession,
      stateDir: String, nBuckets: Int): DataFrame =
    (0 until nBuckets).flatMap { i =>
      val v = latestBucketVersion(s, stateDir, i)
      if (v >= 0) Some(s.read.parquet(s"$stateDir/b$i/snapshot-$v"))
      else {
        val (fs, seed) = fsFor(s, s"$stateDir/seed/bkt=$i")
        if (fs.exists(seed) && fs.getFileStatus(seed).isDirectory)
          Some(s.read.parquet(seed.toString).select("k", "status"))
        else None
      }
    }.reduceOption(_.unionByName(_))
      // a layout with no seed partitions and no committed snapshots (empty
      // initial target + an empty first micro-batch) is a valid empty
      // target, not a crash inside foreachBatch
      .getOrElse(s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, status STRING")))

  /** Streaming image near-dup screen — m7's ingest twin and the multimodal
    * member of the against-prebuilt-index family ([[dedupAgainstIndex]] for
    * text, [[annAgainstIndex]] for vectors): the corpus's perceptual
    * signatures become ONE [[graft.queries.PipelineQueries.ImageIndex]] at
    * query start (signature + band tables checkpointed, hot bands
    * measured — bucketed index tables in production); each micro-batch of
    * arriving documents decodes (SqlCodec), hashes, and probes it via
    * foreachBatch running the batch operator's exact
    * [[graft.queries.PipelineQueries.imageDedupProbe]]. Verdicts are a pure
    * function of (batch, index) — replays emit identically — and no
    * streaming state exists beyond the source checkpoint; the corpus is
    * never re-decoded per trigger.
    */
  def imageDedupAgainstIndex(docs: DataFrame, corpus: DataFrame)(
      onBatch: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val index = graft.queries.PipelineQueries.prepareImageIndex(
      graft.queries.PipelineQueries.imageSignatures(corpus))
    docs.writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // checkpoint the batch's (tiny) signature table: the band explode
        // and the left-join spine both read it
        val sig = graft.queries.PipelineQueries
          .imageSignatures(batch.select("doc_id", "text")).lossTolerantCheckpoint()
        onBatch(graft.queries.PipelineQueries.imageDedupProbe(sig, index), batchId)
      }
  }

  /** Streaming video near-dup screen — m8's ingest twin, completing the
    * against-prebuilt-index family across all three modalities (text
    * [[dedupAgainstIndex]], image [[imageDedupAgainstIndex]], vector
    * [[annAgainstIndex]]): the corpus's df-capped frame-hash index
    * ([[graft.queries.PipelineQueries.prepareVideoIndex]]) is built ONCE
    * at query start; each micro-batch frames its arriving videos and
    * probes it via foreachBatch running the batch
    * [[graft.queries.PipelineQueries.videoDedupProbe]] exactly — a trimmed
    * re-upload lands near_dup on its source, unseen content lands novel.
    * Pure function of (batch, index), zero streaming state beyond the
    * source checkpoint.
    */
  def videoDedupAgainstIndex(docs: DataFrame, corpus: DataFrame)(
      onBatch: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val index = graft.queries.PipelineQueries.prepareVideoIndex(corpus)
    docs.writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        onBatch(graft.queries.PipelineQueries.videoDedupProbe(
          batch.select("doc_id", "text"), index), batchId)
      }
  }

  /** Streaming ANN ingest — the ingest-time twin of the batch
    * `sim7_incremental_ann`, and the vector-side sibling of
    * [[dedupAgainstIndex]]: each micro-batch of new embeddings probes ONE
    * prebuilt [[graft.queries.PipelineQueries.VectorIndex]] (coarse
    * codebook + cell-assigned corpus, built once at query start; in
    * production the bucketed index tables) for its home cell and nearest
    * index neighbors. Stream-vs-index work runs as batch jobs inside
    * foreachBatch — the index is never re-assigned, and results are a pure
    * function of (batch, index), so replayed micro-batches emit identical
    * assignments; no streaming state exists beyond the source checkpoint.
    */
  def annAgainstIndex(vecs: DataFrame,
      index: graft.queries.PipelineQueries.VectorIndex, nProbe: Int)(
      onBatch: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    vecs.writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import batch.sparkSession.implicits._
        val b = batch.select("vec_id", "v", "nrm")
          .as[(Long, Array[Double], Double)].lossTolerantCheckpoint()
        onBatch(graft.queries.PipelineQueries.sim7Probe(b, index, nProbe), batchId)
      }

  /** Streaming tokenization — the ingest-time twin of the batch
    * `x19_bpe_encode`: documents stream through the nested-replace chain
    * compiled from a FIXED trained merge artifact
    * ([[graft.queries.PipelineQueries.bpeTrain]], run once at query start —
    * tokenizing against drifting merges would make replayed batches encode
    * differently, the classic non-idempotent-sink bug). Stateless by
    * construction: the artifact is a literal in the plan, so this is one
    * narrow whole-stage-codegen projection per micro-batch — no watermark,
    * no state store, and throughput is scan speed, exactly the batch
    * operator's plan applied to an unbounded source. Same row contract as
    * the batch operator: a document with no `[a-z]+` word (null/empty/
    * non-latin text) emits NO output row — reconcile counts against the
    * filtered input, not the raw stream.
    */
  def tokenizeStream(docs: DataFrame,
      merges: Seq[(Int, String, String, String, Long)]): DataFrame =
    graft.queries.PipelineQueries.encodeWithMerges(docs, merges)
      .select("doc_id", "ts", "n_tokens")

  /** Streaming model-based quality filter — the ingest-time twin of the
    * batch `x20_quality_classifier`: every arriving document scores through
    * the same 64-weight hashed linear model
    * ([[graft.queries.PipelineQueries.X20Weights]]), which rides the plan
    * as literals. Stateless by construction — no watermark, no state
    * store, one narrow whole-stage-codegen projection per micro-batch, so
    * ingest-time filtering runs at scan speed and replayed batches score
    * identically (the model is pinned, not drifting). Same row contract as
    * the batch operator: a document with no tokens emits no row.
    */
  def classifyStream(docs: DataFrame): DataFrame =
    graft.queries.PipelineQueries.classifyQuality(docs)

  /** Streaming chunking — the ingest-time twin of the batch
    * `x25_chunk_overlap`: every arriving document explodes into the same
    * stride-spaced overlapping context windows, through the SAME shared
    * core ([[graft.queries.PipelineQueries.chunkDocs]]) with the pinned
    * default geometry, so a replayed batch chunks identically and the
    * ingest path can never disagree with the batch layout. Stateless by
    * construction — no watermark, no state store, one narrow generate per
    * micro-batch, so chunking runs at scan speed. Output fans out ≈
    * chunk/stride rows per input row; `start_tok` keeps each chunk
    * addressable back into its source document.
    */
  def chunkStream(docs: DataFrame): DataFrame =
    graft.queries.PipelineQueries.chunkDocs(docs,
      graft.queries.PipelineQueries.X25Chunk,
      graft.queries.PipelineQueries.X25Stride)

  /** Streaming normalization — the ingest-time twin of x26's rule, and the
    * place canonicalization actually runs in production: every arriving
    * document's text is rewritten through the SAME
    * [[graft.queries.PipelineQueries.normalizeText]] expression before any
    * downstream hashing (the dedup screen, the contamination screen, the
    * drift monitor all key on digests — a case/spacing variant admitted
    * un-normalized would dodge every one of them). The normalized value
    * lands back in the `text` column so the downstream ops compose
    * unchanged — `dedupAgainstIndex(normalizeStream(docs), …)` is the
    * intended wiring. Stateless narrow projection; `was_dirty` flags rows
    * the rule changed so ingest observability can track dirt rates per
    * source.
    */
  def normalizeStream(docs: DataFrame): DataFrame =
    docs
      .withColumn("norm_text",
        graft.queries.PipelineQueries.normalizeText(col("text")))
      .withColumn("was_dirty", (col("text") =!= col("norm_text")).cast("int"))
      .drop("text")
      .withColumnRenamed("norm_text", "text")

  /** Streaming OOV monitor — x28's ingest-observability twin: per
    * event-time hour window and source, how well a PINNED vocabulary
    * artifact covers the arriving tokens (x14/x28's exact artifact,
    * shipped as a broadcast set — monitoring against a drifting vocab
    * would make replayed windows disagree). Per-document counting is
    * row-local against the broadcast set; the aggregation is Spark's
    * BUILT-IN watermarked windowed groupBy — no custom state code at all:
    * Append mode emits each (window, source) row exactly once when the
    * watermark closes it, and state is windows-in-flight × sources. A
    * rising oov_ppm on one source is the first signal a crawl's content
    * shifted away from the tokenizer (x28 is the offline deep-dive; x24
    * sees the same shift as distributional drift).
    */
  def oovMonitorStream(docs: DataFrame, vocab: Set[String],
      delay: String = "2 hours"): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val bc = s.sparkContext.broadcast(vocab)
    docs.select(col("ts"), col("source"), col("text"))
      .as[(Timestamp, String, String)]
      .mapPartitions { it =>
        val v = bc.value
        it.map { case (ts0, src, text) =>
          val w = text.split(" ", -1)
          (ts0, src, w.length.toLong, w.count(tk => !v.contains(tk)).toLong)
        }
      }.toDF("ts", "source", "nt", "no")
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour"), col("source"))
      .agg(sum("nt").as("n_tokens"), sum("no").as("n_oov"))
      .select(col("window.start").as("window_start"), col("source"),
        col("n_tokens"), col("n_oov"),
        expr("n_oov * 1000000L div n_tokens").as("oov_ppm"))
  }

  /** Streaming span corruption — the ingest-time twin of the batch
    * `x31_span_corrupt` denoising-objective prep: arriving documents run
    * the SAME [[graft.queries.PipelineQueries.corruptSpans]] core (seeded
    * by (doc_id, block ordinal), so a document corrupts identically in
    * batch and on the stream — the reproducible-epoch property survives
    * ingest). Stateless narrow projection per micro-batch: no watermark,
    * no state store, replayed batches emit identical pairs.
    */
  def corruptStream(docs: DataFrame): DataFrame =
    graft.queries.PipelineQueries.corruptSpans(docs,
      graft.queries.PipelineQueries.X31Block,
      graft.queries.PipelineQueries.X31RatePpm)

  /** Composed streaming CURATION — pipe1's ingest twin, and the
    * composition the individual twins exist for: ONE streaming query
    * wiring normalize (x26's rule — canonicalize before anything hashes)
    * → x20 quality gate (the shared [[graft.queries.PipelineQueries
    * .scoreQuality]] core with pipe2's exact inline threshold) → d7
    * decontamination screen (broadcast eval-gram membership via the shared
    * [[sharedGramCount]] rule) → x22 per-source quota admission. No
    * foreachBatch: the first three gates are stateless narrow transforms,
    * so the whole pipeline is a single streaming plan whose ONLY state is
    * the quota's one counter per source — bounded by the source dimension
    * no matter how long the stream runs. Gate order mirrors pipe1's
    * precedence, and matters for the stateful tail: a document must clear
    * quality and contamination BEFORE it can consume quota, so rejected
    * garbage never starves a source's budget. Every gate is a pure
    * function of (row, static artifacts) and admission is a pure function
    * of (state, batch) — replayed micro-batches admit identically.
    */
  def curateIngest(docs: DataFrame, evalGrams: DataFrame, cap: Int): Dataset[Admission] = {
    val s = docs.sparkSession
    import s.implicits._
    val bc = s.sparkContext.broadcast(
      evalGrams.select("gh").collect().map(_.getString(0)).toSet)
    val kept = graft.queries.PipelineQueries.scoreQuality(normalizeStream(docs))
      .filter(expr("sum_w div cast(size(w) as bigint)") >= 500000L)
      .select(col("doc_id"), col("ts"), col("text"), col("source"))
      .as[(Long, Timestamp, String, String)]
    val clean = kept.mapPartitions { it =>
      val set = bc.value
      it.collect { case (id, ts0, text, src) if sharedGramCount(text, set) == 0L =>
        SourcedDoc(id, ts0, src)
      }
    }
    sourceQuotaStream(clean, cap)
  }

  /** Streaming per-source quota — the ingest-time twin of the batch
    * `x22_source_cap` anti-domination rule: admit at most `cap` documents
    * per source, rejecting the rest at the door. State is ONE admitted-count
    * per source — bounded by the SOURCE dimension, not the document stream,
    * the same dimension-bounded-state contract as the trending window's
    * count map — and it never grows once a source hits its cap.
    *
    * Semantics differ from batch x22 deliberately, because they must: the
    * batch rule ranks by content hash over the WHOLE corpus, which a stream
    * cannot do without buffering everything it might later prefer. The
    * ingest rule is first-cap-by-arrival (within a micro-batch, (event
    * time, doc_id) order makes replays deterministic); the batch operator
    * is the periodic reconciliation pass that re-ranks the admitted set by
    * hash when the corpus is compacted. Admission decisions are a pure
    * function of (state, batch), so a replayed micro-batch admits the same
    * documents.
    */
  def sourceQuotaStream(docs: Dataset[SourcedDoc], cap: Int): Dataset[Admission] = {
    require(cap >= 1, s"cap must be positive, got $cap")
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (src: String, it: Iterator[SourcedDoc], state: GroupState[Long]) =>
          var n = state.getOption.getOrElse(0L)
          val admitted = it.toSeq
            .sortBy(d => (eventUs(d.ts), d.doc_id))
            .flatMap { d =>
              if (n < cap) { n += 1; Some(Admission(d.doc_id, src, d.ts, n)) }
              else None
            }
          state.update(n)
          admitted.iterator
      }
  }

  /** Stream–stream interval join — the ingest twin of the batch
    * `j10_range_join`: every (purchase, error) pair of the same user within
    * ±1 hour, matched across two live streams. The time-range predicate
    * plus both watermarks is what makes this bounded: Spark buffers each
    * side's rows only until the other side's watermark proves no future
    * match can arrive (state horizon = watermark delay + band width), so
    * join state is a sliding window over the streams, not their history.
    * The equality key (user_id) hash-partitions that state across
    * executors exactly like the batch join's shuffle — and the batch
    * bucket-discretization trick is unnecessary here because the range
    * condition is the state-eviction contract itself, not a nested-loop
    * trap.
    */
  def bandJoin(purchases: DataFrame, errors: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", "2 hours")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    val e = errors.withWatermark("ts", "2 hours")
      .select(col("user_id").as("e_user"), col("event_id").as("error_id"), col("ts").as("e_ts"))
    p.join(e,
        col("user_id") === col("e_user") &&
          col("e_ts") >= col("p_ts") - expr("interval 1 hour") &&
          col("e_ts") <= col("p_ts") + expr("interval 1 hour"))
      .select(col("user_id"), col("purchase_id"), col("error_id"),
        (unix_micros(col("e_ts")) - unix_micros(col("p_ts"))).as("micros_offset"))
  }

  /** Streaming corpus profile — the ingest-observability twin of the batch
    * `x15_profile` audit: running per-column non-null counts, approximate
    * distincts, and min/max over a document stream, updated every
    * micro-batch. The global (group-less) aggregation keeps exactly ONE
    * state row whose width is columns × 4 statistics; the distinct counter
    * is the HLL++ buffer (exact streaming distinct would buffer every value
    * ever seen — the same unbounded-state argument as
    * `approxDistinctUsers`), and min/max/count are trivially mergeable.
    * Downstream alerting reads the Update-mode stream and fires on
    * invariant breaks (doc_id distinct falling behind count ⇒ duplicate
    * ingest, empty-string min ⇒ corrupt batch) without ever scanning the
    * corpus.
    */
  def profileStream(docs: DataFrame): DataFrame = {
    val cols = Seq("doc_id", "lang", "source", "text")
    val aggs = graft.queries.PipelineQueries.profileAggs(cols, exact = false)
    docs.groupBy().agg(aggs.head, aggs.tail: _*)
      .selectExpr(graft.queries.PipelineQueries.profileStack(cols, exact = false))
  }

  private val GapUs = 1800L * 1000000L

  /** Event time in microseconds — java.sql.Timestamp.getTime() truncates to
    * milliseconds, so the sub-millisecond part comes from getNanos (the batch
    * `w3_sessionize` twin uses unix_micros; sessions must measure the same
    * gaps).
    */
  @inline private def eventUs(ts: Timestamp): Long =
    ts.getTime / 1000L * 1000000L + ts.getNanos / 1000L

  /** Stateful session assembly with a 30-minute inactivity gap, emitting each
    * session when it closes — either because a later event for the same user
    * arrives past the gap, or because the event-time watermark passes the
    * session end + gap (EventTimeTimeout). State per user is one fixed-size
    * summary regardless of session length. Semantics match the batch
    * `w3_sessionize` window formulation (same gap, same aggregates) for
    * in-order and within-batch-disordered input; cross-batch stragglers that
    * still land inside the current session's gap window merge into it
    * (lowering its start if needed), and stragglers older than that emit as
    * their own immediate session — the best a single-summary state can do
    * once earlier history has been emitted.
    */
  def sessionize(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val closed = state.getOption.map(s =>
              Session(userId, s.startUs, s.endUs, s.n, s.total)).toSeq
            state.remove()
            closed.iterator
          } else {
            val out = Seq.newBuilder[Session]
            var cur = state.getOption.orNull
            // events within a micro-batch arrive unordered: sort by event time
            it.toSeq.sortBy(e => (eventUs(e.ts), e.event_id)).foreach { e =>
              val us = eventUs(e.ts)
              if (cur == null) cur = SessionState(us, us, 1L, e.value)
              else if (us - cur.endUs > GapUs) {
                out += Session(userId, cur.startUs, cur.endUs, cur.n, cur.total)
                cur = SessionState(us, us, 1L, e.value)
              } else if (cur.startUs - us > GapUs) {
                // straggler strictly before this session's window: emit alone
                out += Session(userId, us, us, 1L, e.value)
              } else cur = SessionState(math.min(cur.startUs, us),
                math.max(cur.endUs, us), cur.n + 1L, cur.total + e.value)
            }
            if (cur != null) {
              state.update(cur)
              // close via watermark once the gap can no longer be beaten
              state.setTimeoutTimestamp(
                math.max(cur.endUs / 1000L + GapUs / 1000L,
                  state.getCurrentWatermarkMs() + 1L))
            }
            out.result().iterator
          }
      }
  }

  /** Streaming trending top-k — the ingest-time twin of the batch
    * `w7_hourly_topk` operator. A rank over a streaming aggregate is not
    * expressible as a second streaming agg (no windowed sort in append
    * mode), so the streaming-native shape is stateful: state is ONE count
    * map per open hour window (bounded by the event-type domain — exactly
    * the bound w7's scale note names; an unbounded domain swaps the map
    * for a SpaceSaving sketch, same contract), and the ranked top-k is
    * emitted EXACTLY ONCE, when the event-time watermark passes the window
    * end and the ranking can no longer change. Ties break (count desc,
    * type asc) precisely as in batch w7, so on identical input the emitted
    * rows equal w7's rows for every closed window (spec-pinned). Windows
    * are keyed, so state and emission hash-partition across executors.
    */
  def trendingTopK(events: Dataset[Event], k: Int = 3): Dataset[Trending] = {
    import events.sparkSession.implicits._
    val HourUs = 3600L * 1000000L
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(e => eventUs(e.ts) / HourUs)
      .flatMapGroupsWithState[TrendState, Trending](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (bucket: Long, it: Iterator[Event], state: GroupState[TrendState]) =>
          if (state.hasTimedOut) {
            val ranked = state.getOption.toSeq.flatMap(_.counts.toSeq
              .sortBy { case (t, n) => (-n, t) }.take(k).zipWithIndex
              .map { case ((t, n), i) => Trending(bucket * HourUs, i + 1, t, n) })
            state.remove()
            ranked.iterator
          } else {
            var counts = state.getOption.map(_.counts).getOrElse(Map.empty[String, Long])
            it.foreach { e =>
              counts = counts.updated(e.event_type, counts.getOrElse(e.event_type, 0L) + 1L)
            }
            state.update(TrendState(counts))
            // emit when the watermark clears the window end: the 2 h
            // watermark delay is the lateness horizon, after which the
            // window's ranking is final
            state.setTimeoutTimestamp(
              math.max((bucket + 1L) * HourUs / 1000L,
                state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          }
      }
  }

  /** Streaming drift monitor — the ingest-time twin of the batch
    * `x24_drift_report`: each event-time hour window accumulates ONE
    * bounded bucket histogram (≤ [[graft.queries.PipelineQueries.X24Buckets]]
    * entries, the trendingTopK state discipline) of the arriving documents'
    * hashed unigrams, and when the watermark closes the window it emits the
    * per-bucket total-variation contributions against a PINNED reference
    * distribution (`refPpm`, trained offline by the batch operator and
    * shipped as an artifact — comparing against a drifting reference would
    * make replayed windows alarm differently). Per-window arithmetic is the
    * batch operator's exactly: candidate ppm first, then the absolute
    * difference. State is windows-in-flight × buckets; each window's state
    * frees on emission.
    */
  def driftStream(docs: Dataset[StreamDoc], refPpm: Map[Int, Long]): Dataset[DriftRow] = {
    import docs.sparkSession.implicits._
    val HourUs = 3600L * 1000000L
    val D = graft.queries.PipelineQueries.X24Buckets
    docs
      .flatMap { d =>
        val hour = eventUs(d.ts) / HourUs
        val w = d.text.split(" ", -1)
        if (w.isEmpty) Iterator.empty
        else {
          val md = java.security.MessageDigest.getInstance("MD5")
          w.iterator.map { tk =>
            val hex = md.digest(tk.getBytes("UTF-8")).map("%02x".format(_)).mkString
            md.reset()
            (d.ts, hour, (java.lang.Long.parseLong(hex.substring(0, 15), 16) % D).toInt)
          }
        }
      }.toDF("ts", "hour", "b")
      .withWatermark("ts", "2 hours") // after the typed flatMap: metadata survives
      .as[(Timestamp, Long, Int)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[DriftState, DriftRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (hour: Long, it: Iterator[(Timestamp, Long, Int)], state: GroupState[DriftState]) =>
          if (state.hasTimedOut) {
            val counts = state.getOption.map(_.counts).getOrElse(Map.empty[Int, Long])
            state.remove()
            val total = counts.values.sum
            // union of observed and reference buckets: a token class that
            // VANISHED from the window (ref > 0, count 0) is the loudest
            // drift and must contribute its full ref ppm, exactly as the
            // batch operator reports candidate-zero buckets
            (counts.keySet ++ refPpm.keySet).toSeq.sorted.iterator.map { b =>
              val cnt = counts.getOrElse(b, 0L)
              val cand = if (total == 0) 0L else cnt * 1000000L / total
              val ref = refPpm.getOrElse(b, 0L)
              DriftRow(hour * HourUs, b, cnt, cand, ref, math.abs(cand - ref))
            }
          } else if (!state.exists &&
              (hour + 1L) * HourUs <= state.getCurrentWatermarkMs() * 1000L) {
            // straggler past the lateness horizon for an already-reported
            // window: recreating state here would emit a second, partial
            // report for the same window_start_us on the next timeout
            Iterator.empty
          } else {
            var counts = state.getOption.map(_.counts).getOrElse(Map.empty[Int, Long])
            it.foreach { case (_, _, b) =>
              counts = counts.updated(b, counts.getOrElse(b, 0L) + 1L)
            }
            state.update(DriftState(counts))
            state.setTimeoutTimestamp(
              math.max((hour + 1L) * HourUs / 1000L,
                state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          }
      }
  }

  /** Streaming strict-order funnel — the ingest-time twin of the batch
    * `w4_funnel` operator, same greedy earliest-transition scan per user.
    * A conversion (view → click → purchase, each strictly later) emits the
    * moment the purchase arrives AND FREES THE USER'S STATE — on a
    * 10⁹-user stream the state table holds only users mid-funnel, not
    * everyone ever seen. A user inactive past the abandonment horizon
    * (event time) emits their furthest stage via EventTimeTimeout and is
    * evicted too, so state is bounded by users active within one horizon.
    * A user re-appearing after either eviction starts a fresh funnel
    * episode (multiple conversions are separate rows — the per-episode
    * semantics a funnel over an unbounded stream has to have; the batch
    * operator's single row per user corresponds to the FIRST episode).
    * Same ordering caveat as `sessionize`: within-batch disorder is sorted
    * away; a cross-batch straggler older than an already-taken transition
    * cannot rewind it.
    */
  def funnel(events: Dataset[Event],
      horizonUs: Long = 7L * 86400L * 1000000L): Dataset[FunnelOutcome] = {
    import events.sparkSession.implicits._
    def out(uid: Long, st: FunnelState, converted: Boolean): FunnelOutcome =
      FunnelOutcome(uid, st.stage,
        if (st.stage >= 1) Some(st.t1) else None,
        if (st.stage >= 2) Some(st.t2) else None,
        if (st.stage >= 3) Some(st.t3) else None, converted)
    events
      .filter(col("event_type").isin("view", "click", "purchase"))
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOutcome](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            val abandoned = state.getOption.map(st => out(userId, st, converted = false))
            state.remove()
            abandoned.iterator
          } else {
            val emitted = Seq.newBuilder[FunnelOutcome]
            var st = state.getOption.getOrElse(FunnelState(0, 0L, 0L, 0L, Long.MinValue))
            it.toSeq.sortBy(e => (eventUs(e.ts), e.event_type)).foreach { e =>
              val us = eventUs(e.ts)
              st = (st.stage, e.event_type) match {
                case (0, "view")                        => st.copy(stage = 1, t1 = us, lastUs = us)
                case (1, "click") if us > st.t1         => st.copy(stage = 2, t2 = us, lastUs = us)
                case (2, "purchase") if us > st.t2      => st.copy(stage = 3, t3 = us, lastUs = us)
                case _                                  => st.copy(lastUs = math.max(st.lastUs, us))
              }
              if (st.stage == 3) {
                emitted += out(userId, st, converted = true)
                st = FunnelState(0, 0L, 0L, 0L, Long.MinValue)
              }
            }
            if (st.stage == 0 && st.lastUs == Long.MinValue) {
              // the scan ended on a conversion (emitted + reset) with no
              // trailing events: nothing to keep — the state table forgets
              // converted users entirely
              state.remove()
            } else {
              state.update(st)
              state.setTimeoutTimestamp(
                math.max(st.lastUs / 1000L + horizonUs / 1000L,
                  state.getCurrentWatermarkMs() + 1L))
            }
            emitted.result().iterator
          }
      }
  }
}

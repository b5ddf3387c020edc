package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Loss-tolerant checkpointing — the ONE policy point for every
  * `localCheckpoint` in the engine.
  *
  * `Dataset.localCheckpoint()` trades fault tolerance for speed: lineage
  * is truncated and the blocks live on the executors that computed them,
  * so on a real cluster ONE lost executor permanently strands every job
  * whose loop re-reads those blocks (the iterative label propagation,
  * PageRank's pinned edge list, streaming snapshot rebasing). Local mode
  * cannot lose an executor, which is exactly why the risk stays invisible
  * until a cluster rehearsal kills one (SCALING.md, round 10).
  *
  * Three escalating fault domains, three dials (all default-off so
  * single-JVM plans and benchmarks are byte-identical to before):
  *
  *  1. `spark.graft.checkpoint.replicated=true` — checkpoint blocks stored
  *     at MEMORY_AND_DISK_SER_2 (one replica on a second executor): a
  *     SINGLE executor loss degrades to a replica read. Cost: one network
  *     copy per checkpointed partition — and a MEASURED SCOPE LIMIT: this
  *     rung is for node-sized state (rank vectors, cluster labels), not
  *     fact-table-wide checkpoints. CkptPricingRehearsal at sf1 on
  *     local-cluster[3,2,*]: replicating g1's 11.7M-row edge-list
  *     checkpoint OOM-killed executors at every heap size tried (2–16
  *     GiB), deserialized and serialized storage alike, on a clean block
  *     store — while the SAME query under `reliable every=N` completes at
  *     a 20-33% wall premium at every cadence. SER (not plain _2) is kept
  *     because it stores the compact form and ships those bytes without a
  *     serialize-the-block heap spike; the hazard it does not remove is
  *     replication's second full copy of a wide dataset living in
  *     executor memory pools.
  *  2. `spark.graft.checkpoint.reliable=<shared dir>` — every Nth
  *     checkpoint call (N = `spark.graft.checkpoint.reliable.every`,
  *     default 1) becomes a RELIABLE `Dataset.checkpoint()` to shared
  *     storage; intermediate calls persist WITHOUT truncating lineage, so
  *     they stay recomputable from the last reliable snapshot. Survives
  *     ANY number of executor losses; lineage depth (and therefore planner
  *     cost, the reason localCheckpoint exists) is bounded by N rounds.
  *     Cost: one distributed-FS write per N rounds.
  *  3. Driver loss: out of scope — re-run the job (the standard contract
  *     for batch Spark).
  *
  * The `every=N` cadence is counted PER CALL SITE (class + method + line,
  * resolved once per call via StackWalker): interleaved loops each get
  * their own durable rhythm, so a chatty secondary loop can never consume
  * the primary loop's every-Nth slots and stretch its recompute window.
  * Each site's FIRST call is durable, then every Nth after — every chain
  * starts from a durable snapshot and lineage depth between durable
  * points is bounded by N rounds at that site. Correctness is unchanged
  * under any counting scheme (every call is either durable or
  * recomputable from a durable ancestor); the keying only bounds WHOSE
  * recompute window can grow.
  *
  * Rehearsed, not argued: `graft.ClusterKillRehearsal` kills real executor
  * JVMs mid-query — dial 1 against single kills at swept kill points, a
  * negative control with all dials off (the job MUST die or diverge from
  * fresh-cluster recompute… it dying is what proves the dial is
  * load-bearing), and dial 2 against a simultaneous two-of-three executor
  * kill.
  */
object Ckpt {
  /** Dial lookup: session conf first (runtime-settable, what tests and
    * notebooks flip), SparkConf as the fallback (what `--conf` sets).
    */
  private final class Dials(session: Option[org.apache.spark.sql.SparkSession],
      sc: org.apache.spark.SparkContext) {
    private def get(key: String): Option[String] =
      session.flatMap(_.conf.getOption(key))
        .orElse(sc.getConf.getOption(key))
        .map(_.trim).filter(_.nonEmpty)
    def replicated: Boolean =
      get("spark.graft.checkpoint.replicated").exists(java.lang.Boolean.parseBoolean)
    def reliableDir: Option[String] = get("spark.graft.checkpoint.reliable")
    def reliableEvery: Int =
      math.max(1, get("spark.graft.checkpoint.reliable.every").map(_.toInt).getOrElse(1))
  }

  /** Per-call-site reliable-cadence counters. The site key is the nearest
    * stack frame outside this object (class + method + line), so two
    * checkpointing loops — even in the same method — count independently.
    * Bounded: one entry per textual `lossTolerantCheckpoint()` call site
    * in the program.
    */
  private val siteCalls =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()

  private def callSite(): String = {
    val walker = java.lang.StackWalker.getInstance()
    walker.walk { frames =>
      val it = frames.iterator()
      var site = "?"
      var found = false
      while (!found && it.hasNext) {
        val f = it.next()
        val cn = f.getClassName
        // skip this object and its value-class extension wrappers —
        // graft.Ckpt$, graft.Ckpt$DatasetCkpt$, graft.Ckpt$RddCkpt$ — via
        // the "graft.Ckpt$" prefix (the trailing $ matters: a bare
        // "graft.Ckpt" prefix would also swallow CALLER classes whose name
        // merely begins with Ckpt, collapsing their distinct sites into
        // whatever frame lies above them) plus the walker plumbing
        if (!cn.startsWith("graft.Ckpt$") && !cn.startsWith("java.lang.StackWalker")) {
          site = cn + "." + f.getMethodName + ":" + f.getLineNumber
          found = true
        }
      }
      site
    }
  }

  /** Reset every site's cadence counter — rehearsal/pricing plumbing so
    * back-to-back measured runs in one driver JVM each start at "first
    * call durable" instead of inheriting the previous run's phase. Never
    * needed for correctness (any phase is safe); only for comparability.
    */
  private[graft] def resetCadence(): Unit = siteCalls.clear()

  /** True iff this call at this site should be a DURABLE checkpoint: the
    * site's first call always is (every chain starts from a durable
    * snapshot), then every Nth after.
    */
  private def durableTurn(every: Int): Boolean =
    (siteCalls.computeIfAbsent(callSite(),
      _ => new java.util.concurrent.atomic.AtomicLong(0))
      .incrementAndGet() - 1) % every == 0


  private def ensureCheckpointDir(sc: org.apache.spark.SparkContext, dir: String): Unit =
    if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)

  implicit final class DatasetCkpt[T](private val ds: Dataset[T]) extends AnyVal {
    /** Drop-in for `localCheckpoint()` honoring the fault-domain dials. */
    def lossTolerantCheckpoint(): Dataset[T] = {
      val sc = ds.sparkSession.sparkContext
      val dials = new Dials(Some(ds.sparkSession), sc)
      dials.reliableDir match {
        case Some(dir) =>
          ensureCheckpointDir(sc, dir)
          if (durableTurn(dials.reliableEvery))
            ds.checkpoint() // eager, to shared storage
          else {
            // lineage NOT truncated: recomputable from the last reliable
            // snapshot; eager materialization matches localCheckpoint's
            val p = ds.persist(StorageLevel.MEMORY_AND_DISK)
            p.count()
            p
          }
        case None if dials.replicated =>
          ds.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER_2)
        case None => ds.localCheckpoint()
      }
    }
  }

  implicit final class RddCkpt[T](private val rdd: org.apache.spark.rdd.RDD[T]) extends AnyVal {
    /** RDD form: `RDD.localCheckpoint` honors a pre-set storage level
      * (disk is added, replication preserved), so the replicated dial
      * pre-persists at MEMORY_AND_DISK_SER_2. Reliable mode mirrors the
      * Dataset form; RDD checkpoints stay lazy (materialized by the
      * caller's next action, exactly like `RDD.localCheckpoint`).
      */
    def lossTolerantCheckpoint(): org.apache.spark.rdd.RDD[T] = {
      val dials = new Dials(
        org.apache.spark.sql.SparkSession.getActiveSession, rdd.sparkContext)
      dials.reliableDir match {
        case Some(dir) =>
          ensureCheckpointDir(rdd.sparkContext, dir)
          if (rdd.getStorageLevel == StorageLevel.NONE)
            rdd.persist(StorageLevel.MEMORY_AND_DISK)
          if (durableTurn(dials.reliableEvery)) rdd.checkpoint()
          rdd
        case None =>
          if (dials.replicated && rdd.getStorageLevel == StorageLevel.NONE)
            rdd.persist(StorageLevel.MEMORY_AND_DISK_SER_2)
          rdd.localCheckpoint()
      }
    }
  }
}

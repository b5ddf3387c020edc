package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time individual registered queries by name against a
  * scale-factor dir, e.g.
  * `sbt "runMain graft.QueryTimer d4_ngram_jaccard d4_ngram_jaccard"`
  * (run a name twice to separate cold codegen/JIT cost from steady state).
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  * SPARK_GRAFT_EXPLAIN=1 to dump the plan, SPARK_GRAFT_METRICS=1 to print
  * aggregate task metrics per run (input bytes, shuffle volume/records,
  * memory/disk spill, GC) — the numbers that attribute a scaling exponent
  * to plan work vs box effects (spill-regime shifts, cache pressure).
  */
object QueryTimer {

  private final class MetricsAgg extends org.apache.spark.scheduler.SparkListener {
    val input = new java.util.concurrent.atomic.AtomicLong
    val shufW = new java.util.concurrent.atomic.AtomicLong
    val shufRec = new java.util.concurrent.atomic.AtomicLong
    val memSpill = new java.util.concurrent.atomic.AtomicLong
    val diskSpill = new java.util.concurrent.atomic.AtomicLong
    val gcMs = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        input.addAndGet(m.inputMetrics.bytesRead)
        shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shufRec.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        memSpill.addAndGet(m.memoryBytesSpilled)
        diskSpill.addAndGet(m.diskBytesSpilled)
        gcMs.addAndGet(m.jvmGCTime)
      }
    }
    def snapshotAndReset(): String = {
      def take(a: java.util.concurrent.atomic.AtomicLong): Long = a.getAndSet(0)
      f"input=${take(input) / 1e6}%.0fMB shufW=${take(shufW) / 1e6}%.0fMB " +
        f"shufRec=${take(shufRec)}%d memSpill=${take(memSpill) / 1e6}%.0fMB " +
        f"diskSpill=${take(diskSpill) / 1e6}%.0fMB gc=${take(gcMs)}%dms"
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.configure(spark)
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")
    val withMetrics = sys.env.get("SPARK_GRAFT_METRICS").contains("1")
    val agg = new MetricsAgg
    if (withMetrics) spark.sparkContext.addSparkListener(agg)
    for (q <- names) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(q)(spark, sfDir)
      val n = df.count()
      println(f"TIME $q ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      if (withMetrics) {
        // listener events drain asynchronously; settle before snapshotting
        var prev = -1L
        while (agg.shufRec.get != prev) { prev = agg.shufRec.get; Thread.sleep(300) }
        println(s"METRICS $q ${agg.snapshotAndReset()}")
      }
      if (explain) df.explain("formatted")
      // Bench's between-query block sweep (see Bench.sweepBlocks): without
      // it, persisted gram sets / localCheckpoint blocks from earlier
      // queries pile heap pressure onto later ones — measured d4c going
      // 5.7 s (bench, swept) → 104 s (unswept multi-query timer run, 73 s
      // of GC). Same isolation as the bench, outside the timed window.
      if (sys.env.getOrElse("SPARK_GRAFT_TIMER_SWEEP", "1") != "0") {
        spark.sqlContext.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        System.gc()
      }
    }
    spark.stop()
  }
}

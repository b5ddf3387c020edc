package graft

import org.apache.spark.sql.SparkSession

/** Executor-LOSS rehearsal: run the iterative / checkpoint-heavy queries
  * on `local-cluster[3,2,m]`, `kill -9` one executor JVM mid-query, and
  * require the job to finish with results identical to an untouched
  * single-JVM baseline. This is the failure mode `local[*]` can never
  * exercise: shuffle files vanish (FetchFailed → stage retry), cached and
  * localCheckpoint blocks are stranded (block-fetch failure), broadcast
  * pieces re-fetch, and the standalone worker relaunches a fresh executor
  * that must re-register mid-job.
  *
  * localCheckpoint blocks are UNRECOVERABLE by lineage (that is the
  * point of localCheckpoint), so loss tolerance comes from the
  * `spark.graft.checkpoint.replicated` dial ([[Ckpt]]): checkpoint blocks
  * carry one replica on a second executor, turning an executor kill into
  * a replica read. The rehearsal runs with the dial ON — a cluster
  * deployment's configuration — plus raised task/stage retry budgets
  * (what any production job sets).
  *
  * Run: `sbt "runMain graft.ClusterKillRehearsal [sfDir] [execMemMb]"`.
  * Exits 1 on any divergence or failed query.
  */
object ClusterKillRehearsal {

  /** The queries whose loops re-read checkpointed state — the verdicts'
    * named risk set — plus a shuffle-heavy non-iterative control.
    */
  val RehearsalQueries: Seq[String] = Seq(
    "d6b_dup_clusters_dist", // pointer-jumped label propagation (ckpt per round)
    "g1_pagerank",           // unrolled rounds over a pinned edge list
    "pipe3_export",          // multi-stage pipeline with interior materialization
    "d2_minhash_lsh")        // pure shuffle control (no checkpoint): FetchFailed path

  private def digestOf(df: org.apache.spark.sql.DataFrame): (Long, String) = {
    val rows = df.collect()
    val schema = df.columns.mkString("<", "|", ">")
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.map(r => schema + ClusterHarness.canonValue(r)).sorted
      .foreach(l => md.update(l.getBytes("UTF-8")))
    (rows.length.toLong, md.digest().map(b => f"$b%02x").mkString)
  }

  /** Kill one executor JVM (never the driver) after `delayMs`. Returns the
    * thread so the caller can join and learn which pid died.
    */
  private def killOneExecutorAfter(s: SparkSession, delayMs: Long): Thread = {
    val t = new Thread(() => {
      Thread.sleep(delayMs)
      val driverPid = java.lang.management.ManagementFactory.getRuntimeMXBean.getName
        .split("@")(0)
      // executor pids straight from the worker-side JVMs
      val pids = ClusterHarness.executorJvms(s).map(_.split("@")(0)) - driverPid
      pids.headOption.foreach { pid =>
        println(s"KILL executor pid $pid")
        new ProcessBuilder("kill", "-9", pid).inheritIO().start().waitFor()
      }
    }, "executor-killer")
    t.setDaemon(true)
    t.start()
    t
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val memMb = args.lift(1).map(_.toInt).getOrElse(1024)

    val local = ClusterHarness.localSession("graft-kill-baseline")
    val expected = try {
      RehearsalQueries.map { n => n -> digestOf(SparkEntry.queries(n)(local, sfDir)) }.toMap
    } finally local.stop()
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()

    // 3 executors so that after one dies (and before its replacement
    // registers) the replicated checkpoint blocks still have a live home
    val cluster = ClusterHarness.clusterSession("graft-kill-rehearsal",
      executors = 3, coresPerExec = 2, memMb = memMb,
      extraConf = Map(
        "spark.graft.checkpoint.replicated" -> "true",
        "spark.task.maxFailures" -> "8",
        "spark.stage.maxConsecutiveAttempts" -> "8",
        // a killed executor must not poison the app via blacklisting
        "spark.excludeOnFailure.enabled" -> "false"))
    var bad = 0
    try {
      val before = ClusterHarness.requireMultiJvm(cluster)
      println(s"REHEARSAL executors: ${before.mkString(", ")}")
      RehearsalQueries.foreach { name =>
        // time one untouched cluster run to place the kill mid-flight
        val t0 = System.nanoTime()
        val warm = digestOf(SparkEntry.queries(name)(cluster, sfDir))
        val wallMs = (System.nanoTime() - t0) / 1000000
        val killer = killOneExecutorAfter(cluster, math.max(200L, wallMs / 3))
        val got =
          try Right(digestOf(SparkEntry.queries(name)(cluster, sfDir)))
          catch { case e: Throwable => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}") }
        killer.join(30000)
        val exp = expected(name)
        got match {
          case Right(g) if g == exp && warm == exp =>
            println(s"ok   $name survived executor kill (rows=${g._1})")
          case Right(g) =>
            bad += 1
            println(s"DIVERGED $name: baseline=$exp warm=$warm killed-run=$g")
          case Left(err) =>
            bad += 1
            println(s"FAILED $name after kill: $err")
        }
        // wait for the worker to relaunch a replacement before next query
        var tries = 0
        while (ClusterHarness.executorJvms(cluster).size < 3 && tries < 60) {
          Thread.sleep(1000); tries += 1
        }
      }
    } finally cluster.stop()
    println(if (bad == 0) s"KILL-REHEARSAL OK: ${RehearsalQueries.size} queries survived"
            else s"KILL-REHEARSAL FAILED: $bad")
    if (bad > 0) sys.exit(1)
  }
}

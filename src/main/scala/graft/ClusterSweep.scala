package graft

import org.apache.spark.sql.SparkSession

/** Full-surface multi-executor rehearsal: EVERY registered query on
  * `local-cluster[2,2,m]` (real executor JVMs, real serialization
  * boundary) compared against a `local[4]` baseline in the same JVM —
  * the whole-suite extension of ClusterModeSpec's CI-fast 12-query smoke
  * set. Run: `sbt "runMain graft.ClusterSweep [sfDir] [execMemMb]"`;
  * prints one verdict line per query and a final summary (exit 1 on any
  * divergence). Default executor memory is 1024 MB (the round-9 gate
  * shape); the sf0.1 bench-scale sweep passes 2048 so broadcast sizes
  * and shuffle spill run the configuration a real cluster would.
  *
  * The four sketch-family queries (a8s/a9s/a10s/k16 — see
  * SparkEntry.noOracleRationale) compare ROW COUNTS only: their values
  * are merge-order-dependent by contract (GK quantiles especially), and
  * executor scheduling legitimately reorders partial merges. Everything
  * else must reproduce exactly (doubles at 9 significant digits, via
  * [[ClusterHarness.canonValue]] — the same canonicalizer the CI gate
  * uses, so the two cannot drift).
  */
object ClusterSweep {

  private def runAll(s: SparkSession, sfDir: String,
      rowsOnly: Set[String]): Map[String, (Long, String)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val df = fn(s, sfDir)
      val rows = df.collect()
      val digest =
        if (rowsOnly(name)) "rows-only"
        else {
          val schema = df.columns.mkString("<", "|", ">")
          val md = java.security.MessageDigest.getInstance("MD5")
          rows.map(r => schema + ClusterHarness.canonValue(r)).sorted
            .foreach(l => md.update(l.getBytes("UTF-8")))
          md.digest().map(b => f"$b%02x").mkString
        }
      name -> ((rows.length.toLong, digest))
    }.toMap

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val memMb = args.lift(1).map(_.toInt).getOrElse(1024)
    val rowsOnly = SparkEntry.noOracleRationale.keySet
    val local = ClusterHarness.localSession("graft-sweep-baseline")
    val expected = try runAll(local, sfDir, rowsOnly) finally local.stop()
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()

    val cluster = ClusterHarness.clusterSession("graft-sweep-cluster", memMb = memMb)
    try {
      val jvms = ClusterHarness.requireMultiJvm(cluster)
      val driver = java.lang.management.ManagementFactory.getRuntimeMXBean.getName
      println(s"SWEEP executors: ${jvms.mkString(", ")} (driver $driver)")
      val got = runAll(cluster, sfDir, rowsOnly)
      var bad = 0
      expected.toSeq.sortBy(_._1).foreach { case (name, (en, ed)) =>
        val (gn, gd) = got(name)
        val ok = en == gn && ed == gd
        if (!ok) bad += 1
        println(f"SWEEP ${if (ok) "ok  " else "DIVERGED"} $name%-32s rows $en%6d/$gn%-6d ${if (ed == "rows-only") "rows-only" else if (ed == gd) "hash=" else s"hash $ed != $gd"}")
      }
      println(s"SWEEP SUMMARY ${expected.size - bad} ok, $bad diverged")
      if (bad > 0) sys.exit(1)
    } finally cluster.stop()
  }
}

package graft.covsonar

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The population-scale `match` rehearsal on REAL executor JVMs — the
  * multi-JVM twin of [[MatchVolumeRehearsal]]: same synthesized population
  * (shared synthesis code), same golden shapes, run on
  * `local-cluster[2,2,mem]` and digest-compared against a `local[4]`
  * baseline. Exercises what single-JVM local mode structurally cannot:
  * the match plan's broadcasts and carrier IN-lists crossing a real
  * serialization boundary, the token-index carrier collect from executor
  * JVMs, and parquet bloom/min-max skipping through executor-side readers.
  *
  * Also proves the BUCKETED essence-join layout at this scale across real
  * executors: genome and profile written `bucketBy(8, seqhash)` join with
  * ZERO Exchange in the plan (StoreBucketingSpec pins this single-JVM at
  * 2k rows; here it holds at 10⁶ on a real cluster, and the bucketed join
  * row counts agree with the store plan's).
  *
  * Run: `sbt "runMain graft.covsonar.MatchClusterRehearsal [n] [memMb]"`.
  * Exits 1 on any divergence.
  */
object MatchClusterRehearsal {

  private def digests(s: SparkSession, store: SonarStore,
      shapes: Seq[(String, MatchArgs)]): Map[String, (Long, String)] =
    shapes.map { case (name, margs) =>
      val rows = SonarMatch.matchGenomes(store, margs).collect()
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map(r => graft.ClusterHarness.canonValue(r)).sorted
        .foreach(l => md.update(l.getBytes("UTF-8")))
      name -> ((rows.length.toLong, md.digest().map(b => f"$b%02x").mkString))
    }.toMap

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val memMb = args.lift(1).map(_.toInt).getOrElse(2048)
    val dir = new java.io.File("target/match-cluster-store").getAbsolutePath
    val shapes = MatchVolumeRehearsal.goldenShapes

    // baseline session builds the store ONCE (both sessions read the same
    // on-disk store — what differs is the engine topology, exactly the
    // variable under test) and runs the shapes single-JVM, indexed
    val local = graft.ClusterHarness.localSession("graft-match-cluster-baseline")
    val (expectedIndexed, expectedPlain) = try {
      val store = MatchVolumeRehearsal.buildStore(local, dir, n)
      SonarOps.optimize(store, maxFilesPerTable = 16, rowGroupBytes = Some(8L << 20))
      val idx = digests(local, store, shapes)
      local.conf.set("spark.graft.match.tokenIndex", "false")
      val plain = try digests(local, store, shapes)
        finally local.conf.unset("spark.graft.match.tokenIndex")
      require(idx == plain, s"indexed vs full-scan diverged single-JVM: " +
        s"${idx.toSeq.diff(plain.toSeq)}")
      (idx, plain)
    } finally local.stop()
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()

    val cluster = graft.ClusterHarness.clusterSession("graft-match-cluster",
      executors = 2, coresPerExec = 2, memMb = memMb)
    var bad = 0
    try {
      val jvms = graft.ClusterHarness.requireMultiJvm(cluster)
      println(s"CLUSTER executors: ${jvms.mkString(", ")}")
      val store = new SonarStore(cluster, dir)
      require(TokenIndex.isFresh(store), "index must be fresh for the cluster run")

      val t0 = System.nanoTime()
      val got = digests(cluster, store, shapes)
      println(f"CLUSTER indexed shapes in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      shapes.foreach { case (name, _) =>
        if (got(name) == expectedIndexed(name))
          println(s"ok   $name rows=${got(name)._1}")
        else { bad += 1; println(s"DIVERGED $name: ${got(name)} vs ${expectedIndexed(name)}") }
      }

      // bucketed essence-join proof at volume on real executors
      cluster.sql("DROP TABLE IF EXISTS genome_bkt")
      cluster.sql("DROP TABLE IF EXISTS profile_bkt")
      store.table("genome").write.bucketBy(8, "seqhash").sortBy("seqhash")
        .saveAsTable("genome_bkt")
      store.table("profile").write.bucketBy(8, "seqhash").sortBy("seqhash")
        .saveAsTable("profile_bkt")
      val prev = cluster.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        cluster.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val joined = cluster.table("genome_bkt")
          .join(cluster.table("profile_bkt"), Seq("seqhash"), "left")
        val plan = joined.queryExecution.executedPlan.toString
        val noExchange = !plan.contains("Exchange")
        val cnt = joined.count()
        val expectCnt = store.table("genome").count()
        println(s"BUCKETED join exchangeFree=$noExchange rows=$cnt (genomes=$expectCnt)")
        if (!noExchange || cnt != expectCnt) { bad += 1; println("BUCKETED-JOIN FAILED") }
      } finally {
        cluster.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        cluster.sql("DROP TABLE IF EXISTS genome_bkt")
        cluster.sql("DROP TABLE IF EXISTS profile_bkt")
      }
    } finally cluster.stop()
    println(if (bad == 0) s"MATCH-CLUSTER OK: ${shapes.size} shapes reproduced + bucketed join exchange-free"
            else s"MATCH-CLUSTER FAILED: $bad")
    if (bad > 0) sys.exit(1)
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Full-surface multi-executor rehearsal: EVERY registered query on
  * `local-cluster[2,2,1024]` (real executor JVMs, real serialization
  * boundary) compared against a `local[4]` baseline in the same JVM —
  * the whole-suite extension of ClusterModeSpec's CI-fast 12-query smoke
  * set. Run: `sbt "runMain graft.ClusterSweep [sfDir]"`; prints one
  * verdict line per query and a final summary (exit 1 on any divergence).
  *
  * The four sketch-family queries (a8s/a9s/a10s/k16 — see
  * SparkEntry.noOracleRationale) compare ROW COUNTS only: their values
  * are merge-order-dependent by contract (GK quantiles especially), and
  * executor scheduling legitimately reorders partial merges. Everything
  * else must reproduce exactly (doubles at 9 significant digits).
  */
object ClusterSweep {

  private def canonValue(v: Any): String = v match {
    case null => "∅"
    case b: Array[Byte] => java.util.Base64.getEncoder.encodeToString(b)
    case d: Double =>
      if (d.isNaN || d.isInfinite) d.toString
      else if (d == 0.0) "0"
      else f"${BigDecimal(d).round(new java.math.MathContext(9))}%s"
    case f: Float => canonValue(f.toDouble)
    case s: scala.collection.Seq[_] => s.map(canonValue).mkString("[", ",", "]")
    case a: Array[_] => a.map(canonValue).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => canonValue(k) + ":" + canonValue(x) }
        .toSeq.sorted.mkString("{", ",", "}")
    case r: org.apache.spark.sql.Row => r.toSeq.map(canonValue).mkString("(", ",", ")")
    case x => x.toString
  }

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
          rows.map(r => schema + canonValue(r)).sorted
            .foreach(l => md.update(l.getBytes("UTF-8")))
          md.digest().map(b => f"$b%02x").mkString
        }
      name -> ((rows.length.toLong, digest))
    }.toMap

  private def localSession(): SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .appName("graft-sweep-baseline")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Tables.configure(s)
    s
  }

  private def clusterSession(): SparkSession = {
    val home = new java.io.File("target/spark-test-home").getAbsoluteFile
    home.mkdirs()
    val jars = new java.io.File(home, "jars").toPath
    if (!java.nio.file.Files.exists(jars))
      java.nio.file.Files.createSymbolicLink(jars,
        java.nio.file.Paths.get("/opt/spark/jars"))
    new java.io.File(home, "launcher/target/scala-2.13").mkdirs()
    sys.props("spark.testing") = "true"
    sys.props("spark.test.home") = home.getAbsolutePath
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")
    val s = SparkSession.builder().master("local-cluster[2,2,1024]")
      .appName("graft-sweep-cluster")
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.executor.extraJavaOptions", addOpens)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Tables.configure(s)
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val rowsOnly = SparkEntry.noOracleRationale.keySet
    val local = localSession()
    val expected = try runAll(local, sfDir, rowsOnly) finally local.stop()
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()

    val cluster = clusterSession()
    try {
      val jvms = cluster.sparkContext.range(0, 8, 1, 8)
        .map(_ => java.lang.management.ManagementFactory.getRuntimeMXBean.getName)
        .collect().toSet
      val driver = java.lang.management.ManagementFactory.getRuntimeMXBean.getName
      require(jvms.size >= 2 && !jvms.contains(driver),
        s"not multi-JVM: executors=$jvms driver=$driver")
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

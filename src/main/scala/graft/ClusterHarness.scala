package graft

import org.apache.spark.sql.SparkSession

/** The ONE definition of multi-JVM rehearsal plumbing, shared by the CI
  * gate (`ClusterModeSpec`), the full sweep (`graft.ClusterSweep`), and
  * the executor-loss rehearsal — so canonicalization and session config
  * cannot drift apart between the gate and the sweep without both seeing
  * the change.
  *
  * `local-cluster[n,c,m]` boots REAL executor JVMs behind a real
  * serialization boundary — the mode that catches closure capture of
  * driver state, non-serializable sketch buffers, codegen referencing
  * driver-only objects, and broadcast blocks that were only ever read
  * from the shared heap. Bring-up requirements (all handled here):
  * executors need the test JVM's classpath and JDK17 module opens, and
  * the standalone launcher needs a fake `spark.test.home` whose `jars`
  * links to /opt/spark/jars plus an empty `launcher/target/scala-2.13`
  * dir (the launcher infers the Scala version from build-dir layout).
  */
object ClusterHarness {

  /** Canonical textual form of a result cell: doubles rounded to 9
    * significant digits (reduction order across real executors differs at
    * ulp level), non-finite doubles verbatim (BigDecimal would crash —
    * a NaN divergence must read as a diff, not a harness crash), arrays /
    * seqs / maps / nested rows recursively canonicalized.
    */
  def canonValue(v: Any): String = v match {
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

  /** Single-JVM baseline session, config-matched to [[clusterSession]]
    * (same shuffle partitions so plan shapes match across the compare).
    */
  def localSession(appName: String, shufflePartitions: Int = 8): SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Tables.configure(s)
    s
  }

  /** JDK17 module opens every executor JVM needs (mirrors the driver's). */
  val addOpens: String = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ") +
    // JDK17 G1 GCLocker retry budget — same spurious-OOM guard build.sbt
    // applies to the driver/local JVM (see the comment there)
    " -XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=64"

  /** Multi-JVM session on `local-cluster[executors,coresPerExec,memMb]`.
    * `extraConf` lets a caller raise task retry counts for the
    * executor-kill rehearsal without forking the builder.
    */
  def clusterSession(appName: String, executors: Int = 2, coresPerExec: Int = 2,
      memMb: Int = 1024, shufflePartitions: Int = 8,
      extraConf: Map[String, String] = Map.empty): SparkSession = {
    val home = new java.io.File("target/spark-test-home").getAbsoluteFile
    home.mkdirs()
    val jars = new java.io.File(home, "jars").toPath
    if (!java.nio.file.Files.exists(jars))
      java.nio.file.Files.createSymbolicLink(jars,
        java.nio.file.Paths.get("/opt/spark/jars"))
    new java.io.File(home, "launcher/target/scala-2.13").mkdirs()
    sys.props("spark.testing") = "true"
    sys.props("spark.test.home") = home.getAbsolutePath
    var b = SparkSession.builder()
      .master(s"local-cluster[$executors,$coresPerExec,$memMb]")
      .appName(appName)
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.executor.extraJavaOptions", addOpens)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    extraConf.foreach { case (k, v) => b = b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Tables.configure(s)
    s
  }

  /** Executor JVM names (`pid@host`) observed from inside tasks — the
    * multi-JVM proof every rehearsal runs before trusting anything else,
    * and the pid source for the kill rehearsal.
    */
  def executorJvms(s: SparkSession, probes: Int = 8): Set[String] =
    s.sparkContext.range(0, probes, 1, probes)
      .map(_ => java.lang.management.ManagementFactory.getRuntimeMXBean.getName)
      .collect().toSet

  def requireMultiJvm(s: SparkSession): Set[String] = {
    val jvms = executorJvms(s)
    val driver = java.lang.management.ManagementFactory.getRuntimeMXBean.getName
    require(jvms.size >= 2 && !jvms.contains(driver),
      s"not multi-JVM: executors=$jvms driver=$driver")
    jvms
  }
}

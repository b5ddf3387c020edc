package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time individual registered queries by name against a
  * scale-factor dir, e.g.
  * `sbt "runMain graft.QueryTimer d4_ngram_jaccard d4_ngram_jaccard"`
  * (run a name twice to separate cold codegen/JIT cost from steady state).
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object QueryTimer {
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
    for (q <- names) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(q)(spark, sfDir)
      val n = df.count()
      println(f"TIME $q ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      if (explain) df.explain("formatted")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Throwaway rehearsal main for d4c's Heaps-corpus exponent (deleted after
  * the SCALING.md row lands). Runs d4cRaw twice per dir, prints min.
  */
object D4CTime {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.configure(spark)
    for (dir <- args) {
      val times = (1 to 2).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        val n = graft.queries.PipelineQueries.d4cRaw(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"D4C $dir $dt%.1f s ($n rows)")
        dt
      }
      println(f"D4C MIN $dir ${times.min}%.1f s")
    }
    spark.stop()
  }
}

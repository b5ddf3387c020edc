package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated testdata tables (TESTDATA.md).
  *
  * Each table is one parquet file under the scale-factor dir. At 100 TB these
  * would be multi-file partitioned datasets; `spark.read.parquet` handles both
  * shapes identically, and every query in this library addresses tables through
  * this single chokepoint so a production deployment can swap in catalog tables
  * (or bucketed / partitioned layouts) without touching operator code.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Tables small enough to broadcast at any realistic scale factor (TPC-H
    * dims `region`/`nation` are constant-size; `supplier`/`part`/`customer`
    * grow with SF but stay broadcastable far longer than the fact tables).
    * Only `region` and `nation` are unconditionally broadcast in query code;
    * everything else is left to AQE's size-based join selection.
    */
  val tinyDims: Set[String] = Set("region", "nation")

  /** Runtime confs every entry point (Verify/Bench/specs) sets at session
    * construction. events.ts is parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects; this reads it as raw long nanos instead.
    * Also registers the library's native Catalyst expressions.
    */
  def configure(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.functions.VectorExpressions.register(spark)
  }

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      configure(spark) // defensive for externally-built sessions; idempotent
      // Integer `div` (not `/`, which is double division: epoch nanos exceed
      // double's 2^53 exact range and would round ~12% of rows 1µs off vs
      // exact truncation). Micros truncation itself is lossless for every
      // registered query (no sub-microsecond semantics).
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000L)"))
    } else spark.read.parquet(s"$sfDir/$name.parquet")
}

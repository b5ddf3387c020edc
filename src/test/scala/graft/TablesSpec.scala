package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the schema-adaptive events loader against BOTH timestamp vintages
  * the testdata has shipped with: raw int64 nanos (parquet TIMESTAMP(NANOS)
  * read via nanosAsLong) and proper TIMESTAMP(MICROS). Round 2 shipped a
  * loader that only handled one vintage and 17 operators failed analysis —
  * this spec makes that class of regression a test failure, not a silent
  * artifact gap.
  */
class TablesSpec extends SparkSpec {

  private def writeEvents(dir: String, tsCol: org.apache.spark.sql.Column): Unit = {
    import spark.implicits._
    Seq((1L, 1700000000123456789L, 10L, "click", 1.5, "{}"),
        (2L, 1700000001987654321L, 11L, "view", 2.5, "{}"))
      .toDF("event_id", "ns", "user_id", "event_type", "value", "props")
      .withColumn("ts", tsCol)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("long-nanos vintage converts to TIMESTAMP with truncating division") {
    val dir = java.nio.file.Files.createTempDirectory("tbl-nanos").toString
    writeEvents(dir, col("ns")) // plain int64 column named ts ≙ nanosAsLong read
    val ev = Tables.t(spark, dir, "events")
    assert(ev.schema("ts").dataType == TimestampType, ev.schema("ts").dataType)
    val us = ev.orderBy("event_id").select(expr("unix_micros(ts)"))
      .collect().map(_.getLong(0))
    assert(us.sameElements(Array(1700000000123456L, 1700000001987654L)),
      us.mkString(","))
  }

  test("timestamp-micros vintage passes through with identical epoch micros") {
    // cast to TIMESTAMP_NTZ so the parquet footer gets the REAL vintage —
    // TIMESTAMP(MICROS, isAdjustedToUTC=false) — which only loads as plain
    // TIMESTAMP because Tables.configure disables NTZ inference; a plain
    // TimestampType write would pass this test even without that conf
    val dir = java.nio.file.Files.createTempDirectory("tbl-micros").toString
    writeEvents(dir, timestamp_micros(expr("ns div 1000L")).cast("timestamp_ntz"))
    val ev = Tables.t(spark, dir, "events")
    assert(ev.schema("ts").dataType == TimestampType, ev.schema("ts").dataType)
    val us = ev.orderBy("event_id").select(expr("unix_micros(ts)"))
      .collect().map(_.getLong(0))
    assert(us.sameElements(Array(1700000000123456L, 1700000001987654L)),
      us.mkString(","))
  }

  test("rowCount reads footer stats equal to a distributed count, for single files and part-file dirs") {
    // single-file testdata shape
    val li = s"$sf/lineitem.parquet"
    assert(Tables.rowCount(spark, li) == spark.read.parquet(li).count())
    // production shape: a directory of part-files
    val dir = java.nio.file.Files.createTempDirectory("tbl-parts").toString
    spark.range(0, 1000).repartition(4).write.mode("overwrite").parquet(s"$dir/t.parquet")
    assert(Tables.rowCount(spark, s"$dir/t.parquet") == 1000L)
  }

  test("rowCount invalidates on rewrite/append and refuses layouts it would undercount") {
    // rewrite at the same path must not serve the stale cached count — the
    // adaptive operators would mis-size and d4b's oracle (which recomputes
    // count(*) live) would silently hash-diverge
    val dir = java.nio.file.Files.createTempDirectory("tbl-stale").toString
    spark.range(0, 100).coalesce(1).write.mode("overwrite").parquet(s"$dir/t.parquet")
    assert(Tables.rowCount(spark, s"$dir/t.parquet") == 100L)
    spark.range(0, 250).coalesce(1).write.mode("overwrite").parquet(s"$dir/t.parquet")
    assert(Tables.rowCount(spark, s"$dir/t.parquet") == 250L,
      "rewrite at the same path served a stale cached count")
    spark.range(0, 50).coalesce(1).write.mode("append").parquet(s"$dir/t.parquet")
    assert(Tables.rowCount(spark, s"$dir/t.parquet") == 300L,
      "append at the same path served a stale cached count")
    // an empty directory must throw, not return 0 (a zero silently disables
    // every volume-adaptive plan gate)
    val empty = java.nio.file.Files.createTempDirectory("tbl-empty").toString
    intercept[IllegalArgumentException](Tables.rowCount(spark, empty))
    // a nested (partitioned) layout must throw, not undercount to the
    // top-level files only
    val part = java.nio.file.Files.createTempDirectory("tbl-part").toString
    spark.range(0, 100).withColumn("p", org.apache.spark.sql.functions.expr("id % 2"))
      .write.mode("overwrite").partitionBy("p").parquet(s"$part/t.parquet")
    intercept[IllegalArgumentException](Tables.rowCount(spark, s"$part/t.parquet"))
  }

  test("the real testdata events table is analyzable by every ts consumer shape") {
    val ev = Tables.t(spark, sf, "events")
    assert(ev.schema("ts").dataType == TimestampType)
    // the three expression shapes the registry uses against ts
    assert(ev.select(expr("unix_micros(ts)")).limit(1).count() == 1)
    assert(ev.select(window(col("ts"), "1 hour")).limit(1).count() == 1)
    assert(ev.select(date_trunc("hour", col("ts"))).limit(1).count() == 1)
  }
}

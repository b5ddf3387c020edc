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

  test("the real testdata events table is analyzable by every ts consumer shape") {
    val ev = Tables.t(spark, sf, "events")
    assert(ev.schema("ts").dataType == TimestampType)
    // the three expression shapes the registry uses against ts
    assert(ev.select(expr("unix_micros(ts)")).limit(1).count() == 1)
    assert(ev.select(window(col("ts"), "1 hour")).limit(1).count() == 1)
    assert(ev.select(date_trunc("hour", col("ts"))).limit(1).count() == 1)
  }
}

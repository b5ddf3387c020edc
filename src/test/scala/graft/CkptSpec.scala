package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.Ckpt._

/** Single-JVM semantics of the [[Ckpt]] fault-domain dials: identical
  * results under every dial, durable snapshots actually written in
  * reliable mode, and the every-N cadence keeping intermediate rounds
  * recomputable. (The loss claims themselves are rehearsed with real
  * executor kills in `graft.ClusterKillRehearsal` — this spec pins the
  * policy plumbing so a conf-key typo can't silently no-op the dial.)
  */
class CkptSpec extends SparkSpec {

  private def loop(rounds: Int): Long = {
    var df = spark.range(100).toDF("v")
    (1 to rounds).foreach { _ =>
      df = df.withColumn("v", col("v") + 1).lossTolerantCheckpoint()
    }
    df.agg(sum("v")).head.getLong(0)
  }

  // range(100) is 0..99; +1 per round → sum = Σ (i + rounds)
  private def expected(rounds: Int): Long = (0 until 100).map(_ + rounds).sum

  test("default (localCheckpoint) and replicated dial produce identical results") {
    assert(loop(5) == expected(5))
    spark.conf.set("spark.graft.checkpoint.replicated", "true")
    try assert(loop(5) == expected(5))
    finally spark.conf.unset("spark.graft.checkpoint.replicated")
  }

  test("reliable mode: durable snapshots land in the shared dir, results identical") {
    val dir = Files.createTempDirectory("relckpt")
    spark.conf.set("spark.graft.checkpoint.reliable", dir.toString)
    spark.conf.set("spark.graft.checkpoint.reliable.every", "2")
    try {
      assert(loop(6) == expected(6))
      // every=2 over 6 calls → ≥2 reliable snapshots regardless of the
      // global counter's phase when this test starts
      val rddDirs = Files.walk(dir).iterator()
      var snapshots = 0
      while (rddDirs.hasNext) {
        val p = rddDirs.next()
        if (p.getFileName.toString.startsWith("rdd-")) snapshots += 1
      }
      assert(snapshots >= 2, s"expected reliable rdd-* snapshot dirs under $dir, found $snapshots")
    } finally {
      spark.conf.unset("spark.graft.checkpoint.reliable")
      spark.conf.unset("spark.graft.checkpoint.reliable.every")
    }
  }

  test("reliable every=1: every call durable, results identical") {
    val dir = Files.createTempDirectory("relckpt1")
    spark.conf.set("spark.graft.checkpoint.reliable", dir.toString)
    try assert(loop(4) == expected(4))
    finally spark.conf.unset("spark.graft.checkpoint.reliable")
  }
}

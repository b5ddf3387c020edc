package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** The binidx token-shard sink: lossless roundtrip, in-shard epoch order,
  * contiguous offsets, byte-identical idempotent re-writes, and the loud
  * uint16 guard.
  */
class TokenShardsSpec extends SparkSpec {

  private def withDir(f: String => Unit): Unit = {
    val dir = Files.createTempDirectory("graft-binidx").toFile
    try f(dir.toString)
    finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete()
      }
      rm(dir)
    }
  }

  private def fixture = {
    import spark.implicits._
    // deterministic ids; doc 7 is empty (zero tokens) — offsets must skip it
    (1L to 20L).map { id =>
      val n = if (id == 7L) 0 else (id % 5).toInt + 1
      (id, id % 3, id, (0 until n).map(i => ((id * 31 + i * 7) % 1000).toInt))
    }.toDF("doc_id", "shard", "pos", "ids")
  }

  test("write → read roundtrips every document, in epoch order, offsets contiguous") {
    withDir { dir =>
      TokenShards.write(fixture, dir, nShards = 3)
      // one .bin + one .idx per shard, no temp litter
      val files = Files.list(Paths.get(dir)).iterator()
      val names = scala.collection.mutable.ArrayBuffer.empty[String]
      files.forEachRemaining(p => names += p.getFileName.toString)
      assert(names.sorted == Seq("shard-0.bin", "shard-0.idx", "shard-1.bin",
        "shard-1.idx", "shard-2.bin", "shard-2.idx"))
      val got = TokenShards.read(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getSeq[Int](3)))
      val expected = fixture.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](3)))
      assert(got.map(t => (t._1, t._2, t._4)).toSet == expected.toSet)
      // offsets are the running token prefix in pos order per shard
      got.groupBy(_._2).foreach { case (_, rows) =>
        var cum = 0L
        rows.sortBy(_._1).foreach { r => // pos == doc_id in this fixture
          assert(r._3 == cum, s"doc ${r._1} offset ${r._3} != $cum")
          cum += r._4.length
        }
      }
      // bin file sizes are exactly 2 bytes per token
      val binBytes = (0 to 2).map(s0 =>
        Files.size(Paths.get(s"$dir/shard-$s0.bin"))).sum
      assert(binBytes == 2L * expected.map(_._3.length).sum)
    }
  }

  test("re-writing the same input publishes byte-identical files") {
    withDir { dir =>
      TokenShards.write(fixture, dir, nShards = 3)
      val first = (0 to 2).flatMap(s0 => Seq(
        Files.readAllBytes(Paths.get(s"$dir/shard-$s0.bin")).toSeq,
        Files.readAllBytes(Paths.get(s"$dir/shard-$s0.idx")).toSeq))
      TokenShards.write(fixture, dir, nShards = 3)
      val second = (0 to 2).flatMap(s0 => Seq(
        Files.readAllBytes(Paths.get(s"$dir/shard-$s0.bin")).toSeq,
        Files.readAllBytes(Paths.get(s"$dir/shard-$s0.idx")).toSeq))
      assert(first == second, "replayed write changed published bytes")
    }
  }

  test("torn pair publish: orphan .bin is invisible to read(); replay heals byte-identically") {
    withDir { dir =>
      TokenShards.write(fixture, dir, nShards = 3)
      val committed = (0 to 2).flatMap(s0 => Seq(s"shard-$s0.bin", s"shard-$s0.idx"))
        .map(n => n -> Files.readAllBytes(Paths.get(s"$dir/$n")).toSeq).toMap
      // simulate a crash BETWEEN the pair's two renames: shard-1's .bin is
      // published but its .idx never made it (the .idx's stale .tmp is
      // still on disk, as a real kill would leave it)
      Files.delete(Paths.get(s"$dir/shard-1.idx"))
      Files.write(Paths.get(s"$dir/.shard-1.idx.tmp"), Array[Byte](1, 2, 3))
      // the orphan .bin must not surface: read() keys on .idx, so it sees
      // exactly the committed shards and throws nothing
      val torn = TokenShards.read(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](3)))
      val expected = fixture.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](3)))
      assert(torn.toSet == expected.filter(_._2 != 1L).toSet,
        "torn publish leaked or lost committed shards")
      // replay (the retried task / re-run job) recreates the torn shard
      // from scratch: every published file is byte-identical to the first
      // run and the stale .tmp is gone
      TokenShards.write(fixture, dir, nShards = 3)
      committed.foreach { case (n, bytes) =>
        assert(Files.readAllBytes(Paths.get(s"$dir/$n")).toSeq == bytes,
          s"replay changed published bytes of $n")
      }
      assert(!Files.exists(Paths.get(s"$dir/.shard-1.idx.tmp")), "stale .tmp survived replay")
      val healed = TokenShards.read(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](3)))
      assert(healed.toSet == expected.toSet)
    }
  }

  test("a token id over uint16 fails the write loudly") {
    import spark.implicits._
    withDir { dir =>
      val bad = Seq((1L, 0L, 0L, Seq(1, 70000))).toDF("doc_id", "shard", "pos", "ids")
      val ex = intercept[org.apache.spark.SparkException] {
        TokenShards.write(bad, dir, nShards = 1)
      }
      assert(ex.getMessage.contains("uint16") ||
        Option(ex.getCause).exists(_.getMessage.contains("uint16")))
    }
  }

  test("the pipe3-shaped corpus writes and reads back through the x14 artifact") {
    import spark.implicits._
    withDir { dir =>
      // encode the real sf0.001 corpus with the x14 vocabulary artifact
      val vocab = graft.queries.PipelineQueries.x9Vocab(spark, sf).collect()
        .map(r => (r.getAs[String]("tok"), r.getAs[Int]("vocab_id")))
      val m = map(vocab.flatMap { case (t0, id) => Seq(lit(t0), lit(id)) }.toIndexedSeq: _*)
      val enc = spark.read.parquet(s"$sf/documents.parquet")
        .withColumn("ids",
          transform(split(col("text"), " "), tk => coalesce(element_at(m, tk), lit(0))))
        .withColumn("shard", col("doc_id") % 4)
        .withColumn("pos", col("doc_id"))
        .select("doc_id", "shard", "pos", "ids")
      TokenShards.write(enc, dir, nShards = 4)
      val back = TokenShards.read(spark, dir)
        .select("doc_id", "ids").collect()
        .map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
      val orig = enc.select("doc_id", "ids").collect()
        .map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
      assert(back == orig, "corpus roundtrip through binidx bytes diverged")
    }
  }
}

package graft.sources

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream}
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Trainer-consumable token-shard sink + reader — the `.bin`/`.idx` pair a
  * pretraining loader memory-maps (the Megatron-LM binidx shape): per
  * shard, `shard-<id>.bin` holds every document's token ids concatenated
  * in epoch order as little-endian uint16, and `shard-<id>.idx` holds
  * fixed-width (doc_id: int64, offset: int64, n_tokens: int32) records —
  * LE throughout — so a loader can slice any document without parsing.
  * This is the byte-level completion of pipe3: pipe3 plans WHERE every
  * sequence lands, TokenShards writes the actual artifact.
  *
  * Scale shape: `repartition(nShards, shard)` routes every shard to one
  * task and `sortWithinPartitions(shard, pos)` fixes the in-file order, so
  * each task streams its shards sequentially and writes each exactly once
  * — file count = shard count BY CONSTRUCTION (CorpusSink's discipline
  * applied to a non-parquet format). Files are written to a temp name and
  * atomically renamed, so a re-run (speculative task, job retry) is
  * idempotent: same input → byte-identical files. In a cluster deployment
  * `dir` is a task-visible shared filesystem (the same contract every
  * Hadoop OutputFormat has); a cloud run would wrap this in a
  * FileCommitProtocol, which changes the rename target, not the bytes.
  */
object TokenShards {

  val MaxTokenId = 0xffff

  /** Write `(doc_id: long, shard: long, pos: long, ids: array<int>)` as
    * binidx shard files under `dir`. Every id must fit uint16 (vocab +
    * sentinel space of the x9/x14 artifact family); violations fail the
    * task loudly rather than truncating bits.
    */
  def write(df: DataFrame, dir: String, nShards: Int): Unit = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    Files.createDirectories(Paths.get(dir))
    df.select(col("doc_id").cast("long"), col("shard").cast("long"),
        col("pos").cast("long"), col("ids"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "pos")
      .foreachPartition { (it: Iterator[Row]) =>
        var cur = -1L
        var bin: DataOutputStream = null
        var idx: DataOutputStream = null
        var offset = 0L
        def close(): Unit = if (cur >= 0) {
          bin.close(); idx.close()
          bin = null; idx = null
          // atomic publish: a replayed task overwrites with identical
          // bytes. Each rename is atomic but the PAIR is not — so the
          // .bin publishes first and the .idx last, and read() discovers
          // shards by .idx: the .idx is the pair's commit marker, and a
          // crash between the two renames leaves only an invisible orphan
          // .bin that the replay overwrites.
          Files.move(Paths.get(s"$dir/.shard-$cur.bin.tmp"),
            Paths.get(s"$dir/shard-$cur.bin"), StandardCopyOption.REPLACE_EXISTING,
            StandardCopyOption.ATOMIC_MOVE)
          Files.move(Paths.get(s"$dir/.shard-$cur.idx.tmp"),
            Paths.get(s"$dir/shard-$cur.idx"), StandardCopyOption.REPLACE_EXISTING,
            StandardCopyOption.ATOMIC_MOVE)
        }
        // a row failure mid-shard (e.g. the uint16 require) must not leak
        // open handles or stale dot-files: the retried task recreates the
        // .tmp from scratch, and only close()'s atomic rename publishes
        try {
          it.foreach { r =>
            val (id, shard, ids) =
              (r.getLong(0), r.getLong(1), r.getSeq[Int](3))
            if (shard != cur) {
              close()
              cur = shard
              offset = 0L
              bin = new DataOutputStream(new BufferedOutputStream(
                new FileOutputStream(s"$dir/.shard-$cur.bin.tmp")))
              idx = new DataOutputStream(new BufferedOutputStream(
                new FileOutputStream(s"$dir/.shard-$cur.idx.tmp")))
            }
            idx.writeLong(java.lang.Long.reverseBytes(id))
            idx.writeLong(java.lang.Long.reverseBytes(offset))
            idx.writeInt(java.lang.Integer.reverseBytes(ids.length))
            ids.foreach { tid =>
              require(tid >= 0 && tid <= MaxTokenId,
                s"token id $tid of doc $id exceeds uint16")
              bin.write(tid & 0xff); bin.write((tid >> 8) & 0xff)
            }
            offset += ids.length
          }
          close()
        } catch {
          case e: Throwable =>
            if (bin != null) try bin.close() catch { case _: Throwable => }
            if (idx != null) try idx.close() catch { case _: Throwable => }
            if (cur >= 0) {
              Files.deleteIfExists(Paths.get(s"$dir/.shard-$cur.bin.tmp"))
              Files.deleteIfExists(Paths.get(s"$dir/.shard-$cur.idx.tmp"))
            }
            throw e
        }
      }
  }

  /** Parse a binidx directory back to `(doc_id, shard, offset, ids)` rows —
    * the loader's slice rule, used by the roundtrip spec and by any
    * downstream audit that must certify the written bytes, not the plan
    * that produced them. One task per shard file pair. Discovery is keyed
    * on the `.idx` file — the LAST of the pair to publish — so a torn
    * publish (crash between the two renames) is invisible: a `.idx`
    * implies its `.bin` was already renamed, while an orphan `.bin` with
    * no `.idx` is simply not listed.
    */
  def read(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
    val listing = Files.list(Paths.get(dir))
    try listing.iterator().forEachRemaining { p =>
      val n = p.getFileName.toString
      if (n.startsWith("shard-") && n.endsWith(".idx"))
        ids += n.stripPrefix("shard-").stripSuffix(".idx").toLong
    } finally listing.close()
    spark.sparkContext.parallelize(ids.toSeq, math.max(1, ids.size))
      .flatMap { shard =>
        val bin = Files.readAllBytes(Paths.get(s"$dir/shard-$shard.bin"))
        val idx = Files.readAllBytes(Paths.get(s"$dir/shard-$shard.idx"))
        require(idx.length % 20 == 0,
          s"shard $shard idx is ${idx.length} bytes — not 20-byte records")
        val ib = java.nio.ByteBuffer.wrap(idx)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        Iterator.continually(()).takeWhile(_ => ib.remaining() >= 20).map { _ =>
          val id = ib.getLong; val off = ib.getLong; val n = ib.getInt
          require(n >= 0 && off >= 0 && (off + n) * 2 <= bin.length,
            s"shard $shard doc $id slice [$off, $off+$n) exceeds the bin payload")
          val out = new Array[Int](n)
          var i = 0
          while (i < n) {
            val b0 = bin((off.toInt + i) * 2) & 0xff
            val b1 = bin((off.toInt + i) * 2 + 1) & 0xff
            out(i) = b0 | (b1 << 8)
            i += 1
          }
          (id, shard, off, out.toSeq)
        }
      }.toDF("doc_id", "shard", "offset", "ids")
  }
}

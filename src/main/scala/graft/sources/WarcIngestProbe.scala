package graft.sources

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.util.zip.GZIPOutputStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** WARC ingest throughput at a realistic coding mix — the measurement
  * behind SCALING.md's corpus-I/O row for brotli-heavy crawls
  * (CommonCrawl serves ~40-50% of response bodies `Content-Encoding: br`;
  * until round 10 those bodies degraded to empty, so no end-to-end number
  * existed for the regime where the in-repo RFC 7932 decoder carries half
  * the bytes).
  *
  * Synthesizes `files` WARC segments whose response bodies cycle a
  * 45% br / 40% gzip / 15% identity mix — the br bodies are the REAL
  * reference-encoder fixtures from BrotliSpec (entropy-coded across 5
  * qualities × 4 window sizes × 11 content classes), not stored-block
  * toys — half the segments additionally wrapped in whole-file gzip
  * (CommonCrawl ships `.warc.gz`). Then times
  * `WarcDocs.read(extractText = true)` end to end and reports docs/s and
  * compressed-input MB/s, per coding class.
  *
  * All decoding runs inside the source's per-file flatMap on executors —
  * the probe prints the partition count to show the driver never touches
  * a payload. Run: `sbt "runMain graft.sources.WarcIngestProbe [files] [recsPerFile]"`.
  */
object WarcIngestProbe {

  private def gzipBytes(b: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  private def syntheticHtml(i: Int): String = {
    val words = Seq("data", "pipeline", "corpus", "crawl", "token", "model",
      "training", "quality", "dedup", "shard")
    val body = (0 until 400).map(j => words((i * 31 + j * 7) % words.size)).mkString(" ")
    s"<!doctype html><html><head><title>doc $i</title></head><body><p>$body</p></body></html>"
  }

  private def httpResponse(body: Array[Byte], coding: Option[String]): Array[Byte] = {
    val head = new StringBuilder("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n")
    coding.foreach(c => head.append(s"Content-Encoding: $c\r\n"))
    head.append(s"Content-Length: ${body.length}\r\n\r\n")
    val h = head.toString.getBytes("ISO-8859-1")
    val out = new Array[Byte](h.length + body.length)
    System.arraycopy(h, 0, out, 0, h.length)
    System.arraycopy(body, 0, out, h.length, body.length)
    out
  }

  private def warcRecord(uri: String, payload: Array[Byte]): Array[Byte] = {
    val hdr = (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
      s"WARC-Date: 2026-08-16T00:00:00Z\r\nContent-Type: application/http;msgtype=response\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes("ISO-8859-1")
    val out = new ByteArrayOutputStream()
    out.write(hdr); out.write(payload); out.write("\r\n\r\n".getBytes("ISO-8859-1"))
    out.toByteArray
  }

  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(16)
    val recsPerFile = args.lift(1).map(_.toInt).getOrElse(400)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // real entropy-coded br streams: the BrotliSpec fixture corpus
    val fixDir = new java.io.File("src/test/resources/brotli")
    require(fixDir.isDirectory, s"run from the repo root (no $fixDir)")
    val brBodies: Array[Array[Byte]] = fixDir.listFiles()
      .filter(f => f.getName.endsWith(".br") && f.length > 0)
      .sortBy(_.getName)
      .map(f => java.nio.file.Files.readAllBytes(f.toPath))
    require(brBodies.nonEmpty, "no .br fixtures found")

    val outDir = new java.io.File("target/warc-probe")
    org.apache.commons.io.FileUtils.deleteQuietly(outDir)
    outDir.mkdirs()
    var compressedBytes = 0L
    (0 until nFiles).foreach { f =>
      val buf = new ByteArrayOutputStream()
      (0 until recsPerFile).foreach { r =>
        val i = f * recsPerFile + r
        // 45% br / 40% gzip / 15% identity (CommonCrawl-ish response mix)
        val rec = i % 20 match {
          case k if k < 9 =>
            warcRecord(s"http://example.com/br/$i",
              httpResponse(brBodies(i % brBodies.length), Some("br")))
          case k if k < 17 =>
            warcRecord(s"http://example.com/gzip/$i",
              httpResponse(gzipBytes(syntheticHtml(i).getBytes("UTF-8")), Some("gzip")))
          case _ =>
            warcRecord(s"http://example.com/plain/$i",
              httpResponse(syntheticHtml(i).getBytes("UTF-8"), None))
        }
        buf.write(rec)
      }
      // half the segments whole-file gzipped — CommonCrawl's wire format
      val (name, bytes) =
        if (f % 2 == 0) (f"seg$f%03d.warc.gz", gzipBytes(buf.toByteArray))
        else (f"seg$f%03d.warc", buf.toByteArray)
      val fos = new FileOutputStream(new java.io.File(outDir, name))
      fos.write(bytes); fos.close()
      compressedBytes += bytes.length
    }
    println(f"GENERATED $nFiles segments, ${nFiles * recsPerFile} records, " +
      f"${compressedBytes / 1e6}%.1f MB on disk (br bodies: real BrotliSpec fixtures)")

    def once(): (Long, Long, Double, org.apache.spark.sql.DataFrame) = {
      val t0 = System.nanoTime()
      val df = WarcDocs.read(spark, outDir.getPath + "/*", extractText = true)
      val agg = df.agg(count(lit(1)), sum("n_chars")).head()
      ((agg.getLong(0)), agg.getLong(1), (System.nanoTime() - t0) / 1e9, df)
    }
    val (docs1, chars1, s1, df) = once()
    val (docs2, chars2, s2, _) = once()
    require(docs1 == docs2 && chars1 == chars2, "non-deterministic read")
    val s = math.min(s1, s2)
    println(f"INGEST docs=$docs1 in $s%.2f s → ${docs1 / s}%.0f docs/s, " +
      f"${compressedBytes / 1e6 / s}%.1f MB/s compressed in, ${chars1 / 1e6}%.1f M chars out")
    println(s"PARTITIONS ${df.rdd.getNumPartitions} (binaryFiles packs whole segments " +
      "into tasks; parse+decode run inside the executor-side flatMap, never the driver)")

    // per-coding accounting: URI prefixes encode the class
    df.withColumn("coding", regexp_extract(col("source"), "example.com/(\\w+)/", 1))
      .groupBy("coding").agg(count(lit(1)).as("docs"), sum("n_chars").as("chars"))
      .orderBy("coding").collect()
      .foreach(r => println(s"CODING ${r.getString(0)} docs=${r.getLong(1)} chars=${r.getLong(2)}"))
    org.apache.commons.io.FileUtils.deleteQuietly(outDir)
    spark.stop()
  }
}

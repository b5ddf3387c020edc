package graft.multimodal

import graft.SparkSpec
import scala.util.Random

/** The WAV/RIFF codec behind m4: lossless roundtrip through real bytes,
  * generic chunk-walk robustness (junk chunks, odd-length padding), and
  * hard failure on malformed or hostile input.
  */
class AudioSpec extends SparkSpec {

  private def pcm(n: Int, seed: Long): Array[Short] = {
    val r = new Random(seed)
    Array.fill(n)(r.nextInt(65536) - 32768).map(_.toShort)
  }

  test("decode(synth(x)) == x, including empty, single, and max-amplitude") {
    for (samples <- Seq(
      Array.empty[Short],
      Array(0.toShort),
      Array(Short.MinValue, Short.MaxValue, 0.toShort, (-1).toShort, 1.toShort),
      pcm(200, 1), pcm(399, 2), pcm(4096, 3))) {
      val out = Audio.decodeWav(Audio.synthWav(samples))
      assert(out.toSeq == samples.toSeq)
    }
  }

  test("the chunk walk skips unknown chunks and honors odd-length padding") {
    // hand-build a WAV with an ODD-length junk chunk before fmt/data: a
    // walk that forgets the RIFF even-pad rule lands mid-chunk and fails
    val samples = pcm(64, 7)
    val canonical = Audio.synthWav(samples)
    // canonical = RIFF[4]+len[4]+WAVE[4] ++ rest; splice junk after WAVE
    val junkBody = Array.tabulate(7)(i => (i * 31).toByte) // odd length
    val junk = "JUNK".getBytes("US-ASCII") ++
      Array(7, 0, 0, 0).map(_.toByte) ++ junkBody ++ Array(0.toByte) // pad
    val rest = canonical.drop(12)
    val riffLen = 4 + junk.length + rest.length
    val lenLe = Array(riffLen & 0xff, (riffLen >> 8) & 0xff,
      (riffLen >> 16) & 0xff, (riffLen >> 24) & 0xff).map(_.toByte)
    val spliced = "RIFF".getBytes("US-ASCII") ++ lenLe ++
      "WAVE".getBytes("US-ASCII") ++ junk ++ rest
    assert(Audio.decodeWav(spliced).toSeq == samples.toSeq)
  }

  test("malformed and hostile blobs fail loudly, never over-read") {
    val good = Audio.synthWav(pcm(128, 11))
    def fails(b: Array[Byte]): Unit =
      assertThrows[IllegalArgumentException](Audio.decodeWav(b))
    fails(Array.empty[Byte])
    fails("RIFFxxxxWAVE".getBytes("US-ASCII")) // header only, no chunks
    fails(good.take(good.length - 3))          // truncated data chunk
    fails(good.take(20))                       // truncated fmt chunk
    // declared RIFF size beyond the physical blob
    val lying = good.clone(); lying(4) = 0xff.toByte; lying(5) = 0xff.toByte
    fails(lying)
    // stereo (unsupported channel count) must be rejected, not mis-decoded
    val stereo = good.clone()
    val fmtOff = 12 + 8 // fmt chunk body starts here in the canonical layout
    stereo(fmtOff + 2) = 2 // channels field
    fails(stereo)
    // data chunk before any fmt chunk
    val noFmt = {
      val s = pcm(4, 13)
      val body = "data".getBytes("US-ASCII") ++
        Array(8, 0, 0, 0).map(_.toByte) ++ s.flatMap(v =>
          Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte))
      val rl = 4 + body.length
      "RIFF".getBytes("US-ASCII") ++ Array(rl & 0xff, (rl >> 8) & 0xff,
        (rl >> 16) & 0xff, (rl >> 24) & 0xff).map(_.toByte) ++
        "WAVE".getBytes("US-ASCII") ++ body
    }
    fails(noFmt)
  }

  test("m4 features match a decoded-sample brute force at sf0.001") {
    val got = graft.queries.PipelineQueries.m4AudioFeatures(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val expected = docs.flatMap { case (id, text) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val s1 = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      val n = 200 + (s1 % 201).toInt
      val a = 3 + (s1 % 97); val b = s1 % 65536L
      val s = Array.tabulate(n)(i => (((a * i + b) % 65536L) - 32768L).toInt)
      val nf = ((math.max(n - 64, 0) + 31) / 32) + 1
      (0 until nf).map { f =>
        val fs = s.slice(f * 32, f * 32 + 64)
        val zc = fs.sliding(2).count(p => p.length == 2 && p(0) * p(1) < 0)
        (id, f, fs.length.toLong, fs.map(v => v.toLong * v).sum,
          zc.toLong, fs.map(v => math.abs(v).toLong).max)
      }
    }.toSeq
    assert(got == expected)
    // the fixture exercises overlap (multiple frames/doc) and sign changes
    assert(expected.groupBy(_._1).values.forall(_.size > 1))
    assert(expected.exists(_._5 > 0))
  }

  test("m5 pitch finds a planted period and respects Cauchy–Schwarz on real data") {
    // A period-20 square wave autocorrelates maximally at lag 20 within the
    // search window (the lag-40 echo loses terms to the shorter overlap).
    val square = Array.tabulate(400)(i => if ((i / 10) % 2 == 0) 10000 else -10000)
      .map(_.toShort)
    val (r0, lag, r) = graft.queries.PipelineQueries.pitchOf(square)
    assert(lag == 20L, s"expected the planted 20-sample period, got lag $lag")
    assert(r <= r0, "Cauchy–Schwarz violated on the planted signal")
    val rows = graft.queries.PipelineQueries.m5AudioPitch(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { row =>
      val (n, e0, bl, rb) = (row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
      assert(n >= 200 && n <= 400)
      assert(bl >= 16 && bl <= 48, s"best_lag $bl outside the search window")
      assert(rb <= e0, s"r_best $rb exceeds r0 $e0 — autocorrelation broken")
    }
  }
}

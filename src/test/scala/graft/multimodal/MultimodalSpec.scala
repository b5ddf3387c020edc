package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val blobs = {
    import spark.implicits._
    Tables.docs.map { case (id, text) => (id, text.getBytes("UTF-8")) }
      .toDF("doc_id", "blob").repartition(3)
  }

  private object Tables {
    val docs: Seq[(Long, String)] =
      (1L to 20L).map(i => i -> s"payload-$i-${"x" * (i * 37 % 300).toInt}")
  }

  test("decode is deterministic and schema-complete") {
    val d1 = Multimodal.decodeImages(blobs).collect().sortBy(_.doc_id)
    val d2 = Multimodal.decodeImages(blobs).collect().sortBy(_.doc_id)
    assert(d1.map(_.doc_id).sameElements(d2.map(_.doc_id)))
    d1.zip(d2).foreach { case (a, b) =>
      assert(a.width == b.width && a.height == b.height && a.channels == b.channels)
      assert(a.pixels.sameElements(b.pixels))
      assert(a.pixels.length == a.width * a.height * a.channels)
      assert(a.width >= 16 && a.width <= 32 && a.channels >= 1 && a.channels <= 3)
    }
  }

  test("decode is partition-local (no shuffle)") {
    val images = Multimodal.decodeImages(blobs)
    assert(images.rdd.getNumPartitions == blobs.rdd.getNumPartitions)
  }

  test("resize preserves channels and hits target dims") {
    val resized = Multimodal.resize(Multimodal.decodeImages(blobs), 8, 8).collect()
    assert(resized.length == 20)
    resized.foreach { im =>
      assert(im.width == 8 && im.height == 8)
      assert(im.pixels.length == 8 * 8 * im.channels)
    }
    // resampling picks actual source pixels: every output byte exists in input
    val orig = Multimodal.decodeImages(blobs).collect().map(i => i.doc_id -> i.pixels.toSet).toMap
    resized.foreach(im => assert(im.pixels.toSet.subsetOf(orig(im.doc_id))))
  }

  test("frame sampling takes every N-th fixed-size chunk") {
    val frames = Multimodal.sampleFrames(blobs, everyN = 2, frameBytes = 64)
      .collect().groupBy(_.doc_id)
    val blobLens = blobs.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).length).toMap
    blobLens.foreach { case (id, len) =>
      val total = (len + 63) / 64
      val expected = (total + 1) / 2
      assert(frames(id).length == expected, s"doc $id")
      assert(frames(id).map(_.frame_idx).sorted.toSeq == (0 until total by 2).toSeq)
    }
  }

  // --- real (pure-JVM, javax.imageio) codec ------------------------------

  /** Encode a deterministic w×h RGB test image to `fmt` bytes via ImageIO —
    * the spec builds real media payloads without any external fixture.
    */
  private def encoded(w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 41 + y * 17) % 256 << 16) | ((x * 7) % 256 << 8) | (y * 13) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  test("ImageIoCodec round-trips a real PNG bit-exactly (lossless)") {
    val w = 21; val h = 13
    val im = Multimodal.ImageIoCodec.decodeImage(7L, encoded(w, h, "png"))
    assert(im.doc_id == 7L && im.width == w && im.height == h && im.channels == 3)
    assert(im.pixels.length == w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val base = (y * w + x) * 3
      assert((im.pixels(base) & 0xff) == (x * 41 + y * 17) % 256, s"R($x,$y)")
      assert((im.pixels(base + 1) & 0xff) == (x * 7) % 256, s"G($x,$y)")
      assert((im.pixels(base + 2) & 0xff) == (y * 13) % 256, s"B($x,$y)")
    }
  }

  test("ImageIoCodec decodes a real JPEG (lossy: dims exact, pixels close)") {
    val w = 32; val h = 24
    val im = Multimodal.ImageIoCodec.decodeImage(8L, encoded(w, h, "jpg"))
    assert(im.width == w && im.height == h && im.channels == 3)
    // JPEG is lossy; mean absolute error per channel stays small
    var err = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val base = (y * w + x) * 3
      err += math.abs((im.pixels(base) & 0xff) - (x * 41 + y * 17) % 256)
    }
    assert(err / (w * h) < 48, s"JPEG mean error too high: ${err / (w * h)}")
    // undecodable bytes fail loudly, not silently
    intercept[IllegalArgumentException] {
      Multimodal.ImageIoCodec.decodeImage(9L, Array[Byte](1, 2, 3, 4))
    }
  }

  test("SniffCodec routes real media to ImageIO and junk to the stub; distributed decode") {
    import spark.implicits._
    val png = encoded(10, 10, "png")
    val junk = "not an image".getBytes("UTF-8")
    val mixed = Seq((1L, png), (2L, junk)).toDF("doc_id", "blob").repartition(2)
    val out = Multimodal.decodeImages(mixed, codec = Multimodal.SniffCodec)
      .collect().sortBy(_.doc_id)
    assert(out(0).width == 10 && out(0).height == 10 && out(0).channels == 3)
    val fake = Multimodal.FakeCodec.decodeImage(2L, junk)
    assert(out(1).width == fake.width && out(1).pixels.sameElements(fake.pixels),
      "junk blob must fall back to the deterministic stub")
  }

  test("SniffCodec degrades per-blob when the magic bytes lie (corrupt body)") {
    // valid JPEG magic, garbage body: ImageIO fails mid-decode; the sniff
    // codec must fall back to the stub instead of killing the task (Spark
    // would retry the same deterministic blob and fail the job)
    val liar = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++
      "definitely not jpeg entropy data".getBytes("UTF-8")
    val got = Multimodal.SniffCodec.decodeImage(3L, liar)
    val fake = Multimodal.FakeCodec.decodeImage(3L, liar)
    assert(got.width == fake.width && got.pixels.sameElements(fake.pixels),
      "corrupt-bodied blob must degrade to the deterministic stub")
  }

  test("perceptual hashes on real PNGs: noise-robust, brightness-invariant dHash, distinct images far apart") {
    import spark.implicits._
    def gradient(perturb: (Int, Int) => Int, bright: Int = 0): Array[Byte] = {
      val w = 64; val h = 48
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        // smooth gradient, values capped at 200 so +brightness never clamps
        val r = (x * 200 / w + perturb(x, y) + bright) max 0 min 255
        val g = (y * 200 / h + bright) max 0 min 255
        val b = ((x + y) * 100 / (w + h) + bright) max 0 min 255
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    val base = gradient((_, _) => 0)
    // re-encode jitter: scattered ±1 pixel noise
    val noisy = gradient((x, y) => if ((x * 31 + y * 7) % 53 == 0) 1 else 0)
    val brighter = gradient((_, _) => 0, bright = 10)
    val inverted = { // structurally different image
      val w = 64; val h = 48
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, ((200 - x * 200 / w) << 16) | ((200 - y * 200 / h) << 8) | 100)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val blobs = Seq(1L -> base, 2L -> noisy, 3L -> brighter, 4L -> inverted)
      .toDF("doc_id", "blob")
    val hs = Multimodal.perceptualHashes(
        Multimodal.decodeImages(blobs, codec = Multimodal.ImageIoCodec))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // tiny pixel noise barely moves 8×8 cell means: near-dup territory
    assert(ham(hs(1L)._1, hs(2L)._1) <= 3,
      s"aHash not noise-robust: ${ham(hs(1L)._1, hs(2L)._1)} bits")
    assert(ham(hs(1L)._2, hs(2L)._2) <= 3,
      s"dHash not noise-robust: ${ham(hs(1L)._2, hs(2L)._2)} bits")
    // a uniform brightness shift moves every cell equally: both hashes exact
    assert(hs(1L)._1 == hs(3L)._1 && hs(1L)._2 == hs(3L)._2,
      "hashes not brightness-invariant")
    // a structurally different image is many bits away on both hashes
    assert(ham(hs(1L)._1, hs(4L)._1) > 10 && ham(hs(1L)._2, hs(4L)._2) > 10,
      s"distinct images too close: a=${ham(hs(1L)._1, hs(4L)._1)} d=${ham(hs(1L)._2, hs(4L)._2)}")
  }

  test("real media end-to-end: PNG blobs → SniffCodec decode → resize → features") {
    // the full multimodal pipeline over REAL encoded payloads, distributed:
    // decode via the sniffing codec, resize to a fixed raster, pool to the
    // embeddings-schema feature vector — no stub anywhere on this path
    import spark.implicits._
    val blobs = (1L to 6L).map(i => i -> encoded(8 + i.toInt * 3, 10 + i.toInt * 2, "png"))
      .toDF("doc_id", "blob").repartition(3)
    val decoded = Multimodal.decodeImages(blobs, codec = Multimodal.SniffCodec)
    val feats = Multimodal.extractFeatures(Multimodal.resize(decoded, 16, 16)).collect()
    assert(feats.length == 6)
    feats.foreach { r =>
      val f = r.getAs[scala.collection.Seq[Float]]("features")
      assert(f.length == 16 && f.forall(v => v >= 0f && v <= 255f))
      // the deterministic gradient fixture is non-constant, so pooled cells
      // must differ — a stubbed/flat decode would collapse them
      assert(f.distinct.length > 1, s"doc ${r.getLong(0)}: flat features $f")
    }
    // determinism across runs (the codec contract)
    val again = Multimodal.extractFeatures(Multimodal.resize(
      Multimodal.decodeImages(blobs, codec = Multimodal.SniffCodec), 16, 16)).collect()
    assert(feats.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("decompression bomb: huge declared dims are rejected from the header, pre-decode") {
    // A real 8×8 PNG whose IHDR is patched to declare 50000×50000 (~10 GB of
    // raster), with the chunk CRC recomputed so the reader trusts the header.
    // The budget check must fire from header metadata alone — a post-decode
    // check would have ImageIO allocate the full raster first and OOM this
    // very JVM, so the test completing at all proves the ordering.
    def putInt(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
      b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
    }
    val bomb = encoded(8, 8, "png").clone()
    putInt(bomb, 16, 50000) // IHDR width  (offset: 8 sig + 4 len + 4 type)
    putInt(bomb, 20, 50000) // IHDR height
    val crc = new java.util.zip.CRC32()
    crc.update(bomb, 12, 17) // chunk type + 13 IHDR data bytes
    putInt(bomb, 29, crc.getValue.toInt)
    val e = intercept[IllegalArgumentException] {
      Multimodal.ImageIoCodec.decodeImage(11L, bomb)
    }
    assert(e.getMessage.contains("decode budget"), e.getMessage)
    // and the sniffing router degrades the same blob to the stub instead of
    // failing the task — a 100 KB bomb in a dirty corpus is data, not a crash
    val got = Multimodal.SniffCodec.decodeImage(11L, bomb)
    val fake = Multimodal.FakeCodec.decodeImage(11L, bomb)
    assert(got.pixels.sameElements(fake.pixels), "bomb must degrade to the stub")
  }

  test("ImageIoCodec preserves alpha: RGBA PNG decodes to channels=4 in R,G,B,A order") {
    val w = 9; val h = 7
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    def px(x: Int, y: Int): (Int, Int, Int, Int) =
      ((x * 41 + y * 17) % 256, (x * 7 + 3) % 256, (y * 13 + 5) % 256, (x * 29 + y * 31 + 7) % 256)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b, a) = px(x, y)
      img.setRGB(x, y, (a << 24) | (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos), "no png writer")
    val im = Multimodal.ImageIoCodec.decodeImage(12L, bos.toByteArray)
    assert(im.width == w && im.height == h && im.channels == 4,
      s"expected ${w}x$h RGBA, got ${im.width}x${im.height} c=${im.channels}")
    assert(im.pixels.length == w * h * 4)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b, a) = px(x, y)
      val base = (y * w + x) * 4
      assert((im.pixels(base) & 0xff) == r, s"R($x,$y)")
      assert((im.pixels(base + 1) & 0xff) == g, s"G($x,$y)")
      assert((im.pixels(base + 2) & 0xff) == b, s"B($x,$y)")
      assert((im.pixels(base + 3) & 0xff) == a, s"A($x,$y)")
    }
  }

  test("real media batch (JPEG+PNG mix) through decode → resize → features → ANN top-1") {
    // the m3 composition over REAL encoded payloads: sniffed decode, fixed
    // raster, pooled features, exact-cosine top-1 — verified against a
    // driver-side brute force over the same collected feature vectors
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val blobs = (1L to 8L).map { i =>
      i -> encoded(10 + i.toInt * 2, 12 + i.toInt, if (i % 2 == 0) "jpg" else "png")
    }.toDF("doc_id", "blob").repartition(3)
    val feats = Multimodal.extractFeatures(Multimodal.resize(
        Multimodal.decodeImages(blobs, codec = Multimodal.SniffCodec), 16, 16))
      .withColumn("v", expr("transform(features, x -> cast(x as double))"))
      .withColumn("nrm", sqrt(call_function("graft_dot", col("v"), col("v"))))
      .localCheckpoint()
    val q = feats.filter(col("doc_id") <= 3)
      .select(col("doc_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val top = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    val ann = feats
      .select(col("doc_id").as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn"))
      .crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", call_function("graft_dot", col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rnk", row_number().over(top))
      .filter(col("rnk") === 1)
      .select("query_id", "neighbor_id", "cos")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // brute force on the driver over the identical vectors
    val vecs = feats.select("doc_id", "v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    assert(ann.keySet == Set(1L, 2L, 3L))
    for ((qid, (nid, c)) <- ann) {
      val best = vecs.keys.filter(_ != qid)
        .map(k => k -> cos(vecs(qid), vecs(k)))
        .maxBy { case (k, cc) => (cc, -k) }
      assert(nid == best._1, s"query $qid: ANN said $nid, brute force ${best._1}")
      assert(math.abs(c - best._2) < 1e-9, s"query $qid cosine drift")
    }
  }

  test("feature extraction yields 16-dim pooled vectors in [0,255]") {
    val feats = Multimodal.extractFeatures(Multimodal.decodeImages(blobs))
    assert(feats.columns.toSeq == Seq("doc_id", "features"))
    val rows = feats.collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val f = r.getAs[scala.collection.Seq[Float]]("features")
      assert(f.length == 16)
      assert(f.forall(v => v >= 0f && v <= 255f))
    }
  }

  // --- real (pure-JVM) container demux -----------------------------------

  /** A solid-color w×h frame (palette-friendly: GIF quantizes to ≤256
    * colors, so solid frames round-trip exactly).
    */
  private def solidFrame(w: Int, h: Int, rgb: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    img
  }

  /** Encode frames as a real animated GIF via ImageIO's sequence writer. */
  private def animatedGif(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(f =>
        writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Hand-assemble a minimal AVI/MJPEG: RIFF('AVI ' LIST('movi' 00dc…)).
    * Each 00dc chunk carries one complete JPEG — exactly what an MJPEG
    * encoder writes; the demuxer must not require the optional hdrl/idx1.
    */
  private def mjpegAvi(jpegs: Seq[Array[Byte]]): Array[Byte] = {
    def le32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val chunks = jpegs.flatMap { j =>
      "00dc".getBytes("US-ASCII") ++ le32(j.length) ++ j ++
        (if (j.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    }
    val movi = "LIST".getBytes("US-ASCII") ++ le32(4 + chunks.length) ++
      "movi".getBytes("US-ASCII") ++ chunks
    "RIFF".getBytes("US-ASCII") ++ le32(4 + movi.length) ++
      "AVI ".getBytes("US-ASCII") ++ movi
  }

  test("video dedup over REAL demuxed frames: trimmed GIF and AVI copies land exactly where the frame rule predicts") {
    import spark.implicits._
    // GIF pair: the trimmed copy re-encodes the SAME first 5 solid frames,
    // so its demuxed frame set is a strict subset → containment 100% of the
    // shorter side. AVI pair: MJPEG chunks pass through byte-identical, so
    // sharing is exact by construction.
    val colors = Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffff00, 0x00ffff, 0xff00ff)
    val gifFull = animatedGif(colors.map(solidFrame(9, 7, _)))
    val gifTrim = animatedGif(colors.dropRight(1).map(solidFrame(9, 7, _)))
    val jpegs = Seq(encoded(8, 6, "jpg"), encoded(10, 8, "jpg"),
      encoded(6, 6, "jpg"), encoded(12, 10, "jpg"))
    val aviFull = mjpegAvi(jpegs)
    val aviTrim = mjpegAvi(jpegs.dropRight(1))
    val gifOther = animatedGif(Seq(0x111111, 0x222222, 0x333333).map(solidFrame(9, 7, _)))
    val in = Seq((1L, gifFull), (2L, gifTrim), (3L, aviFull), (4L, aviTrim),
      (5L, gifOther)).toDF("doc_id", "blob")
    val out = graft.queries.PipelineQueries.videoDedupDemuxed(in).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.contains((1L, 2L, 5L, 1000000L)), s"GIF trim pair missing: ${out.toSeq}")
    assert(out.contains((3L, 4L, 3L, 1000000L)), s"AVI trim pair missing: ${out.toSeq}")
    assert(out.length == 2, s"unrelated videos paired: ${out.toSeq}")
    // and the demuxed frame sets really are the containers' frame counts
    val nf = graft.queries.PipelineQueries.videoFramesDemuxed(in)
      .groupBy("doc_id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nf == Map(1L -> 6L, 2L -> 5L, 3L -> 4L, 4L -> 3L, 5L -> 3L), nf.toString)
  }

  test("SniffCodec fuzz: mutated/truncated real media and hostile magics never throw; output stays bounded") {
    val rnd = new scala.util.Random(20260815L)
    val jpegs = Seq(encoded(8, 6, "jpg"), encoded(10, 8, "jpg"), encoded(6, 6, "jpg"))
    val seeds: Seq[Array[Byte]] = Seq(
      encoded(12, 9, "png"), encoded(12, 9, "jpg"), encoded(12, 9, "bmp"),
      animatedGif(Seq(solidFrame(5, 4, 0xff0000), solidFrame(5, 4, 0x00ff00))),
      mjpegAvi(jpegs), mjpegMp4(jpegs))
    def check(i: Int, blob: Array[Byte]): Unit = {
      // the whole point of the sniffing boundary: NO byte sequence may
      // throw — a hostile blob in a 100 TB corpus must degrade, not kill
      val im = Multimodal.SniffCodec.decodeImage(i.toLong, blob)
      assert(im.width > 0 && im.height > 0 && im.channels >= 1 && im.channels <= 4)
      assert(im.pixels.length == im.width * im.height * im.channels)
      val fr = Multimodal.SniffCodec.frames(blob, 64).toSeq
      assert(fr.length <= math.max(4096, blob.length / 64 + 1),
        s"case $i: demux expanded past every bound (${fr.length} frames)")
    }
    (0 until 360).foreach { i =>
      val b = seeds(i % seeds.length).clone()
      (0 until 1 + rnd.nextInt(6)).foreach { _ =>
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      }
      val blob =
        if (i % 3 == 0) java.util.Arrays.copyOfRange(b, 0, 1 + rnd.nextInt(b.length))
        else b
      check(i, blob)
    }
    // hostile bodies behind every recognized magic number
    def rndBytes(n: Int): Array[Byte] = {
      val a = new Array[Byte](n); rnd.nextBytes(a); a
    }
    val magics: Seq[Array[Byte]] = Seq(
      "GIF8".getBytes("US-ASCII"),
      "RIFF".getBytes("US-ASCII") ++ rndBytes(4) ++ "AVI ".getBytes("US-ASCII"),
      rndBytes(4) ++ "ftyp".getBytes("US-ASCII"),
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte),
      Array[Byte](0x89.toByte, 'P', 'N', 'G'),
      "BM".getBytes("US-ASCII"))
    magics.zipWithIndex.foreach { case (m, i) =>
      check(1000 + i, m ++ rndBytes(64 + rnd.nextInt(256)))
    }
  }

  test("animated GIF demuxes to its real frames, each a decodable image") {
    val colors = Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff, 0x000000)
    val gif = animatedGif(colors.map(solidFrame(9, 7, _)))
    val frames = Multimodal.ImageIoCodec.frames(gif, frameBytes = 64).toSeq
    assert(frames.length == colors.length, s"expected ${colors.length} frames")
    frames.zip(colors).zipWithIndex.foreach { case ((f, rgb), i) =>
      val im = Multimodal.ImageIoCodec.decodeImage(100L + i, f)
      assert(im.width == 9 && im.height == 7, s"frame $i dims")
      val ch = im.channels
      (0 until im.width * im.height).foreach { p =>
        assert((im.pixels(p * ch) & 0xff) == ((rgb >> 16) & 0xff) &&
          (im.pixels(p * ch + 1) & 0xff) == ((rgb >> 8) & 0xff) &&
          (im.pixels(p * ch + 2) & 0xff) == (rgb & 0xff),
          s"frame $i pixel $p is not the solid source color")
      }
    }
  }

  test("AVI/MJPEG demuxes the 00dc chunks verbatim; frames survive odd-length padding") {
    // odd-length JPEGs force the RIFF word-alignment path
    val jpegs = Seq(encoded(10, 8, "jpg"), encoded(11, 9, "jpg"), encoded(12, 10, "jpg"))
    val avi = mjpegAvi(jpegs)
    val frames = Multimodal.ImageIoCodec.frames(avi, frameBytes = 64).toSeq
    assert(frames.length == 3)
    frames.zip(jpegs).foreach { case (got, want) =>
      assert(got.sameElements(want), "MJPEG chunk not emitted verbatim")
    }
    // and each demuxed frame decodes like the standalone JPEG it is
    val dims = frames.map(f => Multimodal.ImageIoCodec.decodeImage(0L, f))
      .map(im => (im.width, im.height))
    assert(dims == Seq((10, 8), (11, 9), (12, 10)))
  }

  /** Hand-assemble a minimal ISO-BMFF MP4 carrying an MJPEG track:
    * ftyp + mdat (sample bytes back-to-back) + moov/trak/mdia/minf/stbl
    * with the four sample tables. The chunk layout splits three samples
    * 2+1 across two chunks to exercise the stsc run-length mapping, and
    * offsets are ABSOLUTE file offsets as the spec demands. `codec` is
    * the stsd sample-entry fourcc ('jpeg' for MJPEG; 'avc1' models an
    * H.264 track the demuxer must refuse).
    */
  private def mjpegMp4(jpegs: Seq[Array[Byte]], codec: String = "jpeg"): Array[Byte] = {
    require(jpegs.length == 3, "builder assumes the 2+1 chunk split")
    def be32(v: Int) = Array[Byte](((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(tpe: String, body: Array[Byte]): Array[Byte] =
      be32(8 + body.length) ++ tpe.getBytes("US-ASCII") ++ body
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0) ++ "isom".getBytes("US-ASCII"))
    val mdat = box("mdat", jpegs.flatten.toArray)
    val off1 = ftyp.length + 8 // chunk 1: samples 0,1 contiguous
    val off2 = off1 + jpegs(0).length + jpegs(1).length // chunk 2: sample 2
    // VisualSampleEntry is 78 body bytes of fields the demuxer never reads
    val stsd = box("stsd", be32(0) ++ be32(1) ++ box(codec, new Array[Byte](78)))
    val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(3) ++
      jpegs.flatMap(j => be32(j.length)))
    val stsc = box("stsc", be32(0) ++ be32(2) ++
      (be32(1) ++ be32(2) ++ be32(1)) ++ (be32(2) ++ be32(1) ++ be32(1)))
    val stco = box("stco", be32(0) ++ be32(2) ++ be32(off1) ++ be32(off2))
    val moov = box("moov", box("trak", box("mdia", box("minf",
      box("stbl", stsd ++ stsz ++ stsc ++ stco)))))
    ftyp ++ mdat ++ moov
  }

  test("MP4/MJPEG demuxes samples verbatim across stsc chunk runs") {
    val jpegs = Seq(encoded(10, 8, "jpg"), encoded(11, 9, "jpg"), encoded(12, 10, "jpg"))
    val mp4 = mjpegMp4(jpegs)
    val frames = Multimodal.ImageIoCodec.frames(mp4, frameBytes = 64).toSeq
    assert(frames.length == 3)
    frames.zip(jpegs).foreach { case (got, want) =>
      assert(got.sameElements(want), "MP4 sample not emitted verbatim")
    }
    val dims = frames.map(f => Multimodal.ImageIoCodec.decodeImage(0L, f))
      .map(im => (im.width, im.height))
    assert(dims == Seq((10, 8), (11, 9), (12, 10)))
  }

  test("MP4 with a compressed-codec track (avc1) throws; SniffCodec degrades to the stub") {
    val mp4 = mjpegMp4(Seq(encoded(6, 6, "jpg"), encoded(6, 6, "jpg"),
      encoded(6, 6, "jpg")), codec = "avc1")
    val e = intercept[IllegalArgumentException] {
      Multimodal.ImageIoCodec.frames(mp4, 64).toSeq
    }
    assert(e.getMessage.contains("native"), e.getMessage)
    assert(Multimodal.SniffCodec.frames(mp4, 64).nonEmpty, "SniffCodec must stub, not die")
  }

  test("hostile MP4: out-of-range stco offsets stop cleanly; SniffCodec degrades") {
    val jpegs = Seq(encoded(6, 6, "jpg"), encoded(7, 7, "jpg"), encoded(8, 8, "jpg"))
    val mp4 = mjpegMp4(jpegs)
    // patch the first chunk offset in the stco table to point past the blob:
    // the walk must bail without an OOB read, keeping zero frames from the
    // poisoned chunk run (sample sizes no longer line up afterwards either)
    val needle = Array[Byte]('s', 't', 'c', 'o')
    val at = mp4.indices.find(i => i + 4 <= mp4.length &&
      mp4.slice(i, i + 4).sameElements(needle)).get
    val bad = mp4.clone()
    val off1Pos = at + 4 + 4 + 4 // after fourcc: version/flags, entry_count
    val big = mp4.length + 1000
    bad(off1Pos) = ((big >> 24) & 0xff).toByte; bad(off1Pos + 1) = ((big >> 16) & 0xff).toByte
    bad(off1Pos + 2) = ((big >> 8) & 0xff).toByte; bad(off1Pos + 3) = (big & 0xff).toByte
    val got = try Multimodal.ImageIoCodec.frames(bad, 64).toSeq
      catch { case _: IllegalArgumentException => Seq.empty }
    assert(got.isEmpty, "poisoned index must not yield frames")
    assert(Multimodal.SniffCodec.frames(bad, 64).nonEmpty, "SniffCodec must stub, not die")
  }

  test("sampleFrames with SniffCodec: real containers demux, junk chunks via the stub") {
    import spark.implicits._
    val gif = animatedGif((0 until 6).map(i => solidFrame(5, 5, i * 40)))
    val avi = mjpegAvi(Seq(encoded(6, 6, "jpg"), encoded(7, 7, "jpg")))
    val junk = Array.tabulate[Byte](130)(i => (i * 31).toByte)
    val df = Seq((1L, gif), (2L, avi), (3L, junk)).toDF("doc_id", "blob").repartition(2)
    val got = Multimodal.sampleFrames(df, everyN = 2, frameBytes = 64,
      codec = Multimodal.SniffCodec).collect().groupBy(_.doc_id)
    assert(got(1L).map(_.frame_idx).sorted.toSeq == Seq(0, 2, 4)) // 6 frames, every 2nd
    assert(got(2L).map(_.frame_idx).sorted.toSeq == Seq(0))       // 2 frames, every 2nd
    assert(got(3L).map(_.frame_idx).sorted.toSeq == Seq(0, 2))    // 130B/64 = 3 chunks
    // demuxed GIF frames feed straight back through image decode
    val im = Multimodal.ImageIoCodec.decodeImage(1L, got(1L).minBy(_.frame_idx).frame)
    assert(im.width == 5 && im.height == 5)
  }

  test("hostile containers: truncated AVI stops cleanly, over-budget GIF frame is rejected") {
    // a 00dc chunk whose declared size runs past the blob must not OOB-read
    val truncated = mjpegAvi(Seq(encoded(6, 6, "jpg"))).dropRight(40)
    val got = Multimodal.ImageIoCodec.frames(truncated, 64).toSeq
    assert(got.isEmpty, "truncated chunk should be dropped, not partially read")
    // SniffCodec degrades the same blob to stub chunking instead of failing
    val viaSniff = Multimodal.SniffCodec.frames(truncated, 64).toSeq
    assert(viaSniff.nonEmpty)
    // GIF frame bomb: walk header + extensions to the first image
    // descriptor (0x2C) and patch ITS width/height to 50000×50000 — that is
    // the field reader.getWidth(i) reports, so the per-frame budget check
    // must fire before any pixel decode
    val bomb = animatedGif(Seq(solidFrame(8, 8, 0xabcdef))).clone()
    var p = 13 + (if ((bomb(10) & 0x80) != 0) 3 << ((bomb(10) & 7) + 1) else 0)
    while ((bomb(p) & 0xff) == 0x21) { // extension: introducer+label+subblocks
      p += 2
      while (bomb(p) != 0) p += (bomb(p) & 0xff) + 1
      p += 1
    }
    assert((bomb(p) & 0xff) == 0x2c, "no GIF image descriptor found")
    bomb(p + 5) = 0x50.toByte; bomb(p + 6) = 0xc3.toByte // width 50000 LE
    bomb(p + 7) = 0x50.toByte; bomb(p + 8) = 0xc3.toByte // height 50000 LE
    val e = intercept[IllegalArgumentException] {
      Multimodal.ImageIoCodec.frames(bomb, 64).toSeq
    }
    assert(e.getMessage.contains("budget"))
  }
}

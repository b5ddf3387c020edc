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
}

package graft.multimodal

import org.scalacheck.{Gen, Prop, Properties}

/** Property-based laws for the codec boundary — the invariants every
  * downstream operator (m1–m8) silently relies on, checked over arbitrary
  * blobs rather than fixtures. Pure JVM, no Spark session.
  */
object CodecProperties extends Properties("Multimodal codecs") {

  private val blob: Gen[Array[Byte]] =
    Gen.chooseNum(0, 600).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))

  private def dimsOk(im: DecodedImage): Boolean =
    im.width >= 16 && im.width <= 32 && im.height >= 16 && im.height <= 32 &&
      im.channels >= 1 && im.channels <= 3 &&
      im.pixels.length == im.width * im.height * im.channels

  property("SqlCodec: bounded dims, pixel count exact, same blob → same pixels") =
    Prop.forAll(blob) { b =>
      val d1 = Multimodal.SqlCodec.decodeImage(1L, b)
      val d2 = Multimodal.SqlCodec.decodeImage(2L, b)
      dimsOk(d1) && java.util.Arrays.equals(d1.pixels, d2.pixels) &&
        d1.width == d2.width && d1.height == d2.height && d1.channels == d2.channels
    }

  property("FakeCodec: bounded dims and deterministic") = Prop.forAll(blob) { b =>
    val d1 = Multimodal.FakeCodec.decodeImage(1L, b)
    val d2 = Multimodal.FakeCodec.decodeImage(9L, b)
    dimsOk(d1) && java.util.Arrays.equals(d1.pixels, d2.pixels)
  }

  property("SniffCodec decode is total with a well-formed image for ANY bytes") =
    Prop.forAll(blob) { b =>
      val im = Multimodal.SniffCodec.decodeImage(0L, b)
      im.width > 0 && im.height > 0 && im.channels >= 1 && im.channels <= 4 &&
        im.pixels.length == im.width * im.height * im.channels
    }

  property("SniffCodec demux is total and bounded for ANY bytes") =
    Prop.forAll(blob, Gen.chooseNum(1, 64)) { (b, fb) =>
      val fr = Multimodal.SniffCodec.frames(b, fb).toSeq
      fr.length <= math.max(4096, b.length / fb + 1) && fr.forall(_ != null)
    }

  property("stub demux partitions the blob exactly") =
    Prop.forAll(blob, Gen.chooseNum(1, 64)) { (b, fb) =>
      // junk magic → FakeCodec chunking: frames concatenate back to the blob
      val junk = if (b.length >= 4 && b(0) == 'G') b.updated(0, 'X'.toByte) else b
      val fr = Multimodal.FakeCodec.frames(junk, fb).toArray
      java.util.Arrays.equals(fr.flatten, junk)
    }
}

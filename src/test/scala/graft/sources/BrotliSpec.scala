package graft.sources

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** Differential spec for the from-scratch RFC 7932 decoder: every fixture
  * under src/test/resources/brotli was compressed by the REFERENCE encoder
  * (brotlicffi, see tools/brotli_gen.py) across qualities 0/1/5/9/11 and
  * window sizes 10/16/22/24 over 11 content classes (empty, html, utf-8,
  * random, zeros, ...). The decoder must reproduce every raw byte exactly,
  * and must degrade to an error — never a hang, crash, or wrong bytes —
  * on truncation, bit corruption, garbage, and output-cap bombs.
  */
class BrotliSpec extends AnyFunSuite {

  private val dir = {
    val url = getClass.getResource("/brotli")
    assert(url != null, "brotli fixture directory missing")
    Paths.get(url.toURI)
  }

  private def read(name: String): Array[Byte] = Files.readAllBytes(dir.resolve(name))

  private val brFiles: Seq[String] = {
    val s = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString).filter(_.endsWith(".br")).toList.sorted
    } finally s.close()
  }

  test("differential: every reference-encoded fixture decodes byte-identically") {
    assert(brFiles.size >= 80, s"expected the full fixture matrix, found ${brFiles.size}")
    var checked = 0
    brFiles.foreach { f =>
      val raw = read(f.replaceAll("_q\\d+_w\\d+\\.br$", ".raw"))
      val got = Brotli.decompress(read(f), maxOut = raw.length.max(1024))
      assert(got.isRight, s"$f failed: ${got.left.getOrElse("")}")
      assert(java.util.Arrays.equals(got.toOption.get, raw), s"$f decoded wrong bytes")
      checked += 1
    }
    info(s"$checked fixtures byte-identical")
  }

  test("tree fuzz corpus: 300 random Kraft-complete prefix codes with RLE runs decode to their canonical symbol order") {
    // crafted by tools/brotli_fuzz_trees.py and validated against the
    // reference decoder — pins canonical code assignment and the 16/17
    // repeat accumulation rule across random tree shapes
    val tdir = Paths.get(getClass.getResource("/brotli_trees").toURI)
    var n = 0
    val s = Files.list(tdir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString).filter(_.endsWith(".br")).toList.sorted.foreach { f =>
        val raw = Files.readAllBytes(tdir.resolve(f.stripSuffix(".br") + ".raw"))
        val got = Brotli.decompress(Files.readAllBytes(tdir.resolve(f)), 4096)
        assert(got.toOption.exists(java.util.Arrays.equals(_, raw)), s"$f: $got")
        n += 1
      }
    } finally s.close()
    assert(n >= 300)
  }

  test("truncation at every prefix length errors (never hangs, never succeeds wrong)") {
    val f = "short_q9_w22.br"
    val comp = read(f)
    val raw = read("short.raw")
    (0 until comp.length).foreach { n =>
      val cut = java.util.Arrays.copyOf(comp, n)
      Brotli.decompress(cut, maxOut = 1 << 20) match {
        case Left(_) => // expected: truncation detected
        case Right(out) =>
          // a prefix that happens to decode must be a PREFIX of the truth
          // (e.g. the stream is over before the cut) — never wrong bytes
          assert(java.util.Arrays.equals(out, raw),
            s"truncation at $n produced ${out.length} wrong bytes")
      }
    }
  }

  test("single-bit corruption never yields silent wrong output length beyond the cap, never crashes") {
    val comp = read("words_q9_w22.br")
    val raw = read("words.raw")
    val rnd = new scala.util.Random(7932)
    (1 to 200).foreach { _ =>
      val flipAt = rnd.nextInt(comp.length * 8)
      val mutated = comp.clone()
      mutated(flipAt / 8) = (mutated(flipAt / 8) ^ (1 << (flipAt % 8))).toByte
      // must terminate with either an error or SOME output bounded by the
      // cap — corruption detection is best-effort (a flipped literal still
      // decodes), but resource safety is unconditional
      Brotli.decompress(mutated, maxOut = raw.length * 4 + 1024) match {
        case Left(_) => ()
        case Right(out) => assert(out.length <= raw.length * 4 + 1024)
      }
    }
  }

  test("garbage and wrong-magic inputs error cleanly") {
    val rnd = new scala.util.Random(41)
    (1 to 100).foreach { _ =>
      val junk = new Array[Byte](rnd.nextInt(2000) + 1)
      rnd.nextBytes(junk)
      Brotli.decompress(junk, maxOut = 1 << 20) match {
        case Left(_) => ()
        case Right(out) => assert(out.length <= (1 << 20)) // lucky parse is fine, bounded
      }
    }
    // gzip bytes labeled br — the WarcDocs mislabel case
    val gz = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write("not brotli at all".getBytes); g.close()
      bos.toByteArray
    }
    // must terminate quickly, error or not; decoding gzip as brotli is
    // overwhelmingly an error
    Brotli.decompress(gz, maxOut = 1 << 20)
  }

  test("decompression bomb refuses at the output cap instead of materializing") {
    val comp = read("zeros_q9_w22.br") // 1 MiB of zeros, ~few hundred bytes compressed
    Brotli.decompress(comp, maxOut = 1 << 16) match {
      case Left(msg) => assert(msg.contains("cap"), s"unexpected error: $msg")
      case Right(_) => fail("bomb was materialized past the cap")
    }
    // and with a generous cap it round-trips
    val ok = Brotli.decompress(comp, maxOut = 1 << 21)
    assert(ok.toOption.exists(o => o.length == (1 << 20) && o.forall(_ == 0)))
  }

  test("empty-input and trailing-garbage streams error") {
    assert(Brotli.decompress(Array.emptyByteArray, 1024).isLeft)
    val comp = read("short_q9_w22.br")
    val trailing = comp ++ Array[Byte](1, 2, 3)
    assert(Brotli.decompress(trailing, 1 << 20).isLeft, "trailing bytes must be rejected")
  }

  test("word transforms: ferment handles multi-byte UTF-8 boundaries") {
    // ferment-all over a word ending in a truncated multi-byte lead must
    // not run off the array (the i+1/i+2 guards)
    val w = Array[Byte]('a', 'b', 0xC3.toByte)
    val tidFermentAll = BrotliTables.transformOp.indexOf(2)
    val out = Brotli.transformWord(w, tidFermentAll)
    assert(out.length >= 3)
  }
}

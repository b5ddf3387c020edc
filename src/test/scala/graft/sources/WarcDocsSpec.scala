package graft.sources

import java.nio.file.{Files, Paths}
import graft.SparkSpec

class WarcDocsSpec extends SparkSpec {

  private def record(tpe: String, uri: String, date: String, body: Array[Byte]): Array[Byte] = {
    val hdr = (s"WARC/1.0\r\n" +
      s"WARC-Type: $tpe\r\n" +
      (if (uri.nonEmpty) s"WARC-Target-URI: $uri\r\n" else "") +
      s"WARC-Date: $date\r\n" +
      s"Content-Length: ${body.length}\r\n" +
      "\r\n").getBytes("ISO-8859-1")
    hdr ++ body ++ "\r\n\r\n".getBytes("ISO-8859-1")
  }

  test("WARC parse: length-delimited records, embedded fake headers, UTF-8 byte lengths, skips bookkeeping") {
    // body 2 QUOTES a WARC record — Content-Length discipline must carry the
    // parser straight over it instead of re-synchronizing mid-payload. It is
    // an HTTP message, so the strip removes the HTTP headers and nothing
    // else: the quoted fake record (with its own CRLFCRLF) stays intact.
    val quoting = "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n" +
      "see the spec:\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\nnot a record"
    // body 3 is multi-byte UTF-8: Content-Length counts BYTES, not chars
    val utf8 = "café über tokens"
    val bytes =
      record("warcinfo", "", "2026-01-01T00:00:00Z", "software: test".getBytes("UTF-8")) ++
        record("response", "http://a.example/1", "2026-01-01T00:00:01Z", quoting.getBytes("UTF-8")) ++
        record("request", "http://a.example/1", "2026-01-01T00:00:01Z", "GET /1".getBytes("UTF-8")) ++
        record("conversion", "http://a.example/2", "2026-01-01T00:00:02Z", utf8.getBytes("UTF-8"))
    val got = WarcDocs.parseWarc(bytes)
    // HTTP-framed response payloads lose exactly their HTTP header block
    // (the strip stops at the FIRST CRLFCRLF — the quoted fake record's own
    // blank line survives); conversion/WET payloads pass through whole.
    assert(got == Seq(
      ("http://a.example/1", "2026-01-01T00:00:01Z",
        "see the spec:\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\nnot a record"),
      ("http://a.example/2", "2026-01-01T00:00:02Z", utf8)))
  }

  test("WARC parse: HTTP header block stripped only when the payload IS HTTP") {
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>real body</html>"
    val bare = "no http framing here"
    // the advised regression case: a NON-HTTP response payload whose body
    // contains a blank CRLF line — the interior CRLFCRLF must NOT be taken
    // as header framing, so the first paragraph survives
    val nonHttpBlank = "first paragraph\r\n\r\nsecond paragraph"
    val bytes =
      record("response", "http://h.example/1", "2026-01-01T00:00:00Z", http.getBytes("UTF-8")) ++
        record("response", "http://h.example/2", "2026-01-01T00:00:01Z", bare.getBytes("UTF-8")) ++
        record("response", "http://h.example/4", "2026-01-01T00:00:03Z", nonHttpBlank.getBytes("UTF-8")) ++
        record("conversion", "http://h.example/3", "2026-01-01T00:00:02Z",
          "keep\r\n\r\nboth halves".getBytes("UTF-8"))
    assert(WarcDocs.parseWarc(bytes) == Seq(
      ("http://h.example/1", "2026-01-01T00:00:00Z", "<html>real body</html>"),
      ("http://h.example/2", "2026-01-01T00:00:01Z", bare),
      ("http://h.example/4", "2026-01-01T00:00:03Z", nonHttpBlank),
      ("http://h.example/3", "2026-01-01T00:00:02Z", "keep\r\n\r\nboth halves")))
  }

  test("WARC parse: truncated and hostile lengths stop at the last good boundary") {
    val good = record("response", "http://b.example/1", "2026-01-01T00:00:00Z", "ok body".getBytes("UTF-8"))
    // declared length runs past EOF
    val truncated = good ++ ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://b.example/2\r\nWARC-Date: 2026-01-01T00:00:01Z\r\n" +
      "Content-Length: 999999\r\n\r\nshort").getBytes("ISO-8859-1")
    assert(WarcDocs.parseWarc(truncated).map(_._1) == Seq("http://b.example/1"))
    // declared length past the payload cap is hostile, not buffered
    val hostile = good ++ ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://b.example/3\r\nWARC-Date: 2026-01-01T00:00:02Z\r\n" +
      s"Content-Length: ${WarcDocs.MaxPayload + 1L}\r\n\r\n").getBytes("ISO-8859-1")
    assert(WarcDocs.parseWarc(hostile).map(_._1) == Seq("http://b.example/1"))
    // garbage instead of a version line: stop, keep prior records
    val garbage = good ++ "not a warc header at all".getBytes("ISO-8859-1")
    assert(WarcDocs.parseWarc(garbage).map(_._1) == Seq("http://b.example/1"))
  }

  test("WARC fuzz: every truncation parses a clean record prefix; byte mutations never throw or mint records") {
    // base has NO embedded fake version lines, so the boundary invariants
    // below are exact
    val base = record("response", "http://f.example/1", "2026-05-01T00:00:00Z",
      "HTTP/1.1 200 OK\r\n\r\nbody one".getBytes("UTF-8")) ++
      record("warcinfo", "", "2026-05-01T00:00:00Z", "software: fuzz".getBytes("UTF-8")) ++
      record("conversion", "http://f.example/2", "2026-05-01T00:00:01Z",
        "zwei körper".getBytes("UTF-8")) ++
      record("response", "http://f.example/3", "2026-05-01T00:00:02Z",
        "bare capture\r\n\r\nwith blank".getBytes("UTF-8"))
    val full = WarcDocs.parseWarc(base)
    assert(full.size == 3)
    // EVERY truncation point: no throw, and the output is a clean prefix of
    // the full parse — a record is either wholly present or wholly absent
    (0 to base.length).foreach { k =>
      val out = WarcDocs.parseWarc(java.util.Arrays.copyOfRange(base, 0, k))
      assert(full.startsWith(out), s"truncation at $k emitted a non-prefix: $out")
    }
    // random byte mutations: never throw, never mint MORE records than the
    // stream held, and untouched leading records still parse
    val rnd = new scala.util.Random(20260815L)
    (1 to 500).foreach { i =>
      val mutated = base.clone()
      (0 until 1 + rnd.nextInt(4)).foreach { _ =>
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      }
      val out = WarcDocs.parseWarc(mutated) // must not throw
      assert(out.size <= 4, s"fuzz case $i minted records: $out")
    }
  }

  test("WARC gz robustness: truncated and corrupt segments degrade to the sound prefix, never a thrown task") {
    def gzMember(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(b); g.close()
      bo.toByteArray
    }
    val r1 = record("conversion", "http://g.example/1", "2026-06-01T00:00:00Z",
      "erstes dokument".getBytes("UTF-8"))
    val r2 = record("conversion", "http://g.example/2", "2026-06-01T00:00:01Z",
      "zweites dokument".getBytes("UTF-8"))
    // cut mid-second-member's DEFLATE data (header is 10 bytes; 5 more is
    // far short of the record): the first member inflated soundly and must
    // survive; the torn tail drops at a record boundary
    val torn = gzMember(r1) ++ java.util.Arrays.copyOfRange(gzMember(r2), 0, 15)
    val dir = Files.createTempDirectory("warcgz-torn")
    Files.write(Paths.get(dir.toString, "torn.warc.gz"), torn)
    // outright garbage behind the .gz suffix: zero rows, not a dead job
    Files.write(Paths.get(dir.toString, "junk.warc.gz"),
      "not gzip at all".getBytes("UTF-8"))
    val rows = WarcDocs.read(spark, dir.toString).collect().map(_.getString(3))
    assert(rows.toSeq == Seq("http://g.example/1"),
      s"torn gz did not degrade to the sound prefix: ${rows.mkString(",")}")
  }

  test("HTTP body decoding: chunked de-framing and gzip/deflate inflation, gated on the parsed headers") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo); g.write(b); g.close()
      bo.toByteArray
    }
    def zlib(b: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater(); d.setInput(b); d.finish()
      val out = new Array[Byte](b.length * 2 + 64)
      val n = d.deflate(out); d.end()
      java.util.Arrays.copyOfRange(out, 0, n)
    }
    def chunked(b: Array[Byte], sizes: Seq[Int]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      var p = 0
      for (s <- sizes; if p < b.length) {
        val take = math.min(s, b.length - p)
        bo.write(s"${take.toHexString}\r\n".getBytes("ISO-8859-1"))
        bo.write(b, p, take); bo.write("\r\n".getBytes("ISO-8859-1")); p += take
      }
      bo.write("0\r\nX-Trailer: ignored\r\n\r\n".getBytes("ISO-8859-1"))
      bo.toByteArray
    }
    val doc = "real page text, chunked AND gzipped on the wire — the CommonCrawl case"
    def http(headers: String, body: Array[Byte]): Array[Byte] =
      (s"HTTP/1.1 200 OK\r\n$headers\r\n\r\n").getBytes("ISO-8859-1") ++ body
    val bytes =
      // the real-crawl composition: Content-Encoding INSIDE Transfer-Encoding
      record("response", "http://d.example/1", "2026-03-01T00:00:00Z",
        http("Content-Type: text/html\r\nContent-Encoding: gzip\r\nTransfer-Encoding: chunked",
          chunked(gz(doc.getBytes("UTF-8")), Seq(7, 13, 1000)))) ++
      record("response", "http://d.example/2", "2026-03-01T00:00:01Z",
        http("Transfer-Encoding: chunked", chunked("plain but chunked".getBytes("UTF-8"), Seq(4, 1000)))) ++
      record("response", "http://d.example/3", "2026-03-01T00:00:02Z",
        http("Content-Encoding: gzip", gz("gzip only".getBytes("UTF-8")))) ++
      record("response", "http://d.example/4", "2026-03-01T00:00:03Z",
        http("Content-Encoding: deflate", zlib("zlib deflate".getBytes("UTF-8")))) ++
      // raw deflate (no zlib wrapper): historic-server reality
      record("response", "http://d.example/5", "2026-03-01T00:00:04Z",
        http("Content-Encoding: deflate", {
          val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
          val b = "raw deflate".getBytes("UTF-8"); d.setInput(b); d.finish()
          val out = new Array[Byte](256); val n = d.deflate(out); d.end()
          java.util.Arrays.copyOfRange(out, 0, n)
        })) ++
      // headers absent → body untouched even if it LOOKS like framing
      record("response", "http://d.example/6", "2026-03-01T00:00:05Z",
        http("Content-Type: text/plain", "5\r\nhello\r\n0\r\n\r\n".getBytes("UTF-8")))
    val got = WarcDocs.parseWarc(bytes).map(t => t._1 -> t._3).toMap
    assert(got("http://d.example/1") == doc)
    assert(got("http://d.example/2") == "plain but chunked")
    assert(got("http://d.example/3") == "gzip only")
    assert(got("http://d.example/4") == "zlib deflate")
    assert(got("http://d.example/5") == "raw deflate")
    assert(got("http://d.example/6") == "5\r\nhello\r\n0\r\n\r\n")
  }

  test("HTTP body decoding: empty inflates stay empty, brotli decodes (malformed br degrades to empty), codings match token-exact") {
    def http(headers: String, body: Array[Byte]): Array[Byte] =
      (s"HTTP/1.1 200 OK\r\n$headers\r\n\r\n").getBytes("ISO-8859-1") ++ body
    def gz(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo); g.write(b); g.close()
      bo.toByteArray
    }
    def zlib(b: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater(); d.setInput(b); d.finish()
      val out = new Array[Byte](b.length * 2 + 64)
      val n = d.deflate(out); d.end()
      java.util.Arrays.copyOfRange(out, 0, n)
    }
    // an RFC 7932 brotli stream of "hello brotli" (one uncompressed
    // meta-block; byte-identical to the reference encoder's output)
    val brBytes = Array[Int](0x8b, 0x05, 0x80, 0x68, 0x65, 0x6c, 0x6c, 0x6f,
      0x20, 0x62, 0x72, 0x6f, 0x74, 0x6c, 0x69, 0x03).map(_.toByte)
    val bytes =
      // a legitimately EMPTY gzip body (204-style capture): must land as
      // "" — the old behavior returned the raw compressed bytes, putting
      // gzip magic (\x1f\x8b) in the text column
      record("response", "http://e.example/empty-gz", "2026-03-01T00:00:00Z",
        http("Content-Encoding: gzip", gz(Array.emptyByteArray))) ++
      record("response", "http://e.example/empty-zlib", "2026-03-01T00:00:01Z",
        http("Content-Encoding: deflate", zlib(Array.emptyByteArray))) ++
      // brotli: the in-repo RFC 7932 decoder handles the real stream
      record("response", "http://e.example/br", "2026-03-01T00:00:02Z",
        http("Content-Type: text/html\r\nContent-Encoding: br", brBytes)) ++
      // a server LYING br over plain text degrades to empty (undecodable)
      // — NEVER raw mislabeled bytes passed through as prose
      record("response", "http://e.example/br-lie", "2026-03-01T00:00:03Z",
        http("Content-Encoding: br", "actually plain".getBytes("UTF-8"))) ++
      // token-exact coding match: "brotli-experimental" must NOT trigger
      // the br branch via substring, x-gzip MUST trigger gzip
      record("response", "http://e.example/not-br", "2026-03-01T00:00:04Z",
        http("Content-Encoding: brotli-experimental", "kept as-is".getBytes("UTF-8"))) ++
      record("response", "http://e.example/x-gzip", "2026-03-01T00:00:05Z",
        http("Content-Encoding: x-gzip", gz("x-gzip body".getBytes("UTF-8")))) ++
      // truncated br stream: degrade to empty, never a throw
      record("response", "http://e.example/br-trunc", "2026-03-01T00:00:06Z",
        http("Content-Encoding: br", brBytes.take(5))) ++
      // LAYERED codings with br decode the full stack, last-applied first
      record("response", "http://e.example/br-gzip", "2026-03-01T00:00:07Z",
        http("Content-Encoding: br, gzip", gz(brBytes))) ++
      // layered codings WITHOUT br decode fully, last-applied first:
      // double-gzip (real misconfigured servers) and deflate-then-gzip
      record("response", "http://e.example/gzip-gzip", "2026-03-01T00:00:08Z",
        http("Content-Encoding: gzip, gzip", gz(gz("twice wrapped".getBytes("UTF-8"))))) ++
      record("response", "http://e.example/deflate-gzip", "2026-03-01T00:00:09Z",
        http("Content-Encoding: deflate, gzip",
          gz(zlib("layered body".getBytes("UTF-8"))))) ++
      record("response", "http://e.example/identity-gzip", "2026-03-01T00:00:10Z",
        http("Content-Encoding: identity, gzip", gz("plain under identity".getBytes("UTF-8"))))
    val got = WarcDocs.parseWarc(bytes).map(t => t._1 -> t._3).toMap
    assert(got.size == 11, "every record must survive, empty-bodied or not")
    assert(got("http://e.example/br-trunc") == "")
    assert(got("http://e.example/br-gzip") == "hello brotli")
    assert(got("http://e.example/gzip-gzip") == "twice wrapped")
    assert(got("http://e.example/deflate-gzip") == "layered body")
    assert(got("http://e.example/identity-gzip") == "plain under identity")
    assert(got("http://e.example/empty-gz") == "")
    assert(got("http://e.example/empty-zlib") == "")
    assert(got("http://e.example/br") == "hello brotli")
    assert(got("http://e.example/br-lie") == "")
    assert(got("http://e.example/not-br") == "kept as-is")
    assert(got("http://e.example/x-gzip") == "x-gzip body")
    // the degrade must be visible, not a crash — and hostile magic under a
    // gzip label still keeps the raw bytes (inflate opened nothing sound)
    val hostile = WarcDocs.parseWarc(
      record("response", "http://e.example/hostile", "2026-03-01T00:00:06Z",
        http("Content-Encoding: gzip", "not gzip at all".getBytes("UTF-8"))))
    assert(hostile.head._3 == "not gzip at all")
  }

  test("HTTP body decoding honors the declared charset; unknown or illegal charsets fall back to UTF-8") {
    def http(headers: String, body: Array[Byte]): Array[Byte] =
      (s"HTTP/1.1 200 OK\r\n$headers\r\n\r\n").getBytes("ISO-8859-1") ++ body
    def gz(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo); g.write(b); g.close()
      bo.toByteArray
    }
    val latin = "café résumé"          // é = 0xE9 in latin-1, invalid alone in UTF-8
    val sjis = "日本語"                    // CP932 text
    val bytes =
      record("response", "http://c.example/1", "2026-03-01T00:00:00Z",
        http("Content-Type: text/html; charset=ISO-8859-1", latin.getBytes("ISO-8859-1"))) ++
      // quoted value + trailing parameter
      record("response", "http://c.example/2", "2026-03-01T00:00:01Z",
        http("Content-Type: text/html; charset=\"windows-1252\"; format=flowed",
          latin.getBytes("windows-1252"))) ++
      record("response", "http://c.example/3", "2026-03-01T00:00:02Z",
        http("Content-Type: text/html; charset=shift_jis", sjis.getBytes("Shift_JIS"))) ++
      // charset INSIDE a gzipped body: inflate first, then decode
      record("response", "http://c.example/4", "2026-03-01T00:00:03Z",
        http("Content-Type: text/html; charset=iso-8859-1\r\nContent-Encoding: gzip",
          gz(latin.getBytes("ISO-8859-1")))) ++
      // unknown and syntactically ILLEGAL charsets: UTF-8 fallback, no throw
      record("response", "http://c.example/5", "2026-03-01T00:00:04Z",
        http("Content-Type: text/html; charset=not-a-real-charset", "ascii body".getBytes("UTF-8"))) ++
      record("response", "http://c.example/6", "2026-03-01T00:00:05Z",
        http("Content-Type: text/html; charset=_%$!", "still fine".getBytes("UTF-8"))) ++
      // no charset: UTF-8 default unchanged
      record("response", "http://c.example/7", "2026-03-01T00:00:06Z",
        http("Content-Type: text/html", latin.getBytes("UTF-8")))
    val got = WarcDocs.parseWarc(bytes).map(t => t._1 -> t._3).toMap
    assert(got("http://c.example/1") == latin)
    assert(got("http://c.example/2") == latin)
    assert(got("http://c.example/3") == sjis)
    assert(got("http://c.example/4") == latin)
    assert(got("http://c.example/5") == "ascii body")
    assert(got("http://c.example/6") == "still fine")
    assert(got("http://c.example/7") == latin)
    // the latin-1 page read as UTF-8 WOULD have lost the accents — pin the
    // counterfactual so the test fails if the charset path is ever removed
    assert(new String(latin.getBytes("ISO-8859-1"), "UTF-8") != latin)
  }

  test("stripHtml: tags, script/style elements, comments, entities, whitespace — and what it must NOT touch") {
    import WarcDocs.stripHtml
    assert(stripHtml("<html><body><h1>Title</h1><p>one <b>two</b> three</p></body></html>")
      == "Title one two three")
    // script/style contents are code, not prose — gone entirely
    assert(stripHtml("<p>keep</p><script type=\"x\">var a = '<p>fake</p>';</script><p>more</p>")
      == "keep more")
    assert(stripHtml("<style>.c { color: red }</style>text") == "text")
    // but <scripty> is just an unknown tag: its CONTENTS are prose
    assert(stripHtml("<scripty>words</scripty>") == "words")
    // comments vanish, even wrapping markup
    assert(stripHtml("a<!-- <p>hidden</p> -->b") == "a b")
    // entities: named, decimal, hex; unknown stays literal
    assert(stripHtml("T&amp;C &lt;ok&gt; &#65;&#x42; &bogus; R&amp;D")
      == "T&C <ok> AB &bogus; R&D")
    assert(stripHtml("one&nbsp;&nbsp;two") == "one two")
    // HTML5 rule: < not followed by letter//!? is literal text
    assert(stripHtml("if a < b then c > d") == "if a < b then c > d")
    // unclosed script swallows the tail (it IS code); unclosed tag at EOF drops
    assert(stripHtml("before<script>var x = 1") == "before")
    assert(stripHtml("text<div cla") == "text")
    // whitespace collapses across newlines/tabs and trims
    assert(stripHtml("  <p>\n\ta\n\nb\t</p>  ") == "a b")
    assert(stripHtml("") == "")
  }

  test("extractText strips only DECLARED html; text/plain and WET conversion records stay raw") {
    def http(headers: String, body: Array[Byte]): Array[Byte] =
      (s"HTTP/1.1 200 OK\r\n$headers\r\n\r\n").getBytes("ISO-8859-1") ++ body
    val html = "<html><body><p>r&eacute;al&nbsp;<b>page</b></p></body></html>"
    val bytes =
      record("response", "http://h.example/1", "2026-03-01T00:00:00Z",
        http("Content-Type: text/html; charset=utf-8", html.getBytes("UTF-8"))) ++
      // plain text WITH angle brackets: math, not markup
      record("response", "http://h.example/2", "2026-03-01T00:00:01Z",
        http("Content-Type: text/plain", "for x < 10 emit <result>".getBytes("UTF-8"))) ++
      // no content-type at all, body self-evidently html
      record("response", "http://h.example/3", "2026-03-01T00:00:02Z",
        http("Server: x", "<!DOCTYPE html><html><p>bare</p></html>".getBytes("UTF-8"))) ++
      // WET-style conversion record: never touched
      record("conversion", "http://h.example/4", "2026-03-01T00:00:03Z",
        "already <extracted> text".getBytes("UTF-8"))
    val on = WarcDocs.parseWarc(bytes, extractText = true).map(t => t._1 -> t._3).toMap
    assert(on("http://h.example/1") == "r&eacute;al page") // entity decode: &nbsp; yes, unknown stays
    assert(on("http://h.example/2") == "for x < 10 emit <result>")
    assert(on("http://h.example/3") == "bare")
    assert(on("http://h.example/4") == "already <extracted> text")
    // default OFF: byte-identical to the archival contract
    val off = WarcDocs.parseWarc(bytes).map(t => t._1 -> t._3).toMap
    assert(off("http://h.example/1") == html)
  }

  test("wire-realistic crawl e2e: chunked+gzipped latin-1 HTML → read(extractText) → canonical-URL dedup") {
    // The whole round-8 ingest story in one pass: a CommonCrawl-shaped
    // response (Transfer-Encoding: chunked wrapping Content-Encoding: gzip,
    // charset=ISO-8859-1, HTML body, tracking-parameter URL) must land in
    // the documents contract as clean prose, and the same page crawled
    // under two URL spellings must collapse under graft_canonical_url.
    import org.apache.spark.sql.functions._
    def gz(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo); g.write(b); g.close()
      bo.toByteArray
    }
    def chunked(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      var p = 0
      while (p < b.length) {
        val take = math.min(11, b.length - p)
        bo.write(s"${take.toHexString}\r\n".getBytes("ISO-8859-1"))
        bo.write(b, p, take); bo.write("\r\n".getBytes("ISO-8859-1")); p += take
      }
      bo.write("0\r\n\r\n".getBytes("ISO-8859-1"))
      bo.toByteArray
    }
    def http(headers: String, body: Array[Byte]): Array[Byte] =
      (s"HTTP/1.1 200 OK\r\n$headers\r\n\r\n").getBytes("ISO-8859-1") ++ body
    val page = "<html><head><script>track();</script></head>" +
      "<body><h1>Café menu</h1><p>cr&egrave;me&nbsp;brûlée</p></body></html>"
    val wire = http(
      "Content-Type: text/html; charset=ISO-8859-1\r\n" +
        "Content-Encoding: gzip\r\nTransfer-Encoding: chunked",
      chunked(gz(page.getBytes("ISO-8859-1"))))
    // the same page served Content-Encoding: br — the fastest-growing
    // CommonCrawl coding; bytes are the REFERENCE encoder's quality-11
    // output over the identical ISO-8859-1 body, decoded in-repo
    val brPage = Array(
      0x1b, 0x70, 0x00, 0x20, 0xc4, 0xf2, 0xd6, 0x9a, 0xfa, 0x93, 0xdd, 0xae,
      0x48, 0xe9, 0xd9, 0x23, 0xb0, 0xfd, 0x3e, 0x08, 0xb1, 0x0b, 0x99, 0x53,
      0x0e, 0x1c, 0x5a, 0x12, 0xb4, 0x65, 0x9a, 0xdd, 0xee, 0x70, 0xa5, 0x7b,
      0xca, 0x42, 0x54, 0x19, 0xa6, 0x3d, 0x9c, 0x9f, 0x68, 0x04, 0x82, 0x59,
      0x3f, 0x9c, 0x8f, 0x69, 0x6d, 0x88, 0x36, 0xb1, 0x32, 0xab, 0x8e, 0x77,
      0x93, 0x08, 0x04, 0x17, 0x9c, 0x3d, 0x92, 0xcd, 0xd0, 0x6b, 0xe5, 0x58,
      0xe7, 0x0f, 0x2d, 0xfe, 0x7e, 0x06, 0x71, 0x06, 0x07).map(_.toByte)
    val brWire = http(
      "Content-Type: text/html; charset=ISO-8859-1\r\n" +
        "Content-Encoding: br\r\nTransfer-Encoding: chunked",
      chunked(brPage))
    val bytes =
      record("response", "HTTP://Cafe.example:80/menu?utm_source=feed", "2026-03-01T00:00:00Z", wire) ++
      record("response", "http://cafe.example/menu#today", "2026-03-01T00:00:01Z", wire) ++
      record("response", "http://cafe.example:80/menu?", "2026-03-01T00:00:02Z", brWire)
    val dir = Files.createTempDirectory("warc-e2e")
    Files.write(dir.resolve("seg.warc"), bytes)
    try {
      val docs = WarcDocs.read(spark, dir.toString, extractText = true)
      val texts = docs.select("text").collect().map(_.getString(0)).toSeq
      assert(texts == Seq.fill(3)("Café menu cr&egrave;me brûlée"))
      val canon = docs.groupBy(expr("graft_canonical_url(source)").as("u")).count().collect()
      assert(canon.map(r => r.getString(0) -> r.getLong(1)).toSeq ==
        Seq("http://cafe.example/menu" -> 3L))
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); Files.delete(dir)
    }
  }

  test("HTTP body decoding degrades, never throws: malformed chunk framing, lying sizes, hostile magic") {
    // mislabeled chunked: first size line is not hex → raw body kept
    assert(WarcDocs.dechunk("not chunked at all".getBytes("UTF-8")).isEmpty)
    // truncated chunk: sound prefix
    val torn = "a\r\n0123456789\r\n14\r\nonly five".getBytes("ISO-8859-1")
    assert(new String(WarcDocs.dechunk(torn).get, "UTF-8") == "0123456789only five")
    // hostile size: bounded, prior chunks kept
    val hostile = s"3\r\nabc\r\n${java.lang.Long.toHexString(Long.MaxValue / 2)}\r\nx".getBytes("ISO-8859-1")
    assert(new String(WarcDocs.dechunk(hostile).get, "UTF-8") == "abc")
    // declared gzip but garbage bytes → body kept raw
    val junk = "definitely not gzip".getBytes("UTF-8")
    assert(WarcDocs.inflateBody(junk, gzipWrapped = true).toSeq == junk.toSeq)
    assert(WarcDocs.inflateBody(junk, gzipWrapped = false).toSeq == junk.toSeq)
    // fuzz: random mutations of a well-formed chunked+gzip record never throw
    def gz(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo); g.write(b); g.close()
      bo.toByteArray
    }
    val payload = gz("fuzz seed body".getBytes("UTF-8"))
    val base = record("response", "http://f.example/1", "2026-03-02T00:00:00Z",
      ("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\nTransfer-Encoding: chunked\r\n\r\n" +
        s"${payload.length.toHexString}\r\n").getBytes("ISO-8859-1") ++ payload ++
        "\r\n0\r\n\r\n".getBytes("ISO-8859-1"))
    val rnd = new scala.util.Random(20260815L)
    (1 to 300).foreach { i =>
      val m = base.clone()
      (0 until 1 + rnd.nextInt(4)).foreach(_ => m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte)
      WarcDocs.parseWarc(m) // must not throw
    }
    (1 to base.length).foreach { k =>
      WarcDocs.parseWarc(java.util.Arrays.copyOfRange(base, 0, base.length - k)) // must not throw
    }
  }

  test("gunzip degrades ONLY on deflate damage; transport IOExceptions propagate for task retry") {
    def gzMember(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(b); g.close()
      bo.toByteArray
    }
    val payload = "sound member".getBytes("UTF-8")
    val whole = gzMember(payload)
    // deflate damage (truncation → EOFException inside the inflater):
    // degrade to the sound prefix — deterministic data, a retry re-reads
    // the identical bytes, so failing the task would loop forever
    val torn = java.util.Arrays.copyOfRange(whole, 0, whole.length - 6)
    assert(new String(WarcDocs.gunzip(new java.io.ByteArrayInputStream(torn)), "UTF-8")
      .startsWith("sound") || WarcDocs.gunzip(new java.io.ByteArrayInputStream(torn)).isEmpty)
    // transport damage (socket reset mid-read): MUST propagate — swallowing
    // it would silently truncate the document set with no retry signal
    val flaky = new java.io.InputStream {
      private var i = 0
      override def read(): Int = {
        if (i >= 12) throw new java.io.IOException("Connection reset by peer")
        val b = whole(i) & 0xff; i += 1; b
      }
    }
    intercept[java.io.IOException] { WarcDocs.gunzip(flaky) }
  }

  test("WARC read lands on the documents contract with stable content-derived ids") {
    val dir = Files.createTempDirectory("warc")
    val f1 = record("response", "http://c.example/1", "2026-02-01T00:00:00Z",
      "alpha beta gamma".getBytes("UTF-8")) ++
      record("conversion", "http://c.example/2", "2026-02-01T00:00:01Z",
        "delta epsilon".getBytes("UTF-8"))
    val f2 = record("response", "http://c.example/3", "2026-02-01T00:00:02Z",
      "zeta".getBytes("UTF-8"))
    Files.write(Paths.get(dir.toString, "seg-00000.warc"), f1)
    Files.write(Paths.get(dir.toString, "seg-00001.warc"), f2)
    val df = WarcDocs.read(spark, dir.toString)
    assert(df.columns.toSeq == Seq("doc_id", "text", "lang", "source", "n_chars"))
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(3), r.getLong(4))).sortBy(_._3)
    assert(rows.map(_._3).toSeq ==
      Seq("http://c.example/1", "http://c.example/2", "http://c.example/3"))
    assert(rows.forall { case (_, text, _, nChars) => nChars == text.length })
    // ids derive from record identity: a second read (and a reordered
    // directory listing) yields the identical id set
    val again = WarcDocs.read(spark, dir.toString).collect().map(_.getLong(0)).toSet
    assert(again == rows.map(_._1).toSet)
    assert(rows.map(_._1).distinct.length == 3)
    // the contract composes: a registered operator runs on it unchanged
    val normed = graft.queries.PipelineQueries.chunkDocs(
      df.select("doc_id", "text"), 4, 4).collect()
    assert(normed.nonEmpty)
  }

  test("WARC streaming ingest: segments landing in the drop dir parse once, batch-identical, stateless") {
    val dir = Files.createTempDirectory("warcdrop")
    def gzMember(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(b); g.close()
      bo.toByteArray
    }
    val seg0 = record("response", "http://s.example/1", "2026-04-01T00:00:00Z",
      "HTTP/1.1 200 OK\r\n\r\nstreamed body one".getBytes("UTF-8")) ++
      record("conversion", "http://s.example/2", "2026-04-01T00:00:01Z",
        "streamed body two".getBytes("UTF-8"))
    val seg1 = gzMember(record("conversion", "http://s.example/3", "2026-04-01T00:00:02Z",
      "später gelandet".getBytes("UTF-8")))
    Files.write(Paths.get(dir.toString, "seg-00000.warc"), seg0)
    val q = WarcDocs.readStream(spark, dir.toString)
      .writeStream.format("memory").queryName("warcstream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("warcstream").count() == 2, "first segment did not parse")
      // a segment landing later is picked up incrementally — and only it
      Files.write(Paths.get(dir.toString, "seg-00001.warc.gz"), seg1)
      q.processAllAvailable()
      val got = spark.table("warcstream").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(3))).toSet
      assert(got.map(_._3) == Set("http://s.example/1", "http://s.example/2",
        "http://s.example/3"))
      // batch-identical: same contract, same content-derived doc_ids
      val batch = WarcDocs.read(spark, dir.toString).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(3))).toSet
      assert(got == batch, "streamed rows diverge from the batch read")
      // the only state is the source checkpoint — no state operators
      val prog = q.lastProgress
      assert(prog == null || prog.stateOperators.isEmpty,
        "WARC ingest must not carry streaming state")
    } finally q.stop()
  }

  test("WARC .gz read: per-record gzip members decompress as one stream, same contract") {
    def gzMember(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(b); g.close()
      bo.toByteArray
    }
    val dir = Files.createTempDirectory("warcgz")
    // CommonCrawl shape: EACH record its own gzip member, concatenated
    val gz =
      gzMember(record("response", "http://d.example/1", "2026-03-01T00:00:00Z",
        "one two three".getBytes("UTF-8"))) ++
        gzMember(record("request", "http://d.example/1", "2026-03-01T00:00:00Z",
          "GET /1".getBytes("UTF-8"))) ++
        gzMember(record("conversion", "http://d.example/2", "2026-03-01T00:00:01Z",
          "vier fünf".getBytes("UTF-8")))
    Files.write(Paths.get(dir.toString, "seg-00000.warc.gz"), gz)
    val rows = WarcDocs.read(spark, dir.toString).collect()
      .map(r => (r.getString(3), r.getString(1))).sortBy(_._1)
    assert(rows.toSeq == Seq(
      ("http://d.example/1", "one two three"),
      ("http://d.example/2", "vier fünf")))
  }
}

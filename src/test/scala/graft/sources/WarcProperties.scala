package graft.sources

import org.scalacheck.{Gen, Prop, Properties}

/** Property-based laws for the WARC parser — generator-driven versions of
  * the fixed-fixture specs: round-trip exactness over arbitrary record
  * mixes, the truncation prefix law at every cut point, and gunzip
  * totality. Pure JVM, no Spark session.
  */
object WarcProperties extends Properties("WarcDocs") {

  private def record(tpe: String, uri: String, date: String, body: Array[Byte]): Array[Byte] = {
    val hdr = (s"WARC/1.0\r\n" +
      s"WARC-Type: $tpe\r\n" +
      (if (uri.nonEmpty) s"WARC-Target-URI: $uri\r\n" else "") +
      s"WARC-Date: $date\r\n" +
      s"Content-Length: ${body.length}\r\n" +
      "\r\n").getBytes("ISO-8859-1")
    hdr ++ body ++ "\r\n\r\n".getBytes("ISO-8859-1")
  }

  // ASCII bodies: arbitrary bytes would round-trip lossily through the
  // parser's UTF-8 decode, which is the STRING contract, not a parser bug
  private val asciiBody: Gen[String] =
    Gen.chooseNum(0, 200).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(32, 126).map(_.toChar)).map(_.mkString))

  private val oneRecord: Gen[(String, String, String)] = for {
    tpe <- Gen.oneOf("conversion", "warcinfo", "request", "metadata", "response")
    id <- Gen.chooseNum(0, 999999)
    raw <- asciiBody
    // bias half the bodies into HTTP framing (some with an extra interior
    // blank line) so the response header-strip branch is generator-covered
    shape <- Gen.chooseNum(0, 3)
  } yield {
    val body = shape match {
      case 0 => raw
      case 1 => s"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n$raw"
      case 2 => s"HTTP/1.1 200 OK\r\n\r\n$raw\r\n\r\ntrailing half"
      case _ => s"$raw\r\n\r\nsecond paragraph" // non-HTTP with a blank line
    }
    (tpe, s"http://p.example/$id", body)
  }

  private val recordList: Gen[List[(String, String, String)]] =
    Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, oneRecord))

  private val Date = "2026-08-15T00:00:00Z"

  /** The parser's own rule, replayed: documents = response/conversion;
    * a response body is header-stripped only when it starts `HTTP/`.
    */
  private def expected(recs: List[(String, String, String)]): List[(String, String, String)] =
    recs.collect {
      case ("conversion", uri, body) => (uri, Date, body)
      case ("response", uri, body) =>
        val stripped =
          if (body.startsWith("HTTP/") && body.contains("\r\n\r\n"))
            body.substring(body.indexOf("\r\n\r\n") + 4)
          else body
        (uri, Date, stripped)
    }

  property("parse recovers exactly the document records, in order") =
    Prop.forAll(recordList) { recs =>
      val bytes = recs.flatMap { case (t, u, b) =>
        record(t, u, Date, b.getBytes("UTF-8")).toList
      }.toArray
      WarcDocs.parseWarc(bytes).toList == expected(recs)
    }

  property("every truncation point parses a clean prefix of the full parse") =
    Prop.forAll(recordList, Gen.chooseNum(0, 10000)) { (recs, cutSeed) =>
      val bytes = recs.flatMap { case (t, u, b) =>
        record(t, u, Date, b.getBytes("UTF-8")).toList
      }.toArray
      val full = WarcDocs.parseWarc(bytes)
      val cut = if (bytes.isEmpty) 0 else cutSeed % (bytes.length + 1)
      val out = WarcDocs.parseWarc(java.util.Arrays.copyOfRange(bytes, 0, cut))
      full.startsWith(out)
    }

  private val rawBytes: Gen[Array[Byte]] =
    Gen.chooseNum(0, 400).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))

  property("gunzip inverts gzip") = Prop.forAll(rawBytes) { b =>
    val bo = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bo)
    g.write(b); g.close()
    java.util.Arrays.equals(
      WarcDocs.gunzip(new java.io.ByteArrayInputStream(bo.toByteArray)), b)
  }

  property("gunzip is total: arbitrary bytes degrade to a (possibly empty) prefix, never a throw") =
    Prop.forAll(rawBytes) { b =>
      WarcDocs.gunzip(new java.io.ByteArrayInputStream(b)) != null
    }

  property("parse is total on arbitrary bytes and never mints documents from noise") =
    Prop.forAll(rawBytes) { b =>
      // noise lacks well-formed version+header+length framing, so at most
      // the (astronomically unlikely) accidental record comes back — the
      // load-bearing half of the law is "does not throw"
      WarcDocs.parseWarc(b).size <= b.length / 30 + 1
    }

  // markup-flavored noise: unbalanced tags, stray &/<, truncated comments
  private val htmlish: Gen[String] =
    Gen.chooseNum(0, 60).flatMap(n => Gen.listOfN(n, Gen.oneOf(
      Gen.oneOf("<", ">", "&", "&#", ";", "<!--", "-->", "</", "<script",
        "</script>", "<style>", "<p>", "<div class=\"x\">", "&amp;", "&#x41;",
        "&nbsp;", " ", "\n", "\t"),
      Gen.alphaNumStr.map(_.take(8))
    )).map(_.mkString))

  property("stripHtml is total on markup noise and never grows its input") =
    Prop.forAll(htmlish) { s =>
      val out = WarcDocs.stripHtml(s)
      out != null && out.length <= s.length
    }

  property("stripHtml is idempotent-safe on its own output: no residual tags or decodable entities appear") =
    Prop.forAll(htmlish) { s =>
      // not full idempotence (a '<' literal kept by the HTML5 rule stays a
      // literal) — the law is that a SECOND pass never shrinks further by
      // more than re-collapsed whitespace around kept literals can explain;
      // practically: no "<tag" survives pass one
      val once = WarcDocs.stripHtml(s)
      !once.toLowerCase.contains("<script") && !once.contains("<!--") &&
        !once.toLowerCase.contains("<div")
    }

  property("Brotli.decompress is total and bounded on arbitrary bytes") =
    Prop.forAll(Gen.chooseNum(0, 4096).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 255).map(_.toByte)).map(_.toArray))) { bs =>
      // hostile/garbage input: must terminate with an error or an output
      // within the cap — never a throw, hang, or unbounded allocation
      Brotli.decompress(bs, 1 << 16) match {
        case Left(msg) => msg.nonEmpty
        case Right(out) => out.length <= (1 << 16)
      }
    }
}

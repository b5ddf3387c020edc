package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC corpus source — the format web-crawl training data actually ships
  * in (CommonCrawl's WARC/1.0, ISO 28500): concatenated records, each a
  * header block (CRLF-terminated lines, blank-line terminated) followed by
  * exactly `Content-Length` payload bytes. The length field — not any
  * delimiter scan — bounds the payload, so a body that itself contains the
  * bytes `WARC/1.0` (a crawled page quoting a WARC, a mirror of this very
  * format's spec) can never split a record: the parser seeks past the
  * declared length and re-synchronizes on the next version line.
  *
  * Scale shape: WARC is NOT line-splittable (records are variable-length
  * and, in the wild, gzip-per-record), so the parallel unit is the FILE —
  * exactly how CommonCrawl is processed in practice (~1 GB segment files,
  * one task each; `binaryFiles` partitions by file). Parsing is a single
  * forward pass per file with no buffering beyond one record, and the
  * per-record caps below bound memory against truncated or hostile length
  * fields (the Multimodal demux discipline). Records that are not
  * `response`/`conversion` (warcinfo, request, metadata) are skipped —
  * they are crawl bookkeeping, not documents; a malformed record stops the
  * file's parse at the last good boundary rather than emitting garbage.
  *
  * Output lands on the `documents` contract (doc_id from the record's
  * target URI + date digest — stable across re-reads and file order,
  * unlike zipWithIndex), so every downstream operator runs unchanged.
  */
object WarcDocs {

  /** Per-record payload cap — a declared Content-Length past this is
    * treated as malformed (stops the file's parse) rather than buffered.
    */
  private[sources] val MaxPayload = 64 * 1024 * 1024

  private val Ascii = "ISO-8859-1"

  /** Parses one WARC file's bytes into (targetUri, warcDate, payload)
    * triples for response/conversion records. Exposed for the spec.
    */
  private[sources] def parseWarc(bytes: Array[Byte],
      extractText: Boolean = false): Seq[(String, String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    var p = 0
    val n = bytes.length
    def lineEnd(from: Int): Int = {
      var i = from
      while (i + 1 < n && !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 < n) i else -1
    }
    while (p < n) {
      // re-synchronize on the version line
      val ve = lineEnd(p)
      if (ve < 0) return out.toSeq
      val version = new String(bytes, p, ve - p, Ascii)
      if (!version.startsWith("WARC/")) return out.toSeq // malformed: stop at last good boundary
      var q = ve + 2
      var warcType, uri, date = ""
      var len = -1L
      var headerDone = false
      while (!headerDone) {
        val he = lineEnd(q)
        if (he < 0) return out.toSeq
        val line = new String(bytes, q, he - q, Ascii)
        q = he + 2
        if (line.isEmpty) headerDone = true
        else {
          val ci = line.indexOf(':')
          if (ci > 0) {
            val k = line.substring(0, ci).trim.toLowerCase
            val v = line.substring(ci + 1).trim
            k match {
              case "warc-type"       => warcType = v
              case "warc-target-uri" => uri = v
              case "warc-date"       => date = v
              case "content-length"  => len = try v.toLong catch { case _: NumberFormatException => -1L }
              case _                 =>
            }
          }
        }
      }
      if (len < 0 || len > MaxPayload || q + len > n) return out.toSeq // malformed/truncated/hostile
      if (warcType == "response" || warcType == "conversion") {
        // response payloads are full HTTP messages (status line + headers
        // + body); only the body is document text. conversion/WET records
        // are already plain text. The header block (up to the first
        // CRLFCRLF) is stripped ONLY when the payload actually starts with
        // an HTTP status line — a response record carrying a non-HTTP
        // capture must pass through whole, even if its body contains a
        // blank CRLF line (an interior CRLFCRLF is NOT header framing).
        var bodyStart = q
        val isHttp = warcType == "response" && len >= 5 &&
          bytes(q) == 'H' && bytes(q + 1) == 'T' && bytes(q + 2) == 'T' &&
          bytes(q + 3) == 'P' && bytes(q + 4) == '/'
        if (isHttp) {
          var i = q
          val end = q + len - 3
          var found = false
          while (!found && i < end) {
            if (bytes(i) == '\r' && bytes(i + 1) == '\n' &&
              bytes(i + 2) == '\r' && bytes(i + 3) == '\n') { bodyStart = i + 4; found = true }
            i += 1
          }
        }
        val text =
          if (isHttp && bodyStart > q) {
            // A real crawl's `response` records carry the wire encoding:
            // Transfer-Encoding: chunked framing (hex size lines interleaved
            // with the payload) and/or Content-Encoding: gzip/deflate bodies.
            // Decode both — gated on the PARSED HTTP headers, never sniffed —
            // or the "text" column holds hex framing noise / deflate bytes.
            // Transfer-Encoding is the outer (wire) layer, so de-frame first.
            val httpHeaders = new String(bytes, q, bodyStart - q, Ascii).toLowerCase
              .split("\r\n", -1)
            def headerValue(name: String): String =
              httpHeaders.collectFirst {
                case l if l.startsWith(name) && l.length > name.length &&
                  l.substring(name.length).dropWhile(_ == ' ').startsWith(":") =>
                  l.substring(l.indexOf(':') + 1).trim
              }.getOrElse("")
            var body = java.util.Arrays.copyOfRange(bytes, bodyStart, (q + len).toInt)
            if (headerValue("transfer-encoding").contains("chunked"))
              body = dechunk(body).getOrElse(body)
            // Token-exact match (the header is a comma-list of codings):
            // "gzip"/"x-gzip", "deflate", "br". Brotli (RFC 7932) decodes
            // through [[Brotli]], the in-repo from-scratch decoder (no
            // external dependency), differentially pinned against the
            // reference encoder's output in BrotliSpec. A MALFORMED br
            // stream degrades to EMPTY — never raw compressed bytes
            // posing as prose, which would poison every downstream text
            // operator (see SURVEY.md §8 ADR "brotli": the degrade path
            // survives; only the happy path changed in round 10).
            // Codings are a LAYERED LIST (RFC 9110 lists them in
            // application order), so decode last-applied first — one
            // branch per message would leave 'gzip, gzip' (real
            // misconfigured servers) or 'deflate, gzip' half-decoded,
            // landing compressed binary in the text column. An unknown
            // coding stops decoding and keeps the bytes as-is (the
            // pre-round-9 behavior for unrecognized values, spec-pinned).
            val codingList = headerValue("content-encoding")
              .split(',').map(_.trim.toLowerCase).filter(_.nonEmpty).toList
            var stop = false
            codingList.reverse.foreach { c =>
              if (!stop) c match {
                case "gzip" | "x-gzip" => body = inflateBody(body, gzipWrapped = true)
                case "deflate" => body = inflateBody(body, gzipWrapped = false)
                case "identity" => // explicit no-op coding
                case "br" =>
                  body = Brotli.decompress(body, MaxPayload).getOrElse(Array.emptyByteArray)
                case _ => stop = true // unknown: keep bytes as-is
              }
            }
            // Honor the DECLARED charset (Content-Type: ...; charset=x): a
            // latin-1 / windows-1252 / shift_jis page decoded as UTF-8
            // collapses every non-ASCII byte to U+FFFD — silent text loss
            // on a large slice of the real web. Declared-header charset
            // only (no meta-tag sniffing, no statistical guessing);
            // absent, unsupported, or syntactically illegal → UTF-8.
            // String decoding itself never throws (malformed input is
            // replaced), so this stays total like the rest of the parser.
            val ct = headerValue("content-type")
            val decoded = new String(body, declaredCharset(ct))
            // extractText strips HTML only where HTML is DECLARED (or,
            // with no content-type at all, self-evident from the leading
            // doctype/html tag) — a text/plain body with angle brackets
            // is prose and stays byte-identical.
            if (extractText && (ct.contains("html") || (ct.isEmpty && {
              val head = decoded.dropWhile(_.isWhitespace).take(15).toLowerCase(java.util.Locale.ROOT)
              head.startsWith("<!doctype") || head.startsWith("<html")
            }))) stripHtml(decoded)
            else decoded
          } else // conversion/WET and non-HTTP captures: no copy, no decode
            new String(bytes, bodyStart, (q + len - bodyStart).toInt, "UTF-8")
        out += ((uri, date, text))
      }
      p = (q + len).toInt
      // skip the record-terminating CRLFCRLF (tolerate a truncated tail)
      while (p + 1 < n && bytes(p) == '\r' && bytes(p + 1) == '\n') p += 2
    }
    out.toSeq
  }

  /** Extracts readable text from HTML in one pass — the step between a
    * decoded crawl body and every downstream text operator (raw markup in
    * the text column poisons langid n-grams, quality ratios, shingles, and
    * token counts alike). Deliberately a small, total state machine, not a
    * DOM parser:
    *  - `<!-- -->` comments and `<script>`/`<style>` ELEMENTS (tag AND
    *    contents) disappear; an unclosed one swallows the rest — that
    *    remainder IS script/comment bytes, not prose.
    *  - any other tag becomes one space; `<` NOT followed by a letter,
    *    `/`, `!` or `?` is literal text (the HTML5 tokenizer rule), so
    *    plain-text pages with math like `a < b` survive unharmed; a
    *    truncated trailing tag (no `>`) drops to end.
    *  - the core entities (`&amp; &lt; &gt; &quot; &apos; &nbsp;`) and
    *    numeric references (`&#65;` / `&#x41;`, code points validated)
    *    decode; anything unrecognized stays literal.
    *  - whitespace runs collapse to one space and the result is trimmed —
    *    markup position carries no meaning downstream.
    * Output length never exceeds input length (every rewrite shrinks its
    * span), a property the fuzz suite pins along with totality.
    */
  private[graft] def stripHtml(s: String): String = {
    val n = s.length
    val lower = s.toLowerCase(java.util.Locale.ROOT)
    val out = new java.lang.StringBuilder(n)
    var lastSpace = true // leading whitespace trims itself
    def space(): Unit = if (!lastSpace) { out.append(' '); lastSpace = true }
    // tag-name boundary: `<script>` `<script src=…>` `<script/>` but NOT
    // `<scripty>` (whose contents are prose, not code)
    def tagEnd(p: Int): Boolean = p >= n || " \t\n\r/>".indexOf(lower.charAt(p)) >= 0
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (lower.startsWith("<!--", i)) {
          val e = lower.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
          space()
        } else if ((lower.startsWith("<script", i) && tagEnd(i + 7)) ||
            (lower.startsWith("<style", i) && tagEnd(i + 6))) {
          val close = if (lower.charAt(i + 1) == 's' && lower.charAt(i + 2) == 'c') "</script" else "</style"
          val e = lower.indexOf(close, i + 1)
          val gt = if (e < 0) -1 else lower.indexOf('>', e)
          i = if (gt < 0) n else gt + 1
          space()
        } else if (i + 1 < n && (s.charAt(i + 1).isLetter ||
            s.charAt(i + 1) == '/' || s.charAt(i + 1) == '!' || s.charAt(i + 1) == '?')) {
          val e = lower.indexOf('>', i + 1)
          i = if (e < 0) n else e + 1
          space()
        } else { out.append(c); lastSpace = false; i += 1 }
      } else if (c == '&') {
        val semi = lower.indexOf(';', i + 1)
        val ent = if (semi > i && semi - i <= 10) lower.substring(i + 1, semi) else ""
        val decoded: String = ent match {
          case "amp" => "&"
          case "lt" => "<"
          case "gt" => ">"
          case "quot" => "\""
          case "apos" => "'"
          case "nbsp" => " "
          case e if e.startsWith("#") =>
            val cp = try {
              if (e.startsWith("#x")) Integer.parseInt(e.drop(2), 16)
              else Integer.parseInt(e.drop(1), 10)
            } catch { case _: NumberFormatException => -1 }
            if (cp >= 0x20 && cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF))
              new String(Character.toChars(cp))
            else if (cp >= 0 && cp < 0x20) " " // control refs act as whitespace
            else null
          case _ => null
        }
        if (decoded == null) { out.append('&'); lastSpace = false; i += 1 }
        else {
          if (decoded == " ") space()
          else { out.append(decoded); lastSpace = false }
          i = semi + 1
        }
      } else if (c.isWhitespace) { space(); i += 1 }
      else { out.append(c); lastSpace = false; i += 1 }
    }
    out.toString.trim
  }

  /** Resolves a lowercased Content-Type header's `charset=` token to a JVM
    * charset, UTF-8 when absent/unknown/illegal. Quoted values
    * (`charset="iso-8859-1"`) unwrap; the token ends at `;`, space, or `,`.
    */
  private[sources] def declaredCharset(contentType: String): java.nio.charset.Charset = {
    val i = contentType.indexOf("charset=")
    if (i < 0) java.nio.charset.StandardCharsets.UTF_8
    else {
      val tail = contentType.substring(i + 8)
      val raw0 = tail.takeWhile(c => c != ';' && c != ' ' && c != ',')
      val raw = if (raw0.startsWith("\"")) raw0.drop(1).takeWhile(_ != '"') else raw0
      try {
        if (raw.nonEmpty && java.nio.charset.Charset.isSupported(raw))
          java.nio.charset.Charset.forName(raw)
        else java.nio.charset.StandardCharsets.UTF_8
      } catch {
        // isSupported itself throws on ILLEGAL charset syntax (e.g. "_x")
        case _: Exception => java.nio.charset.StandardCharsets.UTF_8
      }
    }
  }

  /** De-frames a `Transfer-Encoding: chunked` HTTP body: hex chunk-size
    * lines (chunk extensions after `;` ignored) interleaved with payload,
    * terminated by a 0-size chunk (trailers dropped). DEGRADE-DON'T-DIE:
    * `None` when the FIRST size line isn't valid hex — the body was
    * mislabeled, keep it raw; a body that breaks mid-stream (truncated
    * chunk, later garbage framing) yields the chunks that framed soundly,
    * the same last-good-boundary rule the record parser uses.
    */
  private[sources] def dechunk(b: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream()
    val n = b.length
    var p = 0
    var first = true
    while (p < n) {
      // chunk-size line: hex digits, optional ;extension, CRLF
      var e = p
      while (e + 1 < n && !(b(e) == '\r' && b(e + 1) == '\n')) e += 1
      if (e + 1 >= n) return if (first) None else Some(out.toByteArray) // no CRLF: truncated
      val line = new String(b, p, e - p, Ascii)
      val sizeStr = line.indexOf(';') match {
        case -1 => line.trim
        case i  => line.substring(0, i).trim
      }
      val size = try java.lang.Long.parseLong(sizeStr, 16) catch { case _: NumberFormatException => -1L }
      if (size < 0 || size > MaxPayload)
        return if (first) None else Some(out.toByteArray) // bad/hostile framing
      if (size == 0) return Some(out.toByteArray) // last-chunk; trailers dropped
      first = false
      val dataStart = e + 2
      val avail = math.min(size, (n - dataStart).toLong).toInt
      if (avail > 0) out.write(b, dataStart, avail)
      if (avail < size) return Some(out.toByteArray) // truncated final chunk: sound prefix
      p = dataStart + avail + 2 // skip the chunk-terminating CRLF (tolerated if absent at end)
    }
    if (first) None else Some(out.toByteArray)
  }

  /** Inflates a `Content-Encoding: gzip|deflate` HTTP body, bounded by
    * [[MaxPayload]] (a hostile body cannot bomb past the same cap the
    * record parser enforces on declared lengths). `deflate` in the wild is
    * both zlib-wrapped (the spec) and raw deflate (historic servers) —
    * zlib is tried first, raw on failure. DEGRADE-DON'T-DIE: damage
    * mid-stream keeps the bytes that inflated soundly; a body that yields
    * no sound structure at all (hostile magic, total garbage) stays raw,
    * never throws. A body that inflates CLEANLY to zero bytes (an empty
    * page, a 204-style capture gzipped by the server) is a success and
    * returns the empty array — NOT the raw compressed bytes, which would
    * land gzip magic in the text column.
    * These are in-memory deterministic bytes, so unlike [[gunzip]] there
    * is no transport-exception class to let through.
    */
  private[sources] def inflateBody(b: Array[Byte], gzipWrapped: Boolean): Array[Byte] = {
    // None = the stream never opened / produced nothing before damage
    // (indistinguishable from garbage → caller keeps raw bytes);
    // Some(bytes) = the stream opened and either reached EOF/the bound
    // cleanly (possibly empty) or yielded a sound prefix before damage.
    def drain(mk: () => java.io.InputStream): Option[Array[Byte]] = {
      val out = new java.io.ByteArrayOutputStream()
      var clean = false
      try {
        val in = mk() // GZIPInputStream reads (and may reject) the header here
        val buf = new Array[Byte](1 << 16)
        var total = 0L
        var r = in.read(buf)
        while (r >= 0 && total < MaxPayload) {
          val keep = math.min(r.toLong, MaxPayload - total).toInt
          out.write(buf, 0, keep)
          total += keep
          r = if (total < MaxPayload) in.read(buf) else -1
        }
        clean = true
      } catch { case _: java.io.IOException => /* sound prefix, if any */ }
      if (clean || out.size > 0) Some(out.toByteArray) else None
    }
    val inflated: Option[Array[Byte]] =
      if (gzipWrapped)
        drain(() => new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(b), 1 << 16))
      else
        drain(() => new java.util.zip.InflaterInputStream(
          new java.io.ByteArrayInputStream(b), new java.util.zip.Inflater(false)))
          .filter(z => z.nonEmpty || isZlibHeader(b))
          .orElse(drain(() => new java.util.zip.InflaterInputStream(
            new java.io.ByteArrayInputStream(b), new java.util.zip.Inflater(true))))
    inflated.getOrElse(b)
  }

  /** RFC 1950 two-byte header check: CMF low nibble 8 (deflate), FCHECK
    * makes the 16-bit word a multiple of 31. Used only to accept a CLEAN
    * empty zlib inflate as authoritative (vs falling through to the raw-
    * deflate retry, which on arbitrary bytes can also "succeed" empty).
    */
  private def isZlibHeader(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0x0f) == 8 &&
      (((b(0) & 0xff) << 8) | (b(1) & 0xff)) % 31 == 0

  /** Total decompressed bytes allowed per .warc.gz file — the
    * decompression-bomb bound (the Multimodal budget discipline): a small
    * hostile file cannot expand past this inside one task. Must stay
    * below the JVM's ~2 GiB array cap, or the ByteArrayOutputStream /
    * Array[Byte] handed to parseWarc would OOM first.
    */
  private[sources] val MaxFileBytes = 1L * 1024 * 1024 * 1024

  /** Inflates a (possibly multi-member) gzip stream — CommonCrawl gzips
    * each record as its own member and concatenates; JDK GZIPInputStream
    * reads concatenated members natively. DEGRADE-DON'T-DIE (the SniffCodec
    * contract applied to segments): a truncated or corrupt stream yields
    * the bytes that inflated soundly — [[parseWarc]] then stops at the last
    * good record boundary, exactly as it does for a truncated plain file —
    * and a stream expanding past [[MaxFileBytes]] stops AT the bound. A
    * throw here would be worse than useless at crawl scale: Spark retries
    * the same deterministic file 4× and fails the whole 100k-segment job
    * over one bad segment.
    */
  private[sources] def gunzip(in: java.io.InputStream): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    try {
      val gz = new java.util.zip.GZIPInputStream(in, 1 << 16)
      val buf = new Array[Byte](1 << 16)
      var total = 0L
      var r = gz.read(buf)
      while (r >= 0 && total < MaxFileBytes) {
        val keep = math.min(r.toLong, MaxFileBytes - total).toInt
        out.write(buf, 0, keep)
        total += keep
        r = if (total < MaxFileBytes) gz.read(buf) else -1
      }
    } catch {
      // ONLY deflate-level damage degrades (corrupt member, truncated
      // stream): that is deterministic — a retry re-reads the same bytes.
      // Any other IOException is the transport (socket reset, throttling)
      // and MUST propagate so Spark retries the task; swallowing it would
      // silently truncate the document set with no signal.
      case _: java.util.zip.ZipException => // corrupt member: keep the sound prefix
      case _: java.io.EOFException => // truncated member: keep the sound prefix
    }
    out.toByteArray
  }

  /** Reads a directory (or glob) of WARC files — plain `.warc` or
    * CommonCrawl-style `.warc.gz` (per-record gzip members, handled as one
    * concatenated stream) — onto the `documents` contract. One task per
    * file — the CommonCrawl unit.
    */
  /** `extractText = true` additionally strips declared-HTML response
    * bodies to readable text ([[stripHtml]]) — what a training-data
    * pipeline wants in the `text` column; the default keeps raw bodies
    * (the archival contract, and what WET `conversion` records already
    * are).
    */
  def read(spark: SparkSession, path: String,
      extractText: Boolean = false): DataFrame = {
    import spark.implicits._
    docsContract(
      spark.sparkContext.binaryFiles(path)
        .flatMap { case (file, pds) =>
          val bytes =
            if (file.endsWith(".gz")) gunzip(pds.open()) else pds.toArray()
          parseWarc(bytes, extractText)
            .map { case (uri, date, text) => (uri, date, text, file) }
        }
        .toDF("uri", "warc_date", "text", "warc_file"))
  }

  /** The shared landing projection: stable id from record identity, not
    * read order (x6/J4's surrogate discipline — re-reads, file reorderings,
    * and batch-vs-stream must not renumber docs).
    */
  private def docsContract(parsed: DataFrame): DataFrame =
    parsed.select(
      expr("cast(conv(substring(md5(concat(uri, '|', warc_date)),1,15),16,10) as bigint)").as("doc_id"),
      col("text"),
      lit("und").as("lang"),
      col("uri").as("source"),
      length(col("text")).cast("long").as("n_chars"))

  /** STREAMING twin of [[read]] — the crawl drop directory: Structured
    * Streaming's `binaryFile` source watches `path`, each newly landed
    * `.warc`/`.warc.gz` segment becomes one task's whole-file parse (the
    * same file-granular unit as the batch path — WARC is not splittable),
    * and rows land on the identical `documents` contract, so every
    * downstream ingest twin (normalize → quality gate → dedup screen →
    * quota) composes directly. The SOURCE CHECKPOINT is the only state:
    * processed segments are remembered across restarts, a segment is
    * parsed exactly once, and doc_ids are content-derived, so a replayed
    * file re-emits identical rows — the idempotency the downstream
    * overwrite-by-batchId sinks key on. Throughput knobs are the source's
    * (`maxFilesPerTrigger` / `maxBytesPerTrigger`), not ours.
    */
  def readStream(spark: SparkSession, path: String,
      extractText: Boolean = false): DataFrame = {
    import spark.implicits._
    docsContract(
      spark.readStream.format("binaryFile")
        // the binaryFile source requires an explicit schema on the
        // streaming path; this is ITS fixed schema, not an inference
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "path string, modificationTime timestamp, length long, content binary"))
        .load(path)
        .select(col("path"), col("content")).as[(String, Array[Byte])]
        .flatMap { case (file, raw) =>
          val bytes =
            if (file.endsWith(".gz")) gunzip(new java.io.ByteArrayInputStream(raw))
            else raw
          parseWarc(bytes, extractText)
            .map { case (uri, date, text) => (uri, date, text, file) }
        }
        .toDF("uri", "warc_date", "text", "warc_file"))
  }
}

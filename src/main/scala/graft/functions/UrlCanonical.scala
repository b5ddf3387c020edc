package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization — the step before URL-level dedup in a crawl
  * pipeline. A crawl sees the same page under `HTTP://Example.COM:80/a/../b`
  * `http://example.com/b#frag` and `http://example.com/b?utm_source=x`;
  * canonicalizing BEFORE grouping collapses those families so URL-dedup
  * (the cheapest dedup tier — one hash groupBy, runs before any content
  * fetch or shingling) catches them. Rules, each applied only when the
  * input parses as a scheme://host URL (anything else returns UNCHANGED —
  * degrade-don't-die, same policy as the WARC parser):
  *
  *  - scheme and host lowercase (RFC 3986 §6.2.2.1);
  *  - fragment stripped (never sent to the server);
  *  - default port dropped (`:80` http, `:443` https);
  *  - path dot-segments resolved (`/a/./b/../c` → `/a/c`, RFC 3986 §5.2.4;
  *    `..` never climbs above root), empty path → `/`;
  *  - query: known tracking parameters dropped (`utm_*`, `fbclid`,
  *    `gclid`, `msclkid` — injected by ad/analytics redirects, never part
  *    of page identity), remaining parameters SORTED byte-wise (parameter
  *    order is almost never semantic; sorting makes `?a=1&b=2` ≡
  *    `?b=2&a=1`), empty query dropped.
  *
  * Percent-encoding is left untouched: decoding is only safe for
  * unreserved characters and the risk/benefit is poor — two encodings of
  * the same page are rarer than the families above, and a wrong decode
  * CHANGES the URL. The function is total and idempotent (a law the fuzz
  * suite pins): canonical output re-canonicalizes to itself.
  */
object UrlCanonical {
  private val TrackingExact = Set("fbclid", "gclid", "msclkid")

  def canonicalize(url: String): String = {
    try {
      val s = url.trim
      val schemeEnd = s.indexOf("://")
      if (schemeEnd <= 0) return url
      val scheme = s.substring(0, schemeEnd).toLowerCase(java.util.Locale.ROOT)
      if (!scheme.forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.'))
        return url
      val rest = s.substring(schemeEnd + 3)
      // authority ends at the first of / ? #
      var ae = rest.length
      var k = 0
      while (k < ae) {
        val c = rest.charAt(k)
        if (c == '/' || c == '?' || c == '#') { ae = k } else k += 1
      }
      var authority = rest.substring(0, ae)
      var tail = rest.substring(ae)
      // fragment: gone
      val hash = tail.indexOf('#')
      if (hash >= 0) tail = tail.substring(0, hash)
      // host lowercase (userinfo, if any, untouched); default port dropped
      val at = authority.lastIndexOf('@')
      val userinfo = if (at >= 0) authority.substring(0, at + 1) else ""
      var hostPort = authority.substring(at + 1).toLowerCase(java.util.Locale.ROOT)
      if ((scheme == "http" && hostPort.endsWith(":80")) ||
          (scheme == "https" && hostPort.endsWith(":443")))
        hostPort = hostPort.substring(0, hostPort.lastIndexOf(':'))
      authority = userinfo + hostPort
      // split path / query
      val qm = tail.indexOf('?')
      val rawPath = if (qm >= 0) tail.substring(0, qm) else tail
      val rawQuery = if (qm >= 0) tail.substring(qm + 1) else ""
      // resolve dot-segments; "" → "/"
      val segs = new scala.collection.mutable.ArrayBuffer[String]()
      rawPath.split("/", -1).foreach {
        case "" | "." => // "//" and "/./" carry no identity here
        case ".." => if (segs.nonEmpty) segs.remove(segs.length - 1)
        case seg => segs += seg
      }
      val dirTail = rawPath.endsWith("/") || rawPath.endsWith("/.") ||
        rawPath.endsWith("/..") || rawPath.isEmpty
      val path =
        if (segs.isEmpty) "/"
        else "/" + segs.mkString("/") + (if (dirTail) "/" else "")
      // query: drop tracking params, sort the rest
      val kept = rawQuery.split("&", -1).filter(_.nonEmpty).filterNot { p =>
        val name = p.takeWhile(_ != '=').toLowerCase(java.util.Locale.ROOT)
        name.startsWith("utm_") || TrackingExact.contains(name)
      }.sorted
      val query = if (kept.isEmpty) "" else "?" + kept.mkString("&")
      scheme + "://" + authority + path + query
    } catch {
      case _: Exception => url // total: a hostile string is returned as-is
    }
  }
}

/** `graft_strip_html(text)` — [[graft.sources.WarcDocs.stripHtml]] as a
  * native codegen'd expression, for corpora whose raw-HTML bodies are
  * ALREADY LANDED in a text column (the WARC reader's `extractText` only
  * helps at ingest time): one projection turns markup into the prose every
  * downstream text operator expects, inside whole-stage codegen. Same
  * total state machine, same fuzz-pinned laws.
  */
case class HtmlText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_strip_html expects a string argument, got ${child.dataType}")
  override def prettyName: String = "graft_strip_html"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      graft.sources.WarcDocs.stripHtml(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = graft.sources.WarcDocs.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString($helper.stripHtml($c.toString()))")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_canonical_url(url)` — [[UrlCanonical.canonicalize]] as a native
  * codegen'd expression, so the URL-dedup groupBy key stays inside
  * whole-stage codegen (no UDF serialization boundary on the 100k-segment
  * ingest path).
  */
case class CanonicalUrl(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_canonical_url expects a string argument, got ${child.dataType}")
  override def prettyName: String = "graft_canonical_url"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      UrlCanonical.canonicalize(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = UrlCanonical.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString($helper.canonicalize($c.toString()))")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

/** Generative laws for [[UrlCanonical]]: total on arbitrary URL-ish noise
  * and IDEMPOTENT — canonical output re-canonicalizes to itself, the
  * property that makes it safe as a dedup grouping key (a second pass in a
  * different pipeline stage can never split a group the first pass formed).
  */
object UrlCanonicalProperties extends Properties("UrlCanonical") {

  private val seg: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(6)),
    Gen.const("."), Gen.const(".."), Gen.const(""),
    Gen.const("a%2Fb"), Gen.const("über"))
  private val param: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(n => s"${n.take(5)}=1"),
    Gen.const("utm_source=x"), Gen.const("fbclid=abc"),
    Gen.const("flag"), Gen.const(""))
  private val urlish: Gen[String] = for {
    scheme <- Gen.oneOf("http", "HTTP", "https", "ftp", "x+y")
    host <- Gen.oneOf("Example.COM", "a.b", "[::1]", "u:p@Host.io")
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    segs <- Gen.listOf(seg).map(_.take(5))
    dirSlash <- Gen.oneOf("", "/")
    params <- Gen.listOf(param).map(_.take(4))
    frag <- Gen.oneOf("", "#f", "#a/b?c")
  } yield scheme + "://" + host + port +
    (if (segs.isEmpty) "" else segs.mkString("/", "/", "")) + dirSlash +
    (if (params.isEmpty) "" else params.mkString("?", "&", "")) + frag

  private val noise: Gen[String] = Gen.oneOf(
    urlish,
    Gen.asciiPrintableStr.map(_.take(40)),
    Gen.const(""), Gen.const("://"), Gen.const("a://"), Gen.const("http:/x"))

  property("total and idempotent on URL-ish input and noise") =
    Prop.forAll(noise) { u =>
      val once = UrlCanonical.canonicalize(u)
      once != null && UrlCanonical.canonicalize(once) == once
    }

  property("tracking params never survive; surviving params are sorted") =
    Prop.forAll(urlish) { u =>
      val c = UrlCanonical.canonicalize(u)
      val qm = c.indexOf('?')
      val params = if (qm < 0) Nil else c.substring(qm + 1).split("&").toList
      params.forall(p => !p.toLowerCase.startsWith("utm_") &&
        !p.toLowerCase.startsWith("fbclid")) &&
        params == params.sorted
    }
}

#!/usr/bin/env python3
"""Emit src/main/scala/graft/sources/BrotliTables.scala from the
behaviorally-derived tables (/tmp/brotli_transforms.json,
/tmp/brotli_context.json — produced by tools/brotli_gen.py, which recovers
the public RFC 7932 tables through the reference decoder so nothing is
copied from any implementation).

Dev tool only; run after brotli_gen.py, then commit the generated file.
"""
import json

tr = json.load(open("/tmp/brotli_transforms.json"))
ctx = json.load(open("/tmp/brotli_context.json"))

OP_IDS = {"Identity": 0, "FermentFirst": 1, "FermentAll": 2}
for k in range(1, 10):
    OP_IDS[f"OmitFirst{k}"] = 2 + k       # 3..11
    OP_IDS[f"OmitLast{k}"] = 11 + k       # 12..20


def slit(s):
    """Latin-1 string to a Scala string literal of \\uXXXX-safe chars."""
    out = []
    for ch in s:
        o = ord(ch)
        if ch == '"':
            out.append('\\"')
        elif ch == "\\":
            out.append("\\\\")
        elif 32 <= o < 127:
            out.append(ch)
        else:
            out.append(f"\\u{o:04x}")
    return '"' + "".join(out) + '"'


def int_rows(vals, per=16):
    lines = []
    for i in range(0, len(vals), per):
        lines.append("    " + ", ".join(str(v) for v in vals[i:i + per]) + ",")
    body = "\n".join(lines).rstrip(",")
    return body


prefixes, suffixes, ops = [], [], []
for tid, op, pre, suf in tr:
    assert tid == len(ops)
    ops.append(OP_IDS[op])
    prefixes.append(slit(pre))
    suffixes.append(slit(suf))

utf8_p1, utf8_p2 = ctx["2"]
sig_p1, sig_p2 = ctx["3"]

out = f"""package graft.sources

/** RFC 7932 (brotli) static tables, derived BEHAVIORALLY from the public
  * format via `tools/brotli_gen.py`: crafted minimal streams are decoded
  * through the reference decoder and the tables read off the output, so
  * every value here is a public-spec fact recovered without copying any
  * implementation. Regenerate with
  * `python3 tools/brotli_gen.py transforms context &&
  *  python3 tools/brotli_tables_to_scala.py`.
  *
  * GENERATED FILE — edit the generators, not this.
  */
private[sources] object BrotliTables {{
  /** Word-transform op ids: 0 identity, 1 ferment-first (uppercase the
    * first UTF-8 scalar), 2 ferment-all, 3..11 omit-first-1..9,
    * 12..20 omit-last-1..9.
    */
  val transformOp: Array[Int] = Array(
{int_rows(ops)}
  )

  val transformPrefix: Array[String] = Array(
    {", ".join(prefixes)}
  )

  val transformSuffix: Array[String] = Array(
    {", ".join(suffixes)}
  )

  /** UTF8 literal-context mode: ctx = utf8P1(p1) | utf8P2(p2). */
  val utf8P1: Array[Int] = Array(
{int_rows(utf8_p1)}
  )

  val utf8P2: Array[Int] = Array(
{int_rows(utf8_p2)}
  )

  /** Signed literal-context mode: ctx = (signedP1(p1) << 3) | signedP2(p2). */
  val signedP1: Array[Int] = Array(
{int_rows(sig_p1)}
  )

  val signedP2: Array[Int] = Array(
{int_rows(sig_p2)}
  )
}}
"""
path = "src/main/scala/graft/sources/BrotliTables.scala"
with open(path, "w") as f:
    f.write(out)
print("wrote", path, len(out), "bytes")

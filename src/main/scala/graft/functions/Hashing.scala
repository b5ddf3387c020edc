package graft.functions

import java.security.MessageDigest

/** JVM-side md5 helpers that mirror the SQL `md5()` used by the batch
  * queries — the streaming twins must hash exactly like the batch plans
  * (and the DuckDB oracles) or a gram screened clean in batch could flag
  * on the stream.
  */
object Hashing {
  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def md5Hex(s: String): String = {
    val d = digest.get()
    d.reset()
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** First 16 hex chars — the compact gram key d7/screenContamination join on. */
  def md5Hex16(s: String): String = md5Hex(s).substring(0, 16)

  /** The 60-bit md5 prefix as a number — exactly
    * `conv(substring(md5(s),1,15),16,10)` (the digest-key rule x12/x20/x27
    * share) without the hex-string detour: hex chars 1..15 are bytes 0..6
    * plus the high nibble of byte 7. Hot-path safe (no per-byte
    * formatting).
    */
  def md5Lane60(s: String): Long = {
    val d = digest.get()
    d.reset()
    val b = d.digest(s.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    (v << 4) | ((b(7) >> 4) & 0xfL)
  }
}

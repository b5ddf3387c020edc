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
}

package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k of (count, id) pairs, ordered by count desc then
  * id asc — the partial-aggregable replacement for the
  * `row_number().over(partitionBy(g).orderBy(...)) <= k` idiom.
  *
  * The window form cannot partially aggregate: every row of every group
  * crosses the shuffle and each partition is fully sorted just to discard
  * all but k rows. This Aggregator's buffer is a sorted array of at most k
  * pairs, so map-side combine reduces each task's contribution to ≤ k
  * entries per group BEFORE the exchange, and merging two buffers is a
  * bounded merge — O(k) state per group no matter how many rows feed it.
  * That asymmetry (k vs group size) is the entire difference between a
  * heavy-hitter query that scales and one that shuffles the world.
  *
  * Buffer layout: a flat Long array interleaving (count, id) pairs, kept
  * sorted best-first — primitive, allocation-light, and encoded natively
  * (no kryo round-trip).
  */
class TopKCountId(k: Int)
    extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
  require(k > 0)

  private def better(n1: Long, i1: Long, n2: Long, i2: Long): Boolean =
    n1 > n2 || (n1 == n2 && i1 < i2)

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], x: (Long, Long)): Array[Long] = {
    val m = b.length / 2
    // full buffer and the candidate does not beat the current worst: no-op
    if (m == k && !better(x._1, x._2, b(2 * (m - 1)), b(2 * (m - 1) + 1))) b
    else {
      val out = new Array[Long](math.min(m + 1, k) * 2)
      var i = 0 // source pair index
      var o = 0 // dest pair index
      var placed = false
      while (o < out.length / 2) {
        val takeNew = !placed &&
          (i >= m || better(x._1, x._2, b(2 * i), b(2 * i + 1)))
        if (takeNew) { out(2 * o) = x._1; out(2 * o + 1) = x._2; placed = true }
        else { out(2 * o) = b(2 * i); out(2 * o + 1) = b(2 * i + 1); i += 1 }
        o += 1
      }
      out
    }
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    if (b1.isEmpty) return b2
    if (b2.isEmpty) return b1
    val m1 = b1.length / 2; val m2 = b2.length / 2
    val out = new Array[Long](math.min(m1 + m2, k) * 2)
    var i = 0; var j = 0; var o = 0
    while (o < out.length / 2) {
      val takeLeft = j >= m2 ||
        (i < m1 && better(b1(2 * i), b1(2 * i + 1), b2(2 * j), b2(2 * j + 1)))
      if (takeLeft) { out(2 * o) = b1(2 * i); out(2 * o + 1) = b1(2 * i + 1); i += 1 }
      else { out(2 * o) = b2(2 * j); out(2 * o + 1) = b2(2 * j + 1); j += 1 }
      o += 1
    }
    out
  }

  override def finish(b: Array[Long]): Array[Long] = b
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

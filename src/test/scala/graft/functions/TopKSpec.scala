package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM properties of the bounded top-k buffer: any partitioning of the
  * input into reduce/merge trees must land on the same answer as a full
  * sort — that invariance is exactly what makes the aggregator safe under
  * Spark's arbitrary partial-aggregation order.
  */
class TopKSpec extends AnyFunSuite {

  private def reference(xs: Seq[(Long, Long)], k: Int): Seq[Long] =
    xs.sortBy { case (n, id) => (-n, id) }.take(k)
      .flatMap { case (n, id) => Seq(n, id) }

  test("random partitionings agree with the sort-based reference") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 200) {
      val k = 1 + rnd.nextInt(5)
      val agg = new TopKCountId(k)
      val n = rnd.nextInt(40)
      // duplicate counts on purpose: the id tie-break must decide
      val xs = Seq.fill(n)((rnd.nextInt(6).toLong, rnd.nextInt(1000).toLong))
      // split into random chunks, reduce each, merge in random tree order
      val chunks = xs.grouped(1 + rnd.nextInt(7)).toSeq
      val buffers = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = rnd.shuffle(buffers)
        .foldLeft(agg.zero)((a, b) => if (rnd.nextBoolean()) agg.merge(a, b) else agg.merge(b, a))
      assert(agg.finish(merged).toSeq == reference(xs, k), s"trial $trial k=$k xs=$xs")
    }
  }

  test("a full buffer ignores strictly-worse candidates without allocating") {
    val agg = new TopKCountId(2)
    val full = agg.reduce(agg.reduce(agg.zero, (10L, 1L)), (9L, 2L))
    assert(agg.reduce(full, (1L, 99L)) eq full)
    assert(agg.merge(full, agg.zero) eq full)
  }
}

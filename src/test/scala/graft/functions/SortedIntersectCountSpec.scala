package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins `graft_sorted_intersect_count` (the round-12 zero-allocation verify
  * kernel) against `size(array_intersect(...))` — the expression it replaced
  * in d4b/d4c's exact-verify stages — over its contract domain: sorted
  * ascending arrays of distinct longs, exactly what
  * `PipelineQueries.packedGrams` emits.
  */
class SortedIntersectCountSpec extends SparkSpec {

  test("matches size(array_intersect) on random sorted-distinct long arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (1 to 500).map { i =>
      def arr() = Array.fill(rnd.nextInt(60))(rnd.nextInt(40).toLong)
        .distinct.sorted.toSeq
      (i.toLong, arr(), arr())
    }
    val df = rows.toDF("id", "a", "b")
      .withColumn("fast", expr("graft_sorted_intersect_count(a, b)"))
      .withColumn("ref", size(array_intersect(col("a"), col("b"))).cast("long"))
    val bad = df.filter(col("fast") =!= col("ref")).count()
    assert(bad == 0, s"$bad rows disagree with array_intersect")
  }

  test("edge shapes: empty, disjoint, identical, negative values, codegen runs") {
    import spark.implicits._
    val rows = Seq(
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 2L, 3L), Seq(4L, 5L)),
      (Seq(-5L, -1L, 0L, 7L), Seq(-5L, -1L, 0L, 7L)),
      (Seq(Long.MinValue, 0L, Long.MaxValue), Seq(Long.MinValue, Long.MaxValue)))
    val df = rows.toDF("a", "b")
      .withColumn("fast", expr("graft_sorted_intersect_count(a, b)"))
      .withColumn("ref", size(array_intersect(col("a"), col("b"))).cast("long"))
    assert(df.filter(col("fast") =!= col("ref")).count() == 0)
    assert(df.select("fast").as[Long].collect().toSeq == Seq(0L, 0L, 4L, 2L))
  }

  // packedGrams' sorted-distinct contract (the kernel's input domain) is
  // pinned in HeapsViewParitySpec, next to the gram producer itself.
}

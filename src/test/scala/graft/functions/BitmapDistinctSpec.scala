package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BitmapDistinctSpec extends SparkSpec {

  test("bitmap distinct equals COUNT(DISTINCT) across forced partial merges") {
    import spark.implicits._
    val df = (0 until 5000).map(i => (i.toLong % 7, (i * 37 % 613).toLong))
      .toDF("g", "id")
      .repartition(13) // force map-side partials + serialize/merge on the exchange
    val got = df.groupBy("g")
      .agg(expr("graft_bitmap_distinct(id)").as("b"),
        countDistinct(col("id")).as("e"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"group ${r.getLong(0)}: bitmap ${r.getLong(1)} != exact ${r.getLong(2)}")
    }
  }

  test("ids outside the dense contract fail loudly instead of degrading") {
    import spark.implicits._
    val bad = Seq((1L, 1L << 30)).toDF("g", "id")
    val ex = intercept[Exception] {
      bad.groupBy("g").agg(expr("graft_bitmap_distinct(id)")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("dense contract")),
      s"expected the contract error, got: $ex")
  }

  test("the binary buffer round-trips through serialize/deserialize") {
    val agg = BitmapDistinct(org.apache.spark.sql.catalyst.expressions.Literal(1L))
    val buf = agg.createAggregationBuffer()
    Seq(0, 1, 63, 64, 1000000).foreach(buf.set)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back == buf && agg.eval(back) == 5L)
  }
}

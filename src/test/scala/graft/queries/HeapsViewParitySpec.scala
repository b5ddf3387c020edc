package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the round-12 typed reimplementation of [[PipelineQueries.heapsViewDocs]]
  * byte-for-byte against the original Catalyst expression form it replaced
  * (nested transform of struct(w, md5 hex) + per-salt-char
  * substring/conv/chr + array_join). The view is the d4b/d4c input AND the
  * oracle's replayed definition, so any drift here would silently move the
  * whole family's results — row-for-row string equality is the contract,
  * not merely equal pair sets downstream.
  */
class HeapsViewParitySpec extends SparkSpec {

  /** The pre-round-12 expression form, verbatim. */
  private def exprFormView(dir: String) = {
    val s = spark
    val classes = math.max(64L,
      graft.Tables.rowCount(s, s"$dir/documents.parquet") / 4)
    val base = graft.Tables.t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .withColumn("cls",
        expr("cast(conv(substring(md5(text), 1, 8), 16, 10) as bigint)") % classes)
    val planted = base.filter(col("doc_id") % 101 === 0)
      .withColumn("doc_id", -(col("doc_id") + lit(1L)))
      .withColumn("text", expr(
        "array_join(slice(split(text, ' '), 1, " +
          "cast((4 * size(split(text, ' ')) + 4) div 5 as int)), ' ')"))
    val saltChars = (0 until 8).map(i =>
      s"chr(161 + cast(conv(substring(p.h, ${1 + 2 * i}, 2), 16, 10) as int) % 94)")
      .mkString(", ")
    base.unionByName(planted)
      .withColumn("text", expr(
        "array_join(transform(" +
          "transform(split(text, ' '), w -> struct(w AS w, md5(concat(w, '#', cls)) AS h)), " +
          s"p -> concat(p.w, $saltChars)), ' ')"))
      .select("doc_id", "lang", "text")
  }

  test("typed heaps view is byte-identical to the expression form, row for row") {
    val got = PipelineQueries.heapsViewDocs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    val want = exprFormView(sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    assert(got.length == want.length,
      s"row counts differ: ${got.length} vs ${want.length}")
    got.zip(want).foreach { case (g, w) =>
      assert(g == w, s"row mismatch at doc_id ${w._1}")
    }
    // the planted near-dups exist on both sides (negative ids carry class)
    assert(got.exists(_._1 < 0), "no planted rows — the view lost its near-dups")
  }

  test("typed salting handles the degenerate word shapes the splitter can emit") {
    import spark.implicits._
    // empty text, consecutive/trailing spaces (empty words get salted too),
    // repeated words (same salt per (word, class)), single char
    val rows = Seq((1L, "en", ""), (2L, "en", "a  b "), (3L, "en", "x x x"),
      (4L, "en", "word"))
    val dir = java.nio.file.Files.createTempDirectory("heapsparity").toString
    rows.toDF("doc_id", "lang", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = PipelineQueries.heapsViewDocs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(2))).sortBy(_._1)
    val want = exprFormView(dir)
      .collect().map(r => (r.getLong(0), r.getString(2))).sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    // empty words receive an 8-char salt: "a  b " has words [a, "", b, ""]
    val salted2 = got.find(_._1 == 2L).get._2
    assert(salted2.split(" ", -1).forall(_.nonEmpty),
      "every split slot must carry at least its salt chars")
  }

  test("packedGrams emits sorted distinct arrays — graft_sorted_intersect_count's contract") {
    val texts = Seq("abcdabcd", "the quick brown fox", "aaaaaa", "xyz", "", "abcde")
    texts.foreach { t =>
      val g = PipelineQueries.packedGrams(t)
      if (g != null)
        assert(g.toSeq == g.toSeq.distinct.sorted, s"not sorted-distinct for '$t'")
    }
    assert(PipelineQueries.packedGrams("xyz") == null &&
      PipelineQueries.packedGrams("") == null)
  }
}

package graft.queries

import java.nio.file.Files
import graft.SparkSpec
import scala.util.Random

/** Property fuzz for the positional-index pair (x33 phrase search, pipe5
  * chunk retrieval) over a 2-symbol vocabulary: only 4 possible bigrams, so
  * the hottest-phrase argmax is tie-heavy, self-overlapping runs ("a a a")
  * are common, and every doc-length edge (empty, 1 token, long runs) is
  * exercised. Each round checks the engine against an independent in-memory
  * reference across several block sizes and chunk geometries.
  */
class PhraseIndexFuzzSpec extends SparkSpec {

  private def corpus(rnd: Random, n: Int): Seq[(Long, String)] =
    (0 until n).map { i =>
      val len = rnd.nextInt(21)
      val text = (0 until len).map(_ => if (rnd.nextBoolean()) "a" else "b").mkString(" ")
      (i.toLong, text)
    }

  private def writeDocs(docs: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("phrasedocs").toString
    val sp = spark
    import sp.implicits._
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def bigrams(t: String): Seq[String] = {
    val w = t.split(" ", -1)
    if (w.length < 2) Seq.empty
    else (0 until w.length - 1).map(i => s"${w(i)} ${w(i + 1)}")
  }

  test("x33 matches the reference phrase count on tie-heavy corpora, at any block") {
    for (seed <- Seq(3, 11, 42)) {
      val docs = corpus(new Random(seed), 60)
      val dir = writeDocs(docs)
      val counts = docs.flatMap(d => bigrams(d._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(counts.nonEmpty)
      val phrase = counts.toSeq.minBy { case (bg, c) => (-c, bg) }._1
      val expected = docs.flatMap { case (id, t) =>
        val n = bigrams(t).count(_ == phrase)
        if (n > 0) Some((id, phrase, n.toLong)) else None
      }.sortBy(_._1)
      for (block <- Seq(1L, 5L, 256L)) {
        val got = PipelineQueries.x33PhraseSearch(spark, dir, block).collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
        assert(got == expected, s"seed $seed block $block: diverged from reference")
      }
    }
  }

  test("pipe5 retrieval matches the reference chunk ranking under several geometries") {
    for (seed <- Seq(5, 19)) {
      val docs = corpus(new Random(seed), 40)
      val dir = writeDocs(docs)
      val sp = spark
      import sp.implicits._
      val counts = docs.flatMap(d => bigrams(d._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val phrase = counts.toSeq.minBy { case (bg, c) => (-c, bg) }._1
      for ((chunk, stride) <- Seq((8, 8), (8, 6), (5, 2))) {
        val chunks = docs.flatMap { case (id, t) =>
          val w = t.split(" ", -1)
          if (w.isEmpty) Seq.empty
          else {
            val nChunks = (math.max(w.length - chunk, 0) + stride - 1) / stride + 1
            (0 until nChunks).map { i =>
              val toks = w.slice(i * stride, i * stride + chunk)
              (id, i.toLong, (i * stride).toLong, toks.mkString(" "))
            }
          }
        }
        val expected = chunks.flatMap { case (id, ci, st, txt) =>
          val n = bigrams(txt).count(_ == phrase).toLong
          if (n > 0) Some((id, ci, st, phrase, n)) else None
        }.sortBy { case (id, ci, _, _, n) => (-n, id, ci) }.take(10)
        val got = PipelineQueries.pipe5Core(
            docs.toDF("doc_id", "text"), chunk, stride, 10).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
            r.getLong(4))).toSeq
        assert(got == expected,
          s"seed $seed geometry ($chunk,$stride): diverged from reference")
      }
    }
  }
}

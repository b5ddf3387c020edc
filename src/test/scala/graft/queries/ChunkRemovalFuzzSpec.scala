package graft.queries

import java.nio.file.Files
import graft.SparkSpec
import scala.util.Random

/** Property fuzz for the block-grid pair (d11 span removal, x25 chunking)
  * over adversarial corpus shapes no fixture covers deliberately: a 2-symbol
  * vocabulary (256 possible 8-token blocks, so cross-document duplication is
  * dense), token counts spanning empty strings, single tokens, exact grid
  * multiples and off-by-one tails, plus several (chunk, stride) geometries.
  * Each round checks the engines against an independent in-memory reference
  * and the structural invariants (losslessness, reconstruction).
  */
class ChunkRemovalFuzzSpec extends SparkSpec {

  private def corpus(rnd: Random, n: Int): Seq[(Long, String)] =
    (0 until n).map { i =>
      val len = rnd.nextInt(21) // 0..20 tokens; 0 → the empty-string doc
      val text = (0 until len).map(_ => if (rnd.nextBoolean()) "a" else "b").mkString(" ")
      (i.toLong, text)
    }

  private def writeDocs(docs: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("fuzzdocs").toString
    val sp = spark
    import sp.implicits._
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("d11 removal matches the in-memory reference on dense-duplicate corpora") {
    for (seed <- Seq(1, 7, 23)) {
      val rnd = new Random(seed)
      val docs = corpus(rnd, 60)
      val dir = writeDocs(docs)
      def blocks(t: String): Seq[String] =
        t.split(" ", -1).grouped(8).map(_.mkString(" ")).toSeq
      val first = scala.collection.mutable.Map.empty[String, (Long, Int)]
      for ((id, t) <- docs; (blk, i) <- blocks(t).zipWithIndex)
        if (!first.contains(blk)) first(blk) = (id, i)
      val expected = docs.map { case (id, t) =>
        val bs = blocks(t)
        val kept = bs.zipWithIndex.filter { case (blk, i) => first(blk) == (id, i) }
        (id, bs.size.toLong, kept.size.toLong, kept.map(_._1).mkString(" "))
      }
      val got = PipelineQueries.d11SpanRemoval(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
      assert(got == expected, s"seed $seed: engine differs from reference")
      // dense duplication means the removal path genuinely fires
      assert(got.exists(r => r._3 < r._2), s"seed $seed: no removal — fuzz degenerate")
      // losslessness on the hostile corpus too: every distinct input block
      // survives exactly once (modulo re-split alignment of kept blocks)
      val survivors = got.flatMap(r => if (r._4.isEmpty) Nil else blocks(r._4))
      assert(survivors.size == survivors.distinct.size, s"seed $seed: duplicate survived")
    }
  }

  test("x25 chunking reconstructs exactly across fuzzed geometries and lengths") {
    val rnd = new Random(99)
    val docs = corpus(rnd, 60)
    val dir = writeDocs(docs)
    for ((c, st) <- Seq((4, 3), (4, 4), (5, 1), (8, 8), (3, 2), (32, 24))) {
      val rows = PipelineQueries.x25ChunkOverlap(spark, dir, c, st).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      for ((id, t) <- docs) {
        val w = t.split(" ", -1).toSeq
        val ch = rows.filter(_._1 == id).sortBy(_._2)
        assert(ch.nonEmpty, s"doc $id lost at (c=$c, s=$st)")
        // geometry: chunk i starts at i*stride; only the last may be short
        ch.init.foreach { r => assert(r._4 == c, s"short interior chunk at (c=$c, s=$st)") }
        ch.foreach { r => assert(r._3 == r._2 * st) }
        val toks = ch.map(_._5.split(" ", -1).toSeq)
        val rebuilt = toks.head ++ toks.tail.flatMap(_.drop(c - st))
        assert(rebuilt == w, s"doc $id reconstruction differs at (c=$c, s=$st)")
      }
    }
  }
}

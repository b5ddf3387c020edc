package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JsonlDocsSpec extends SparkSpec {

  test("JSONL source separates clean documents from quarantined lines") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toFile
    try {
      val lines = Seq(
        """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web"}""",
        """{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "web"}""",
        """{"doc_id": 3, "text": "no lang or source"}""",
        """{"doc_id": 4, "lang": "en"}""", // parses, but no text → reject
        """{not json at all""") // malformed → reject
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir.getAbsolutePath, "part-0.jsonl"),
        lines.mkString("\n").getBytes("UTF-8"))

      val (clean, rejects) = JsonlDocs.read(spark, dir.getAbsolutePath)
      val docs = clean.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4)))
      assert(docs.toSeq == Seq(
        (1L, "hello world", "en", "web", 11L),
        (2L, "bonjour", "fr", "web", 7L),
        (3L, "no lang or source", "und", "", 17L)))
      // schema matches the documents-table contract downstream ops expect
      assert(clean.columns.toSeq ==
        Seq("doc_id", "text", "lang", "source", "n_chars"))
      val bad = rejects.collect().map(_.getString(0))
      assert(bad.length == 2)
      assert(bad.exists(_.contains("not json")))
    } finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete()
      }
      rm(dir)
    }
  }

  test("clean JSONL output feeds a pipeline operator unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl2").toFile
    try {
      val lines = (0 until 50).map(i =>
        s"""{"doc_id": $i, "text": "alpha beta gamma delta epsilon tok$i", "lang": "en", "source": "s"}""")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir.getAbsolutePath, "part-0.jsonl"),
        lines.mkString("\n").getBytes("UTF-8"))
      val (clean, _) = JsonlDocs.read(spark, dir.getAbsolutePath)
      // x9-shaped vocab pass directly over the source output
      val vocab = clean
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy("tok").count()
      assert(vocab.count() == 5 + 50) // 5 shared words + 50 unique tokens
    } finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete()
      }
      rm(dir)
    }
  }
}

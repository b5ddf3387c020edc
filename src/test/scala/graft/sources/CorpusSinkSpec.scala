package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusSinkSpec extends SparkSpec {

  private def withDir(f: java.io.File => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toFile
    try f(dir)
    finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete()
      }
      rm(dir)
    }
  }

  test("sink bounds files per partition and round-trips the data exactly") {
    withDir { dir =>
      val docs = graft.Tables.t(spark, sf, "documents")
      CorpusSink.write(docs, dir.getAbsolutePath,
        partitionCol = "lang", sortKey = "doc_id", filesPerPartition = 3)

      val langDirs = dir.listFiles().filter(_.getName.startsWith("lang="))
      assert(langDirs.nonEmpty, "no hive-style partition directories written")
      langDirs.foreach { d =>
        val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
        assert(files.nonEmpty && files.length <= 3,
          s"${d.getName}: ${files.length} files — salt did not bound the count")
      }

      val back = spark.read.parquet(dir.getAbsolutePath)
      assert(back.count() == docs.count())
      // full-row equality despite the lang column moving into the path
      val cols = docs.columns.sorted.map(col).toSeq
      assert(back.select(cols: _*).except(docs.select(cols: _*)).isEmpty &&
        docs.select(cols: _*).except(back.select(cols: _*)).isEmpty)
    }
  }

  test("written files are clustered by the sort key (zone-map-friendly)") {
    withDir { dir =>
      val docs = graft.Tables.t(spark, sf, "documents")
      CorpusSink.write(docs, dir.getAbsolutePath,
        partitionCol = "lang", sortKey = "doc_id", filesPerPartition = 2)
      // within every physical file, doc_id must arrive non-decreasing
      val byFile = spark.read.parquet(dir.getAbsolutePath)
        .select(col("doc_id"), input_file_name().as("f"))
        .withColumn("prev", lag("doc_id", 1).over(
          org.apache.spark.sql.expressions.Window.partitionBy("f").orderBy(monotonically_increasing_id())))
      // read order within a parquet file is row order, so a sorted write
      // means no row sees a larger predecessor
      val violations = byFile.filter(col("prev").isNotNull && col("prev") > col("doc_id")).count()
      assert(violations == 0, s"$violations out-of-order rows — files not clustered")
    }
  }

  test("read-back scan prunes statically on the partition column") {
    withDir { dir =>
      val docs = graft.Tables.t(spark, sf, "documents")
      CorpusSink.write(docs, dir.getAbsolutePath,
        partitionCol = "lang", sortKey = "doc_id")
      val lang = docs.select("lang").limit(1).collect().head.getString(0)
      val back = spark.read.parquet(dir.getAbsolutePath).filter(col("lang") === lang)
      val plan = back.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("lang"),
        "sink layout did not enable partition pruning:\n" + plan.take(1200))
    }
  }
}

package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The 100 TB storage-layout contract: a corpus written partitioned by a
  * coarse selective column (here `lang`) must let (a) a literal predicate
  * prune partitions at planning time and (b) a join against a filtered
  * dimension prune them at runtime (dynamic partition pruning) — in both
  * cases the scan never opens non-matching directories. Every query in this
  * library reads through `Tables.t`, so swapping the flat testdata files for
  * this layout is a write-side change only.
  */
class PartitionLayoutSpec extends SparkSpec {

  private def withPartitionedDocs(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toFile
    try {
      graft.Tables.t(spark, sf, "documents")
        .write.mode("overwrite").partitionBy("lang").parquet(dir.getAbsolutePath)
      f(dir.getAbsolutePath)
    } finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete()
      }
      rm(dir)
    }
  }

  test("a literal lang predicate prunes partitions statically") {
    withPartitionedDocs { dir =>
      val docs = graft.Tables.t(spark, sf, "documents")
      val lang = docs.select("lang").limit(1).collect().head.getString(0)
      val back = spark.read.parquet(dir).filter(col("lang") === lang)
      val plan = back.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("lang"),
        "partition filter missing from scan:\n" + plan.take(1200))
      // pushed as a partition filter, NOT a data filter re-evaluated per row
      assert(!plan.contains(s"PushedFilters: [IsNotNull(lang)"),
        "lang landed in data filters — partition pruning did not engage")
      assert(back.count() == docs.filter(col("lang") === lang).count())
    }
  }

  test("a join against a filtered dim prunes partitions dynamically (DPP)") {
    withPartitionedDocs { dir =>
      import spark.implicits._
      val docs = spark.read.parquet(dir)
      val flat = graft.Tables.t(spark, sf, "documents")
      val source0 = flat.select("source").as[String].first()
      // the dim's filter is on a NON-join column (source), so the planner
      // cannot rewrite it into a static partition predicate on lang — only
      // runtime pruning fed by the dim's build side can skip partitions.
      // (The dim must stay file-backed: a local relation would have the
      // filter constant-folded away, and DPP requires a selective predicate
      // on the filtering side.)
      val dim = flat.select("lang", "source")
        .filter(col("source") === source0)
        .select("lang").distinct()
      val joined = docs.join(dim, Seq("lang"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("dynamicpruning"),
        "no dynamic partition pruning in the join plan:\n" + plan.take(1500))
      val langsOfSource = flat.filter(col("source") === source0)
        .select("lang").distinct().as[String].collect().toSet
      assert(joined.count() ==
        flat.filter(col("lang").isin(langsOfSource.toSeq: _*)).count())
    }
  }
}

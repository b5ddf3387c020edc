package graft.covsonar

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The cluster-scale essence-join path: when `genome` and `profile` are
  * written bucketed (+sorted) by `seqhash`, the join planner reads the
  * co-located buckets directly and inserts NO Exchange — the join shuffle,
  * the only shuffle in the match plan, disappears entirely. This is the
  * production write layout SCALING.md prescribes; `SonarStore.optimize`'s
  * hash-cluster+sort is its single-directory approximation.
  */
class StoreBucketingSpec extends SparkSpec {

  test("bucketed-by-seqhash tables sort-merge join with zero Exchange") {
    val g = spark.range(0, 2000)
      .select(concat(lit("h"), col("id")).as("seqhash"),
        concat(lit("acc"), col("id")).as("accession"))
    val p = spark.range(0, 2000, 2) // every other seqhash has a profile
      .select(concat(lit("h"), col("id")).as("seqhash"),
        array(lit("C241T")).as("dna_profile"))

    spark.sql("DROP TABLE IF EXISTS genome_bkt")
    spark.sql("DROP TABLE IF EXISTS profile_bkt")
    g.write.bucketBy(8, "seqhash").sortBy("seqhash").saveAsTable("genome_bkt")
    p.write.bucketBy(8, "seqhash").sortBy("seqhash").saveAsTable("profile_bkt")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the test exercises the big-data join path
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("genome_bkt")
        .join(spark.table("profile_bkt"), Seq("seqhash"), "left")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        "bucketed join still shuffles:\n" + plan)
      // bucket layout must not change results
      assert(joined.count() == 2000)
      assert(joined.filter(col("dna_profile").isNotNull).count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS genome_bkt")
      spark.sql("DROP TABLE IF EXISTS profile_bkt")
    }
  }
}

package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan assertions for the headline relational queries — the
  * properties that decide 100 TB behavior: filters reach the parquet scans,
  * constant dims broadcast instead of shuffling the fact table, and scans
  * read only the columns the query needs.
  */
class PlanQualitySpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q1: date filter pushes into the lineitem scan; scan is pruned") {
    val p = plan(RelationalQueries.q1PricingSummary(spark, sf))
    assert(p.contains("PushedFilters:") && p.contains("l_shipdate"),
      "shipdate predicate did not reach the scan")
    val readSchemas = p.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    assert(!readSchemas.contains("l_comment"), // 16-col table, query needs 7
      "lineitem scan reads unneeded columns:\n" + readSchemas)
  }

  test("q5: every join hashes on a key; lineitem is never a broadcast build side") {
    // At bench scale all dims fit the broadcast threshold and lineitem
    // streams through five BroadcastHashJoins — the optimal plan (at 100 TB
    // the dims-over-threshold joins become sort-merge, same declarative
    // plan). What must NEVER appear: a nested-loop/cartesian fallback, or
    // the fact table on a build side.
    val p = plan(RelationalQueries.q5RegionRevenue(spark, "/root/testdata/sf0.1"))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "join degenerated to a product:\n" + p.take(1500))
    // the aggregation still shuffles by group key
    assert(p.contains("Exchange"))
  }

  test("p1: IN-list predicate reaches the scan") {
    val p = plan(RelationalQueries.p1Isin(spark, sf))
    assert(p.contains("PushedFilters:") && p.contains("In("),
      "isin predicate did not push down:\n" +
        p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
  }
}

package graft.plans

import graft.SparkSpec
import graft.functions.DotProduct

class CanonicalizeCommutativeSpec extends SparkSpec {

  test("commutative graft calls canonicalize to one syntactic form; values unchanged") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
      .selectExpr("graft_dot(a, b) AS ab", "graft_dot(b, a) AS ba")
    def dots(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.expressions.flatMap(_.collect { case d: DotProduct => d })
    val analyzed = df.queryExecution.analyzed
    assert(dots(analyzed).map(_.canonicalized).distinct.size == 2,
      "fixture must start with two syntactically-distinct forms")
    val after = CanonicalizeCommutativeVectorOps(analyzed)
    assert(dots(after).map(_.canonicalized).distinct.size == 1,
      "rule must collapse the two argument orders to one form")
    // strict-inequality swap ⇒ idempotent under the fixed-point batch
    assert(CanonicalizeCommutativeVectorOps(after) == after)
    // the swap is bit-identical, not just approximately equal
    val row = df.collect()(0)
    assert(java.lang.Double.doubleToRawLongBits(row.getDouble(0)) ==
      java.lang.Double.doubleToRawLongBits(row.getDouble(1)))
  }

  test("the extensions route actually injects the rule") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
    val rules = org.apache.spark.sql.GraftExtensionsTestAccess
      .injectedOptimizerRules(ext, spark)
    assert(rules.contains(CanonicalizeCommutativeVectorOps),
      s"rule not injected; got: $rules")
  }
}

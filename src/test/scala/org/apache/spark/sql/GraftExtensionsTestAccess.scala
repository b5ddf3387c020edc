package org.apache.spark.sql

/** Test-only bridge: `SparkSessionExtensions.registerFunctions` is
  * `private[sql]`, so the spec asserting what GraftExtensions injects needs
  * an accessor inside the package. No production code depends on this.
  */
object GraftExtensionsTestAccess {
  def injectedFunctionNames(ext: SparkSessionExtensions): Seq[String] = {
    val reg = new org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry
    ext.registerFunctions(reg)
    reg.listFunction().map(_.funcName)
  }

  def injectedOptimizerRules(ext: SparkSessionExtensions, session: SparkSession)
      : Seq[org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]] =
    ext.buildOptimizerRules(session)
}

package graft

import org.apache.spark.sql.{GraftExtensionsTestAccess, SparkSessionExtensions}
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("the extensions route registers the same function surface as Tables.configure") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val injected = GraftExtensionsTestAccess.injectedFunctionNames(ext).toSet
    graft.functions.VectorExpressions.builders.foreach { case (name, _) =>
      assert(injected.contains(name), s"$name not injected")
    }
  }
}

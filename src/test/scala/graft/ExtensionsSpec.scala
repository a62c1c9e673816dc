package graft

import org.apache.spark.sql.{GraftColumnBridge, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Literal
import org.scalatest.funsuite.AnyFunSuite

/** graft.GraftExtensions is the `spark.sql.extensions` deployment path —
  * this spec drives the injection the way session building does (via the
  * extensions object into a registry), against a FRESH registry, so it
  * proves cluster users get every function without Registry.registerAll
  * ever running. */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects every registered function into a fresh registry") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val reg = GraftColumnBridge.emptyFunctionRegistry
    GraftColumnBridge.registerInjectedFunctions(ext, reg)
    graft.functions.Registry.functions.foreach { case (name, _) =>
      assert(reg.functionExists(FunctionIdentifier(name)),
        s"extensions path must register '$name'")
    }
    assert(graft.functions.Registry.functions.nonEmpty)
  }

  test("injected builders produce the same expressions as Registry.registerAll") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val reg = GraftColumnBridge.emptyFunctionRegistry
    GraftColumnBridge.registerInjectedFunctions(ext, reg)
    // a NATIVE kernel (directly evaluable, no analyzer needed): the
    // extensions-injected builder must be the very same singleton the
    // per-session path installs — identical expression, identical result
    val lit = Literal.create("alpha beta gamma",
      org.apache.spark.sql.types.StringType)
    val viaExt = reg.lookupFunction(FunctionIdentifier("normalize_text"), Seq(lit))
    val direct = graft.functions.Registry.functions
      .find(_._1 == "normalize_text").get._2(Seq(lit))
    assert(viaExt.eval(null) == direct.eval(null))
    assert(viaExt.eval(null) != null)
    // Column-combinator builders (lang_id etc.) yield analyzer-shaped
    // trees — prove the builder fires and produces a tree, which session
    // analysis then resolves exactly as the registerAll path does (both
    // call the same function value)
    val tree = reg.lookupFunction(FunctionIdentifier("lang_id"), Seq(lit))
    assert(tree != null)
  }
}

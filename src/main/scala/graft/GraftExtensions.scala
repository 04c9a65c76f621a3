package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** The standard Spark extension entry point for the graft engine:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * // or
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * Injects every graft kernel as a session-bound SQL function and the
  * TopKPerKey planner strategy at SESSION BUILD time — the front door
  * Spark provides for libraries. The runtime-attach path
  * ([[graft.functions.VectorFunctions.ensureRegistered]] via the
  * package-bridge registry) stays for sessions the library did not
  * create (a notebook user's existing session); both register the same
  * builders, so either path yields the same query surface.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.functions", name), builder)

  override def apply(ext: SparkSessionExtensions): Unit = {
    // the one canonical builder list — shared with the runtime-attach
    // path, so the two front doors expose the identical function surface
    VectorFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction(fn(name, builder))
    }
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    ext.injectOptimizerRule(_ => graft.plans.WindowTopKRewrite)
  }
}

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
    Seq(
      fn("graft_dot", c => FloatDotProduct(c(0), c(1))),
      fn("graft_isect", c => SortedArrayIntersectCount(c(0), c(1))),
      fn("graft_minhash16", c => MinhashSignatures(c(0))),
      fn("graft_rh_buckets", c => RhLshBuckets(c(0))),
      fn("graft_simhash16", c => Simhash16(c(0))),
      fn("graft_simhash64", c => Simhash64(c(0), c(1))),
      fn("graft_bloom_contains", c => BloomContains(c(0), c(1))),
      fn("graft_h16", c => Md5PrefixHash(c(0), 4)),
      fn("graft_h32", c => Md5PrefixHash(c(0), 8)),
      fn("graft_h64", c => Md5PrefixHash(c(0), 15)),
      fn("graft_cdc_ends", c => CdcEnds(c(0))),
      fn("graft_char3grams", c => CharNgrams(c(0), 3))
    ).foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    ext.injectOptimizerRule(_ => graft.plans.WindowTopKRewrite)
  }
}

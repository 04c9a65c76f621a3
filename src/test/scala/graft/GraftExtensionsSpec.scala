package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The builder-time extension entry point: a session built with
  * `withExtensions(new GraftExtensions)` has every graft_* function and
  * the TopKPerKey strategy WITHOUT any runtime ensureRegistered call.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions session exposes the kernels and the planner strategy") {
    val base = SparkSessionHelper.spark // shares its SparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = try SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
    try {
      val r = s2.sql(
        "SELECT graft_h32('abc') AS h, graft_dot(array(cast(1.0 as float)," +
          " cast(2.0 as float)), array(cast(3.0 as float)," +
          " cast(4.0 as float))) AS d").collect()(0)
      // md5('abc') = 900150983cd24fb0...: first 8 hex digits
      assert(r.getLong(0) == java.lang.Long.parseLong("90015098", 16))
      assert(r.getDouble(1) == 11.0)
      assert(s2.sessionState.planner.strategies
        .contains(graft.plans.TopKPerKeyStrategy))
    } finally {
      // drop only the extra session; the shared context stays up
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}

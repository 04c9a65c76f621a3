package graft

import org.scalatest.funsuite.AnyFunSuite

/** Shuffle-free co-located join via bucketing — the 100 TB play for the
  * recurring orders⋈lineitem fact-fact join (SURVEY.md §4.3 / the scale
  * brief): both tables bucketed by the join key at write time mean the
  * join plan carries NO Exchange on either side, so at cluster scale the
  * petabyte shuffle disappears entirely and only the map-side sort
  * remains. Asserted on the physical plan, and the result is checked
  * against the plain (shuffled) join.
  */
class BucketedJoinSpec extends AnyFunSuite {

  test("bucketed orders ⋈ lineitem joins without an exchange") {
    val spark = SparkSessionHelper.spark
    // managed tables land in the default warehouse; DROP TABLE below
    // removes their data (warehouse.dir is a static conf)
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    // at sf0.001 the planner would broadcast the tiny side, hiding the
    // bucketed path; at 100 TB neither fact side is broadcastable, which
    // is exactly the case bucketing exists for — simulate it
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.read.parquet(s"$dir/orders.parquet")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .format("parquet").saveAsTable("orders_b")
      spark.read.parquet(s"$dir/lineitem.parquet")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .format("parquet").saveAsTable("lineitem_b")

      val joined = spark.sql(
        """SELECT o_orderkey, COUNT(*) AS n, SUM(l_quantity) AS qty
          |FROM orders_b JOIN lineitem_b ON o_orderkey = l_orderkey
          |GROUP BY o_orderkey""".stripMargin)
      val plan = joined.queryExecution.executedPlan.toString

      // co-located: the join itself must not shuffle either side
      val joinSection = plan.split("HashAggregate").last
      assert(joinSection.contains("SortMergeJoin"), plan.take(3000))
      assert(!joinSection.contains("Exchange hashpartitioning"),
        "bucketed join must not re-shuffle:\n" + plan.take(3000))

      // same result as the plain shuffled join
      val plain = spark.read.parquet(s"$dir/orders.parquet")
        .join(spark.read.parquet(s"$dir/lineitem.parquet"),
          org.apache.spark.sql.functions.col("o_orderkey") ===
            org.apache.spark.sql.functions.col("l_orderkey"))
        .groupBy("o_orderkey").count()
      assert(joined.count() == plain.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}

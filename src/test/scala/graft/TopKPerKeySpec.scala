package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{TopKPerKeyExec, TopKPerKeyOps, WindowTopKRewriteOps}

/** Null-handling and metrics contract of the custom bounded-heap
  * operator (plans/TopKPerKey.scala): NULL keys form their own group and
  * NULL order/tie values rank weakest — the same answer as the
  * `row_number().over(Window)` formulation it replaces — and the
  * executed plan exposes SQLMetrics for rows in/out and heaps held.
  */
class TopKPerKeySpec extends AnyFunSuite {

  private val spark = SparkSessionHelper.spark
  import spark.implicits._

  private def findExec(p: SparkPlan): Option[TopKPerKeyExec] = p match {
    case t: TopKPerKeyExec        => Some(t)
    case a: AdaptiveSparkPlanExec => findExec(a.executedPlan)
    case q: QueryStageExec        => findExec(q.plan)
    case other => other.children.flatMap(findExec(_)).headOption
  }

  test("null keys group together; null order ranks weakest; metrics") {
    val df = Seq[(Option[Long], Option[Long], Long)](
      (Some(1L), Some(1L), 1L), (Some(1L), Some(2L), 2L),
      (Some(1L), Some(3L), 3L), (Some(1L), Some(4L), 4L),
      (None, Some(10L), 5L), (None, Some(20L), 6L), (None, Some(30L), 7L),
      (Some(2L), None, 8L), (Some(2L), Some(5L), 9L), (Some(2L), Some(7L), 10L)
    ).toDF("k", "o", "t")

    val result = TopKPerKeyOps.topKPerKey(df, 2, "k", "o", "t")
    val rows = result.collect()
      .map(r => (if (r.isNullAt(0)) null else r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1))).toSet

    // per group the two largest orders survive; key-2's NULL order loses
    assert(rows == Set((1L, 4L), (1L, 3L), (null, 30L), (null, 20L),
      (2L, 7L), (2L, 5L)))

    val exec = findExec(result.queryExecution.executedPlan)
      .getOrElse(fail("TopKPerKeyExec not found in executed plan"))
    assert(exec.metrics("numInputRows").value == 10)
    assert(exec.metrics("numOutputRows").value == 6)
    assert(exec.metrics("numHeaps").value == 3) // keys 1, 2, and NULL
  }

  test("NULL order loses to a legitimate Long.MinValue order") {
    // sentinel-encoding regression: NULL must rank strictly below EVERY
    // real value, including the extremes a sentinel would collide with
    val df = Seq[(Long, Option[Long], Option[Long])](
      (1L, None, Some(1L)), (1L, Some(Long.MinValue), Some(2L)),
      (2L, Some(Long.MaxValue), None), (2L, Some(Long.MaxValue), Some(Long.MaxValue))
    ).toDF("k", "o", "t")
    val rows = TopKPerKeyOps.topKPerKey(df, 1, "k", "o", "t")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // key 1: the MinValue-order row (tie 2) beats the NULL-order row;
    // key 2: equal orders — real MaxValue tie beats NULL tie
    assert(rows == Set((1L, 2L), (2L, Long.MaxValue)))
  }

  test("window-formulation equivalence on a nullable corpus") {
    val df = Seq[(Option[Long], Option[Long], Long)](
      (Some(9L), Some(5L), 1L), (Some(9L), Some(5L), 2L),
      (Some(9L), Some(6L), 3L), (None, None, 4L), (None, Some(1L), 5L)
    ).toDF("k", "o", "t")
    val viaWindow = df.selectExpr("k", "o", "t",
        "row_number() over (partition by k order by o desc nulls last," +
          " t asc nulls last) as rn")
      .where("rn <= 2").drop("rn")
      .collect().map(_.toSeq).toSet
    val viaExec = TopKPerKeyOps.topKPerKey(df, 2, "k", "o", "t")
      .collect().map(_.toSeq).toSet
    assert(viaExec == viaWindow)
  }

  test("WindowTopKRewrite: plain idiom gets the heap operator, same rows") {
    WindowTopKRewriteOps.ensureRegistered(spark)
    val df = Seq[(Long, Long, Long)](
      (1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L), (1L, 30L, 4L),
      (2L, 5L, 5L), (2L, 6L, 6L)
    ).toDF("k", "o", "t")
    val idiom = df.selectExpr("k", "o", "t",
        "row_number() over (partition by k order by o desc, t) as rn")
      .where("rn <= 2")
    assert(findExec(idiom.queryExecution.executedPlan).isDefined,
      "rewrite did not fire:\n" +
        idiom.queryExecution.executedPlan.toString.take(2000))
    val got = idiom.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(got == Set((1L, 30L, 3L, 1), (1L, 30L, 4L, 2), (2L, 6L, 6L, 1),
      (2L, 5L, 5L, 2)))
  }

  test("WindowTopKRewrite honors ASC NULLS FIRST tie (Spark's default)") {
    WindowTopKRewriteOps.ensureRegistered(spark)
    val df = Seq[(Long, Long, Option[Long])](
      (1L, 10L, Some(1L)), (1L, 10L, None), (1L, 10L, Some(2L))
    ).toDF("k", "o", "t")
    // plain `t` asc = NULLS FIRST: the null-tie row ranks 1
    val idiom = df.selectExpr("k", "o", "t",
        "row_number() over (partition by k order by o desc, t) as rn")
      .where("rn <= 2")
    assert(findExec(idiom.queryExecution.executedPlan).isDefined)
    val kept = idiom.collect()
      .map(r => (if (r.isNullAt(2)) null else r.getLong(2), r.getInt(3)))
      .toSet
    assert(kept == Set((null, 1), (1L, 2)), kept.toString)
  }

  test("WindowTopKRewrite leaves residual conjuncts and foreign shapes") {
    WindowTopKRewriteOps.ensureRegistered(spark)
    val df = Seq[(Long, Long, Long)](
      (1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L), (2L, 6L, 6L)
    ).toDF("k", "o", "t")
    // extra conjunct survives as a residual filter over the rewrite
    val mixed = df.selectExpr("k", "o", "t",
        "row_number() over (partition by k order by o desc, t) as rn")
      .where("rn <= 2 AND o > 10")
    assert(findExec(mixed.queryExecution.executedPlan).isDefined)
    assert(mixed.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 30L), (1L, 20L)))
    // rank() is not row_number(): the rule must not touch it
    val rank = df.selectExpr("k", "o", "t",
        "rank() over (partition by k order by o desc) as rn")
      .where("rn <= 2")
    assert(findExec(rank.queryExecution.executedPlan).isEmpty)
    assert(rank.count() == 3)
  }

  test("API contract errors surface at PLAN time with the problem " +
      "named: k < 1, a wrong-typed column, and case-insensitive " +
      "resolution like Spark's own") {
    val df = Seq((1L, 10L, 1L)).toDF("k", "o", "t")
    val e1 = intercept[IllegalArgumentException] {
      graft.plans.TopKPerKeyOps.topKPerKey(df, 0, "k", "o", "t")
    }
    assert(e1.getMessage.contains("k >= 1"), e1.getMessage)
    val intDf = Seq((1, 10L, 1L)).toDF("k", "o", "t")
    val e2 = intercept[IllegalArgumentException] {
      graft.plans.TopKPerKeyOps.topKPerKey(intDf, 2, "k", "o", "t")
    }
    assert(e2.getMessage.contains("bigint"), e2.getMessage)
    // "K" resolves to column k under the default case-insensitive
    // analysis (it used to fail resolution)
    assert(graft.plans.TopKPerKeyOps
      .topKPerKey(df, 1, "K", "o", "t").count() == 1)
  }

  test("the rewrite honors its opt-out conf (the spillable native " +
      "Window is the safer plan at extreme key cardinality)") {
    WindowTopKRewriteOps.ensureRegistered(spark)
    val df = Seq((1L, 10L, 1L), (1L, 20L, 2L)).toDF("k", "o", "t")
    def idiom() = df.selectExpr("k", "o", "t",
        "row_number() over (partition by k order by o desc, t) as rn")
      .where("rn <= 1")
    spark.conf.set("graft.window.topk.rewrite", "false")
    try assert(findExec(idiom().queryExecution.executedPlan).isEmpty,
      "the opt-out must leave the native Window plan")
    finally spark.conf.unset("graft.window.topk.rewrite")
    assert(findExec(idiom().queryExecution.executedPlan).isDefined)
  }

  test("the per-partition key-cardinality envelope refuses loudly, " +
      "never an opaque OOM") {
    val df = spark.range(0, 100L).selectExpr("id AS k", "id AS o",
      "id AS t")
    spark.conf.set(graft.plans.TopKPerKeyExec.MaxKeysKey, "10")
    try {
      val e = intercept[org.apache.spark.SparkException] {
        graft.plans.TopKPerKeyOps.topKPerKey(df, 1, "k", "o", "t")
          .count()
      }
      assert(e.getMessage.contains("maxKeysPerPartition") ||
        Option(e.getCause).exists(
          _.getMessage.contains("maxKeysPerPartition")), e.getMessage)
    } finally spark.conf.unset(graft.plans.TopKPerKeyExec.MaxKeysKey)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.run.StoreCtl
import graft.operators.Dedup

/** The named-path operational face of the persistent stores: build /
  * fold / stats round-trips through StoreCtl.run for each store kind,
  * plus the refusal contracts (build onto a committed store, fold
  * from nothing, fold onto a committed generation).
  */
class StoreCtlSpec extends AnyFunSuite {

  private val spark = SparkSessionHelper.spark
  private val dir = "/root/testdata/sf0.001"

  private def tmp(name: String): String = {
    val f = new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      s"graft_storectl_${name}_p${ProcessHandle.current().pid()}")
    def rec(g: java.io.File): Unit = {
      if (g.isDirectory) g.listFiles().foreach(rec)
      g.delete()
    }
    rec(f)
    f.toString
  }

  test("phash: build → stats → fold → stats round-trip, with the " +
      "immutability refusals") {
    val store = tmp("ph0")
    val gen1 = tmp("ph1")
    assert(StoreCtl.run(spark,
      Seq("build", "phash", dir, store, Dedup.oldPred)).isRight)
    val st0 = StoreCtl.run(spark, Seq("stats", store))
    assert(st0.exists(_.contains("\"bands\": 4")), st0)
    // a committed store refuses a second build
    assert(StoreCtl.run(spark,
      Seq("build", "phash", dir, store)).isLeft)
    // fold the other half as generation 1
    assert(StoreCtl.run(spark, Seq("fold", "phash", dir, store, gen1,
      s"NOT (${Dedup.oldPred})")).isRight)
    val st1 = StoreCtl.run(spark, Seq("stats", gen1))
    assert(st1.isRight, st1)
    // the generation counts grew and gen-0 is untouched
    def docs(st: Either[String, String]): Long =
      """"docs":\s*(\d+)""".r
        .findFirstMatchIn(st.toOption.get).get.group(1).toLong
    assert(docs(st1) > docs(st0))
    assert(StoreCtl.run(spark, Seq("stats", store)) == st0)
    // a committed generation refuses to be folded onto
    assert(StoreCtl.run(spark, Seq("fold", "phash", dir, store, gen1,
      "true")).isLeft)
    // folding FROM an empty path refuses
    assert(StoreCtl.run(spark,
      Seq("fold", "phash", dir, tmp("phnone"), tmp("phout"),
        "true")).isLeft)
  }

  test("cluster and ivfpq kinds build + stats through the same face") {
    val cst = tmp("cl0")
    assert(StoreCtl.run(spark,
      Seq("build", "cluster", dir, cst, Dedup.oldPred)).isRight)
    assert(StoreCtl.run(spark, Seq("stats", cst))
      .exists(_.contains("\"threshold\"")))
    val ist = tmp("iv0")
    assert(StoreCtl.run(spark,
      Seq("build", "ivfpq", dir, ist)).isRight)
    assert(StoreCtl.run(spark, Seq("stats", ist))
      .exists(_.contains("\"cents\"")))
    // usage errors surface as Left, never an exception
    assert(StoreCtl.run(spark, Seq("frobnicate")).isLeft)
    assert(StoreCtl.run(spark,
      Seq("build", "nosuch", dir, tmp("x"))).isLeft)
  }
}

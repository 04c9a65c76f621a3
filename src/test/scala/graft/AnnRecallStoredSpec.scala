package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Similarity, StoreFiles}

/** The served-chain recall gate behind sim_ann_recall_stored: the
  * three-generation IVF-PQ chain (gen-0 trains, gen-1/gen-2 fold,
  * each flip walking the `_CURRENT.json` pointer) must serve a model
  * whose measured recall clears a declared floor, and the CHAIN
  * itself must add zero drift — the report from the pointer-served
  * gen-2 equals the report from the one-shot in-memory fold of the
  * same frozen codebooks, so any recall loss is the model's
  * quantization, never the store machinery's.
  */
class AnnRecallStoredSpec extends AnyFunSuite {

  private val spark = SparkSessionHelper.spark
  private val dir = "/root/testdata/sf0.001"

  /** Declared recall floor for the fixture: total n_found across the
    * 8 query vectors. Measured 4 at build time (near-uniform noise
    * embeddings + the K=4 spec constants keep absolute recall low by
    * construction — see the key's comment); the floor is set at half
    * so the alarm trips on a real regression (a mangled fold, a
    * codebook bit lost in the store round-trip), not on the fixture's
    * inherent noise.
    */
  private val Floor = 2L

  test("the pointer-served gen-2 chain clears the recall floor and " +
      "bit-matches the one-shot in-memory fold") {
    val served = Similarity.ensureIvfPqGenChain(spark, dir)
    assert(served.endsWith("gen-2"), served)
    // the chain really is pointer-resolved, not a hardwired path
    val root = new java.io.File(served).getParent
    assert(StoreFiles.serve(root) == Right(served))
    assert(StoreFiles.readCurrent(root).map(_._1) == Some("gen-2"))

    def report(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

    val chain = report(
      SparkEntry.queries("sim_ann_recall_stored")(spark, dir))
    assert(chain.map(_._2).sum >= Floor,
      s"recall floor broken: ${chain.mkString(", ")}")
    // every query vector is reported, found or not (LEFT join contract)
    assert(chain.map(_._1) ==
      (Similarity.IvfQ.toLong until 500L).toSeq)

    // zero store drift: the same frozen codebooks folded in memory
    // (no generations, no pointer) produce the identical report
    val prior = Similarity.IvfPqStore.load(spark,
      Similarity.ensureIvfPqOldStore(spark, dir))
    val oneShot = Similarity.IvfPqModel(prior.cents, prior.codebooks,
      prior.codes.union(Similarity.ivfPqEncode(spark, dir, prior,
        s"vec_id >= ${Similarity.IvfTrainOld}")))
    assert(report(
      Similarity.annRecallStoredFrame(spark, dir, oneShot)) == chain)
  }
}

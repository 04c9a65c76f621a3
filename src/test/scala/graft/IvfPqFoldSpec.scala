package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** The add()-into-a-served-index path (sim_ivfpq_fold_stored): the
  * driver gate hash-checks the end result against the train-on-half
  * oracle; this spec pins the store mechanics — the next generation is
  * exactly stored-codes ∪ frozen-encode(rest), the model halves are
  * FROZEN (copied bit-for-bit, never retrained), generation 0 is
  * immutable under the fold, and the frozen-ness is non-vacuous (the
  * half-trained codebooks genuinely differ from full-corpus training,
  * so a fold that silently retrained would not hash-match the gate).
  */
class IvfPqFoldSpec extends AnyFunSuite {

  private val spark = SparkSessionHelper.spark
  private val dir = "/root/testdata/sf0.001"

  private def codeSet(df: org.apache.spark.sql.DataFrame)
      : Set[Seq[Long]] =
    df.collect().map(r =>
      (0 until r.length).map(i => r.getLong(i)).toSeq).toSet

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    f.delete()
  }

  test("foldInto writes gen-1 = stored ∪ frozen-encoded, model frozen, " +
      "gen-0 immutable; half-training is non-vacuous") {
    val store = Similarity.ensureIvfPqOldStore(spark, dir)
    val gen0 = Similarity.IvfPqStore.load(spark, store)
    val gen0Codes = codeSet(gen0.codes)
    val newWhere = s"vec_id >= ${Similarity.IvfTrainOld}"
    val expectedAdd = codeSet(
      Similarity.ivfPqEncode(spark, dir, gen0, newWhere))

    val out = store + "_g1spec"
    deleteRec(new java.io.File(out))
    Similarity.ivfPqStoreFoldInto(spark, dir, store, out, newWhere)
    val gen1 = Similarity.IvfPqStore.load(spark, out)

    // codes: exactly the stored set plus the frozen-encoded rest
    assert(codeSet(gen1.codes) == gen0Codes ++ expectedAdd)
    assert(expectedAdd.nonEmpty, "nothing past the training half: " +
      "the union assert is vacuous")
    // model halves frozen across the generation
    assert(gen1.cents == gen0.cents)
    assert(gen1.codebooks == gen0.codebooks)
    // generation 0 untouched by the fold
    assert(codeSet(
      Similarity.IvfPqStore.load(spark, store).codes) == gen0Codes)

    // non-vacuity of the frozen contract: training on the half corpus
    // must actually move some sub-codebook vs full-corpus training —
    // otherwise "frozen vs retrained" would be indistinguishable and
    // the driver gate's train-on-half oracle would prove nothing.
    val full = Similarity.trainIvfPq(spark, dir)
    assert(full.codebooks != gen0.codebooks,
      "half-corpus training produced the full-corpus codebooks: " +
        "the fold fixture cannot distinguish frozen from retrained")
  }

  test("a two-batch fold chain (gen-0 → gen-1 → gen-2) lands on the " +
      "single-shot fold's store") {
    // The production ingest pattern is REPEATED add(): batches land as
    // successive immutable generations, each encoding only its own
    // rows with the same frozen gen-0 model. Because encode is
    // row-local and the model never changes, chaining must equal one
    // big fold — pinned here so a future fold that touched the model
    // (or re-encoded prior rows) fails CI.
    val store = Similarity.ensureIvfPqOldStore(spark, dir)
    val mid = (Similarity.IvfTrainOld + Similarity.IvfQ) / 2
    val g1 = store + "_chain_g1"
    val g2 = store + "_chain_g2"
    val one = store + "_chain_oneshot"
    Seq(g1, g2, one).foreach(p => deleteRec(new java.io.File(p)))
    Similarity.ivfPqStoreFoldInto(spark, dir, store, g1,
      s"vec_id >= ${Similarity.IvfTrainOld} AND vec_id < $mid")
    Similarity.ivfPqStoreFoldInto(spark, dir, g1, g2,
      s"vec_id >= $mid")
    Similarity.ivfPqStoreFoldInto(spark, dir, store, one,
      s"vec_id >= ${Similarity.IvfTrainOld}")
    val chained = Similarity.IvfPqStore.load(spark, g2)
    val oneshot = Similarity.IvfPqStore.load(spark, one)
    assert(codeSet(chained.codes) == codeSet(oneshot.codes))
    assert(chained.cents == oneshot.cents)
    assert(chained.codebooks == oneshot.codebooks)
  }
}

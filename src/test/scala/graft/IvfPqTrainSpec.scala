package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** End-to-end IVF-PQ TRAINING at a production cell count (K = 256, the
  * standard 8-bit PQ codebook size) over the real embeddings fixture.
  * The kernel-level K = 256 check lives in IvfPqKernelSpec; this gate
  * pins that the whole staged training pipeline — checkpointed base
  * projection, seed collection, the single posexplode centroid-update
  * aggregation, and the kernel-argmin encode pass — runs at a K where
  * the pre-kernel literal-argmin form could not compile (O(K·dim)
  * generated Java vs Janino's 64 KB method ceiling), and that every
  * produced coarse assignment is the exact integer argmin a driver-side
  * reference computes.
  *
  * The driver queries keep KmK = 4 (the oracle spec constant); this
  * spec calls the parameterized trainer directly, bypassing the serving
  * model cache.
  */
class IvfPqTrainSpec extends AnyFunSuite {

  private val spark = SparkSessionHelper.spark
  private val dir = "/root/testdata/sf0.001"
  private val K = 256
  private val Dim = 64
  private val PqDim = 16

  /** The fixed-point quantization the trainer applies (x4S). */
  private def quantize(e: Seq[Float]): Seq[Long] =
    e.map(x => math.floor(x.toDouble * 10000.0 + 0.5).toLong)

  private def d2(a: Seq[Long], b: Seq[Long]): Long =
    a.zip(b).map { case (p, q) => (p - q) * (p - q) }.sum

  test(s"staged IVF-PQ training at K = $K reproduces the exact " +
       "driver-side argmin on every corpus vector") {
    val model = Similarity.trainIvfPq(spark, dir, kCells = K)
    // seeds are vec_id < K; the corpus has >= K vectors, so all K cells
    // exist in the coarse codebook, each with a full-dim centroid
    assert(model.cents.size == K)
    assert(model.cents.forall(_._2.size == Dim))
    // 4 sub-codebooks of <= K surviving cells, PqDim-dim each
    assert(model.codebooks.size == 4)
    model.codebooks.foreach { cb =>
      assert(cb.nonEmpty && cb.size <= K)
      assert(cb.forall(_._2.size == PqDim))
    }
    val raw = Engine.table(spark, dir, "embeddings")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> quantize(r.getSeq[Float](1).toSeq)).toMap
    val codes = model.codes.collect()
    assert(codes.length == raw.size)
    codes.foreach { r =>
      val id = r.getLong(r.fieldIndex("vec_id"))
      val x4 = raw(id)
      // coarse cell: first minimum over cell-sorted centroids
      val expectedCell = model.cents.sortBy(_._1)
        .map { case (cell, c) => (cell, d2(x4, c)) }
        .minBy { case (cell, dist) => (dist, cell) }._1
      assert(r.getLong(r.fieldIndex("cell")) == expectedCell, s"vec $id")
      // per-subspace PQ code: same argmin over the sub-codebook
      (0 until 4).foreach { m =>
        val slice = x4.slice(PqDim * m, PqDim * (m + 1))
        val expectedCode = model.codebooks(m).sortBy(_._1)
          .map { case (cell, c) => (cell, d2(slice, c)) }
          .minBy { case (cell, dist) => (dist, cell) }._1
        assert(r.getLong(r.fieldIndex(s"code_$m")) == expectedCode,
          s"vec $id subspace $m")
      }
    }
  }

  test("IvfPqStore round-trips a trained model bit-for-bit " +
       "(and at K = 256)") {
    val model = Similarity.trainIvfPq(spark, dir, kCells = K)
    val out = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_store").toString
    Similarity.IvfPqStore.save(model, out)
    val loaded = Similarity.IvfPqStore.load(spark, out)
    // model side: exact structural equality after the JSON round-trip
    assert(loaded.cents == model.cents.sortBy(_._1))
    assert(loaded.codebooks.map(_.sortBy(_._1)) ==
      model.codebooks.map(_.sortBy(_._1)))
    // index side: the parquet code table carries the same code rows
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().toSeq.map(r => (0 until r.length).map(r.getLong).toSeq)
        .sortBy(_.head)
    assert(rows(loaded.codes.select(model.codes.columns.map(
      org.apache.spark.sql.functions.col).toIndexedSeq: _*)) ==
      rows(model.codes))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** The streaming retrieval face (Streams.annServeStream via the
  * st_ann_serve_replay gates): per-query ANN top-k served from the
  * disk-persisted IVF-PQ store. The driver gates hash it against
  * sim_ivfpq's self-contained DuckDB restatement; this spec pins the
  * intra-engine three-way agreement — the stream must land on the
  * BATCH stored-serve table row-for-row (same store instance, same
  * codebook literals, same tie-breaks), in order and under disorder.
  */
class AnnServeSpec extends AnyFunSuite {

  private val spark = SparkSessionHelper.spark
  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame)
      : Seq[(Long, Long, Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq

  test("streaming serve equals the batch stored-serve table " +
      "row-for-row, in order and under bounded disorder") {
    val batch = rows(SparkEntry.queries("sim_ivfpq_stored")(spark, dir))
    assert(batch.nonEmpty, "empty batch serving table: the agreement " +
      "asserts below would be vacuous")
    val streamed = rows(
      SparkEntry.queries("st_ann_serve_replay")(spark, dir))
    val ooo = rows(
      SparkEntry.queries("st_ann_serve_ooo_replay")(spark, dir))
    assert(streamed == batch,
      s"stream emitted ${streamed.size} rows, batch has ${batch.size}")
    assert(ooo == batch)
  }
}

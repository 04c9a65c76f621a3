package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Multimodal}

/** The streaming MEDIA serve path (Streams.storePhashStream via the
  * st_store_phash_replay gates): ingest payloads near-dup-flagged
  * against the SERVED persistent phash store. Driver gates hash it
  * against the independent all-pairs old-new Hamming spec; this spec
  * pins the intra-engine invariants — disorder invariance, and exact
  * agreement with the batch pair query's own old-new slice (stream
  * and batch band the same signatures, and the 4x16 pigeonhole makes
  * banded = all-pairs a theorem, so the agreement must be exact).
  */
class StorePhashReplaySpec extends AnyFunSuite {

  private val spark = SparkSessionHelper.spark
  private val dir = "/root/testdata/sf0.001"

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_id", "owner_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("in-order and bounded-disorder replays emit the identical pair " +
      "set, equal to the batch pair query's old-new slice") {
    Multimodal.ensurePhashStore(spark, dir)
    val olds = Engine.table(spark, dir, "documents")
      .where(Dedup.oldPred).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val streamed = pairs(
      SparkEntry.queries("st_store_phash_replay")(spark, dir))
    val ooo = pairs(
      SparkEntry.queries("st_store_phash_ooo_replay")(spark, dir))
    assert(streamed == ooo)
    // batch pairs are (doc_a < doc_b, hamming); the old-new slice
    // re-oriented as (new, owner=old) is what the stream must match
    val batchOldNew = SparkEntry.queries("mm_phash_pairs")(spark, dir)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (a, b) =>
        (olds(a), olds(b)) match {
          case (true, false) => Some((b, a))
          case (false, true) => Some((a, b))
          case _             => None
        }
      }.toSet
    assert(streamed.nonEmpty,
      "fixture produced zero old-new phash matches: the agreement " +
        "assert would be vacuous")
    assert(streamed == batchOldNew,
      s"stream flagged ${streamed.size} pairs, batch old-new slice " +
        s"has ${batchOldNew.size}")
    streamed.foreach { case (d, o) =>
      assert(!olds(d) && olds(o),
        s"pair ($d, $o) does not cross the store's source split")
    }
  }
}

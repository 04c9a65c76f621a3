package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** The streaming decontamination gate (st_decontaminate_replay):
  * ingest documents screened at arrival against the SERVED eval-slice
  * signature store. Driver gates hash the pair stream against the
  * independent all-pairs corpus-vs-eval spec; this spec pins the
  * intra-engine invariants — disorder invariance, the eval-split
  * orientation of every flagged pair, and exact aggregation agreement
  * with dd_decontaminate (the stream's per-doc match counts must BE
  * the batch query's contaminated slice, so the online alarm and the
  * nightly batch report can never tell a different story).
  */
class StoreDecontaminateReplaySpec extends AnyFunSuite {

  private val spark = SparkSessionHelper.spark
  private val dir = "/root/testdata/sf0.001"

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("in-order and bounded-disorder replays emit the identical pair set") {
    val inOrder = pairs(
      SparkEntry.queries("st_decontaminate_replay")(spark, dir))
    val ooo = pairs(
      SparkEntry.queries("st_decontaminate_ooo_replay")(spark, dir))
    assert(inOrder == ooo)
  }

  test("the stream's flags aggregate to dd_decontaminate's " +
      "contaminated slice and every pair crosses the eval split") {
    val streamed = pairs(
      SparkEntry.queries("st_decontaminate_replay")(spark, dir))
    assert(streamed.nonEmpty,
      "fixture produced zero contamination: the agreement asserts " +
        "below would be vacuous")
    streamed.foreach { case (d, o) =>
      assert(d % 50 != 0 && o % 50 == 0,
        s"pair ($d, $o) does not cross the eval split")
    }
    val batch = SparkEntry.queries("dd_decontaminate")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // per-doc match counts equal the batch aggregation ...
    val counts = streamed.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    batch.foreach { case (docId, nMatches, contaminated) =>
      assert(counts.getOrElse(docId, 0L) == nMatches,
        s"doc $docId: stream saw ${counts.getOrElse(docId, 0L)} eval " +
          s"matches, batch says $nMatches")
      assert(contaminated == counts.contains(docId))
    }
    // ... and the batch report covers every streamed doc (the stream
    // fed exactly the batch query's corpus side)
    val reported = batch.map(_._1).toSet
    assert(counts.keySet.subsetOf(reported))
  }

  test("semantic: disorder-invariant, eval-split-oriented, and in " +
      "exact aggregation agreement with dd_decontaminate_semantic") {
    val inOrder = pairs(
      SparkEntry.queries("st_decontaminate_semantic_replay")(spark, dir))
    val ooo = pairs(SparkEntry.queries(
      "st_decontaminate_semantic_ooo_replay")(spark, dir))
    assert(inOrder == ooo)
    assert(inOrder.nonEmpty,
      "fixture produced zero semantic contamination: the agreement " +
        "asserts below would be vacuous")
    inOrder.foreach { case (v, o) =>
      assert(v % 50 != 0 && o % 50 == 0,
        s"pair ($v, $o) does not cross the eval split")
    }
    val batch = SparkEntry.queries("dd_decontaminate_semantic")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val counts = inOrder.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    batch.foreach { case (vecId, nMatches, contaminated) =>
      assert(counts.getOrElse(vecId, 0L) == nMatches,
        s"vec $vecId: stream saw ${counts.getOrElse(vecId, 0L)} eval " +
          s"matches, batch says $nMatches")
      assert(contaminated == counts.contains(vecId))
    }
    assert(counts.keySet.subsetOf(batch.map(_._1).toSet))
  }
}

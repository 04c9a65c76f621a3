package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Multimodal}
import graft.streaming.{StreamDoc, Streams}

/** Seeded RANDOM bounded-disorder sweeps for the served-store probe
  * streams — the property-level companion to the fixed-jitter
  * `st_store_*_ooo_replay` gates, the same way DisorderPropertySpec
  * backs the fMGWS machines' replay gates. These streams hold no
  * custom state (two stream-static joins around a watermark-TTL'd
  * per-pair dedup), so their disorder invariance is STRUCTURAL: a
  * pair's duplicate band hits carry one event time, and the verify is
  * order-free arithmetic against the immutable store. The sweeps
  * check exactly that claim — any delivery order bounded inside the
  * dedup delay must land on the batch pair query's old-new slice —
  * across random orders the fixed replay jitter cannot reach.
  */
class StoreStreamDisorderSpec extends AnyFunSuite {

  private val spark = SparkSessionHelper.spark
  private val dir = "/root/testdata/sf0.001"
  private val TickNs = 1000000000L

  private def newDocs(): IndexedSeq[StreamDoc] = {
    val s = spark
    import s.implicits._
    Engine.table(s, dir, "documents")
      .where(s"NOT (${Dedup.oldPred})")
      .selectExpr("doc_id",
        s"(row_number() OVER (ORDER BY doc_id)) * ${TickNs}L AS ts",
        "text")
      .as[StreamDoc].collect().sortBy(_.doc_id).toIndexedSeq
  }

  private def disordered(docs: Seq[StreamDoc], seed: Long,
                         slackNs: Long): IndexedSeq[StreamDoc] = {
    val rnd = new scala.util.Random(seed)
    docs.map(d => (d.ts + rnd.nextLong(slackNs), d.doc_id, d))
      .sortBy(t => (t._1, t._2)).map(_._3).toIndexedSeq
  }

  /** Batch pair query's old-new slice re-oriented as (new, old owner),
    * the reference every delivery order must land on.
    */
  private def oldNewSlice(key: String, a: String, b: String)
      : Set[(Long, Long)] = {
    val olds = Engine.table(spark, dir, "documents")
      .where(Dedup.oldPred).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    SparkEntry.queries(key)(spark, dir)
      .select(a, b)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (x, y) =>
        (olds(x), olds(y)) match {
          case (true, false) => Some((y, x))
          case (false, true) => Some((x, y))
          case _             => None
        }
      }.toSet
  }

  private def sweep(name: String, reference: Set[(Long, Long)])
                   (mk: org.apache.spark.sql.DataFrame
                     => org.apache.spark.sql.DataFrame): Unit = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    assert(reference.nonEmpty,
      s"$name: fixture produced zero old-new matches — sweep is vacuous")
    val docs = newDocs()
    (1L to 3L).foreach { seed =>
      // jitter up to 64 ticks = 64 s, strictly inside the 10-min delay
      val order = disordered(docs, seed * 7919L, 64L * TickNs)
      val in = MemoryStream[StreamDoc]
      val sink = s"${name}_sweep_$seed"
      val q = mk(in.toDF())
        .writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Append()).start()
      val got =
        try {
          order.grouped(60).foreach { b =>
            in.addData(b); q.processAllAvailable()
          }
          s.table(sink).select("doc_id", "owner_id")
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        } finally q.stop()
      s.catalog.dropTempView(sink)
      assert(got == reference,
        s"$name seed $seed: ${got.size} pairs vs reference " +
          s"${reference.size}")
    }
  }

  test("storePhashStream lands on the batch old-new Hamming slice " +
      "under random bounded disorder (3 seeds)") {
    val store = Multimodal.ensurePhashStore(spark, dir)
    sweep("store_phash",
      oldNewSlice("mm_phash_pairs", "doc_a", "doc_b"))(
      Streams.storePhashStream(_, store))
  }

  test("storeNearDupStream lands on the batch old-new Jaccard slice " +
      "under random bounded disorder (3 seeds)") {
    val store = Dedup.ensureClusterStore(spark, dir)
    sweep("store_neardup",
      oldNewSlice("dd_jaccard", "doc_a", "doc_b"))(
      Streams.storeNearDupStream(_, store))
  }

  test("storeDedupStream lands on the banded old-new cosine slice " +
      "under random bounded disorder (3 seeds)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val store = Dedup.ensureEmbedStore(spark, dir)
    val split = Dedup.embedSplit(spark, dir)
    // reference: the banded pair query's old-new slice (the store
    // probe is banded, so banded — not all-pairs — is the contract)
    val reference = SparkEntry.queries("dd_embed_cosine_lsh")(spark, dir)
      .select("vec_a", "vec_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (a, b) =>
        (a < split, b < split) match {
          case (true, false) => Some((b, a))
          case (false, true) => Some((a, b))
          case _             => None
        }
      }.toSet
    assert(reference.nonEmpty, "zero old-new embed matches — vacuous")
    val vecs = Engine.table(spark, dir, "embeddings")
      .where(s"vec_id >= $split")
      .selectExpr("vec_id",
        s"(vec_id - $split + 1) * ${TickNs}L AS ts", "embedding")
      .as[graft.streaming.StreamVec]
      .collect().sortBy(_.vec_id).toIndexedSeq
    (1L to 3L).foreach { seed =>
      val rnd = new scala.util.Random(seed * 6271L)
      val order = vecs
        .map(v => (v.ts + rnd.nextLong(64L * TickNs), v.vec_id, v))
        .sortBy(t => (t._1, t._2)).map(_._3)
      val in = MemoryStream[graft.streaming.StreamVec]
      val sink = s"store_dedup_sweep_$seed"
      val q = Streams.storeDedupStream(in.toDF(), store)
        .writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Append()).start()
      val got =
        try {
          order.grouped(60).foreach { b =>
            in.addData(b); q.processAllAvailable()
          }
          s.table(sink).select("vec_id", "owner_id")
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        } finally q.stop()
      s.catalog.dropTempView(sink)
      assert(got == reference,
        s"store_dedup seed $seed: ${got.size} pairs vs reference " +
          s"${reference.size}")
    }
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.Engine._
import graft.QueryPack
import graft.operators.Dedup

/** Oracle gate for the Structured Streaming surface: replay the
  * `documents` fixture through [[Streams.nearDupStream]] as a real
  * multi-batch stream and hash-compare the emitted matches against an
  * independent DuckDB restatement of the operator's semantics.
  *
  * Replay protocol: documents enter in doc_id order at one tick
  * (1 s of event time) per doc_id, split into [[ReplayBatches]]
  * micro-batches with explicit boundaries (`processAllAvailable` per
  * batch), so the run exercises cross-batch state carry, watermark
  * advancement, and the event-time timeout path — not just one big
  * batch. The operator's gap-based owner eviction makes the match set
  * a pure function of event-time order (see nearDupStream's scaladoc),
  * which is what the oracle restates as gaps-and-islands SQL: break a
  * band bucket's timeline wherever consecutive activity is more than
  * [[HorizonTicks]] apart; every document in an island matches the
  * island's first document, one row per colliding band. The horizon is
  * deliberately SMALLER than the fixture's median collision gap so the
  * replay exercises both outcomes: close collisions match, stale
  * buckets evict and re-own.
  */
object StreamReplay extends QueryPack {

  /** Event-time per doc_id step: 1 second. */
  private[graft] val TickNs = 1000000000L
  /** Owner liveness horizon in ticks (= seconds of event time). The
    * sf0.01 fixture's band-collision doc_id gaps span 1..400+ with a
    * median of ~154, so 128 ticks yields a healthy mix of matches and
    * evictions.
    */
  private[graft] val HorizonTicks = 128L
  private[graft] val HorizonNs = HorizonTicks * TickNs
  /** Number of micro-batches the corpus is split into. */
  private[graft] val ReplayBatches = 5

  private val sinkSeq = new java.util.concurrent.atomic.AtomicInteger

  private def stNearDupReplay(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    // Fixture-scale replay harness: the corpus is collected to the
    // driver ONLY to feed MemoryStream with explicit batch boundaries.
    // This query verifies the streaming operator; the production ingest
    // path is readStream -> nearDupStream with no driver hop.
    // ts starts at ONE tick, not zero: an epoch-0 event time sits
    // exactly on the initial watermark and the stateful operator's
    // late-row predicate can drop it
    val docs = table(s, dir, "documents")
      .selectExpr("doc_id", s"(doc_id + 1) * ${TickNs}L AS ts", "text")
      .as[StreamDoc].collect().sortBy(_.doc_id)
    val in = MemoryStream[StreamDoc]
    val sink = s"st_neardup_replay_sink_${sinkSeq.incrementAndGet()}"
    val q = Streams.nearDupStream(in.toDF(), HorizonNs)
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      val per = math.max(1, (docs.length + ReplayBatches - 1) / ReplayBatches)
      docs.grouped(per).foreach { b =>
        in.addData(b.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    s.table(sink)
      .selectExpr("doc_id", "owner_id", "cast(band as bigint) AS band")
      .orderBy("doc_id", "owner_id", "band")
  }

  // The eviction semantics, restated: per (band, bucket), order the
  // documents by event time, break the timeline where the gap between
  // consecutive documents exceeds the horizon (the stream refreshes a
  // bucket's `last_ns` on every row, so liveness is consecutive-gap,
  // not distance-to-owner), then match every non-head document of an
  // island to the island head.
  private val stNearDupReplaySql =
    s"""WITH ${Dedup.duckBandRowsSql},
       |w AS (
       |  SELECT band, bk, doc_id,
       |    CASE WHEN (doc_id - lag(doc_id) OVER
       |           (PARTITION BY band, bk ORDER BY doc_id)) * $TickNs
       |         > $HorizonNs THEN 1 ELSE 0 END AS brk
       |  FROM nd_bands),
       |isl AS (
       |  SELECT band, bk, doc_id,
       |    SUM(brk) OVER (PARTITION BY band, bk ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
       |  FROM w)
       |SELECT doc_id, owner_id, CAST(band AS BIGINT) AS band FROM (
       |  SELECT doc_id, band,
       |    MIN(doc_id) OVER (PARTITION BY band, bk, grp) AS owner_id
       |  FROM isl)
       |WHERE doc_id <> owner_id
       |ORDER BY doc_id, owner_id, band""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("st_neardup_replay" -> (stNearDupReplay _))

  override val oracles: Map[String, String] =
    Map("st_neardup_replay" -> stNearDupReplaySql)
}

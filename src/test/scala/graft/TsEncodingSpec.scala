package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Guards the events `ts` read boundary against fixture re-encodings.
  *
  * The driver's testdata generator has shipped `events.ts` in two
  * physical parquet encodings across rounds: TIMESTAMP(NANOS) (surfaced
  * as bigint epoch-nanos by `nanosAsLong`) and timestamp[us]
  * (TIMESTAMP_NTZ). Round 12 lost 17 queries to the switch. This spec
  * writes the SAME rows under both encodings and asserts representative
  * event queries return identical results on both, so a future
  * regeneration is a no-op instead of an outage.
  */
class TsEncodingSpec extends AnyFunSuite {

  private val spark = SparkSessionHelper.spark
  private val sfDir = "/root/testdata/sf0.001"

  // one fixture, two physical encodings of the same instants
  private lazy val (longDir, tsDir): (String, String) = {
    val base = Engine.table(spark, sfDir, "events")
    val a = Files.createTempDirectory("graft_ts_long").toString
    val b = Files.createTempDirectory("graft_ts_micros").toString
    // A: bigint epoch-nanos column, as nanosAsLong used to surface it
    base.write.mode("overwrite").parquet(s"$a/events.parquet")
    // B: timestamp[us] / isAdjustedToUTC=false — what pandas writes now.
    // UTC session tz makes the micros identical to ts div 1000.
    base.selectExpr("event_id",
        "cast(timestamp_micros(ts div 1000) as timestamp_ntz) AS ts",
        "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$b/events.parquet")
    (a, b)
  }

  private def collected(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("normalizeTs surfaces bigint epoch-nanos from both encodings") {
    val fromLong = Engine.table(spark, longDir, "events")
    val fromTs = Engine.table(spark, tsDir, "events")
    assert(fromLong.schema("ts").dataType.typeName == "long")
    assert(fromTs.schema("ts").dataType.typeName == "long")
    assert(collected(fromLong.select("event_id", "ts")) ==
      collected(fromTs.select("event_id", "ts")))
  }

  test("event queries agree across both ts encodings") {
    val checks = Seq(
      "st_tumbling_1h" -> graft.operators.EventWindows.queries("st_tumbling_1h"),
      "st_retention" -> graft.operators.EventWindows.queries("st_retention"),
      "q18_sessionize" -> graft.operators.Relational.queries("q18_sessionize"),
      "q26_asof_join" -> graft.operators.Relational.queries("q26_asof_join"))
    checks.foreach { case (name, q) =>
      val a = collected(q(spark, longDir))
      val b = collected(q(spark, tsDir))
      assert(a.nonEmpty, s"$name returned no rows")
      assert(a == b, s"$name differs between ts encodings")
    }
  }

  test("streaming file source normalizes both encodings") {
    import org.apache.spark.sql.streaming.OutputMode
    // sinks named by encoding label, not dir.hashCode — hash collisions
    // (or Int.MinValue.abs) would silently alias the two tables
    Seq("long" -> longDir, "micros" -> tsDir).foreach { case (label, dir) =>
      val sink = s"ts_enc_$label"
      val q = graft.streaming.Streams
        .tumblingCounts(graft.streaming.Streams
          .eventFileStream(spark, s"$dir/events.parquet"))
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode(OutputMode.Update()).start()
      try {
        q.processAllAvailable()
        val total = spark.table(sink)
          .selectExpr("sum(n)").collect()(0).getLong(0)
        assert(total == Engine.table(spark, sfDir, "events").count())
      } finally q.stop()
    }
  }
}

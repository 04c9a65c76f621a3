package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Engine._
import graft.QueryPack

/** Event-time windowing over the `events` table — the batch analogs of
  * the Structured Streaming operators in [[graft.streaming.Streams]]
  * (tumbling / hopping windows; the session analog is q18_sessionize).
  * `ts` is bigint epoch-nanos, so window assignment is exact integer
  * floor division in both engines — no timestamp-library semantics in
  * the correctness path at all.
  *
  * Scale: each is one partial+final hash aggregation keyed by
  * (window, type) — the hopping variant fans each event into
  * window/slide = 2 rows before aggregating (standard hop expansion).
  */
object EventWindows extends QueryPack {

  private val HourNs = 3600000000000L
  private val HalfHourNs = 1800000000000L

  // -- st_tumbling_1h: 1-hour tumbling window counts --------------------------
  private def stTumbling(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "events")
      .groupBy(expr(s"ts div $HourNs").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), sumM(col("value")).as("total_value"))
      .withColumn("win_start_ns", col("win") * lit(HourNs))
      .select(col("win_start_ns"), col("event_type"), col("n"),
        col("total_value"))
      .orderBy(col("win_start_ns"), col("event_type"))

  private val stTumblingSql =
    s"""SELECT win * $HourNs AS win_start_ns, event_type, COUNT(*) AS n,
       |  ${sumMs("value")} AS total_value
       |FROM (SELECT epoch_ns(ts) // $HourNs AS win, event_type, value
       |      FROM events)
       |GROUP BY win, event_type ORDER BY win_start_ns, event_type""".stripMargin

  // -- st_hopping_1h_30m: 1-hour windows hopping every 30 minutes -------------
  // Each event lands in exactly 2 windows: starts floor(ts/slide)*slide
  // and (floor-1)*slide; non-negative start guard for the first events.
  private def stHopping(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "events")
      .selectExpr("event_type",
        s"explode(array(ts div $HalfHourNs, ts div $HalfHourNs - 1))" +
          " AS win")
      .filter(col("win") >= 0)
      .groupBy(col("win"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("win_start_ns", col("win") * lit(HalfHourNs))
      .select(col("win_start_ns"), col("event_type"), col("n"))
      .orderBy(col("win_start_ns"), col("event_type"))

  private val stHoppingSql =
    s"""SELECT win * $HalfHourNs AS win_start_ns, event_type, COUNT(*) AS n
       |FROM (
       |  SELECT event_type, unnest([epoch_ns(ts) // $HalfHourNs,
       |                             epoch_ns(ts) // $HalfHourNs - 1]) AS win
       |  FROM events)
       |WHERE win >= 0
       |GROUP BY win, event_type ORDER BY win_start_ns, event_type""".stripMargin

  // -- st_user_activity: per-user event-time span + rate ----------------------
  // The batch shape of streaming per-key state: one row of running state
  // per user (first/last seen, counts) — what mapGroupsWithState holds.
  // Micros, not nanos: DuckDB's parquet reader truncates TIMESTAMP(NANOS)
  // to microsecond TIMESTAMP, so exact extrema must be compared at micro
  // granularity (`ts div 1000` == epoch_us, both floor positive values).
  private def stUserActivity(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(expr("ts div 1000")).as("first_us"),
        max(expr("ts div 1000")).as("last_us"),
        countDistinct(col("event_type")).as("n_types"))
      .withColumn("span_us", col("last_us") - col("first_us"))
      .orderBy(col("user_id"))

  private val stUserActivitySql =
    """SELECT user_id, COUNT(*) AS n_events,
      |  MIN(epoch_us(ts)) AS first_us, MAX(epoch_us(ts)) AS last_us,
      |  COUNT(DISTINCT event_type) AS n_types,
      |  MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS span_us
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // -- st_anomaly_hours: integer-exact hourly-count outliers ------------------
  // Monitoring's z-score rule (|cnt - mean| > 2*stddev over each type's
  // hourly counts) restated so NO floating point enters the pipeline:
  // with n hours, S = Σcnt and varnum = n*Σcnt² - S² (= n²·variance),
  // the rule |cnt - S/n| > 2·sqrt(varnum)/n squares to the pure-integer
  // inequality (n·cnt - S)² > 4·varnum. The squared terms grow
  // quadratically in volume (cnt² and S² overflow int64 near 3e9 events
  // per type/hour), so every squaring — including the Σcnt² partial —
  // runs in 128-bit exact integers — Spark
  // DECIMAL(38,0) (bigint→decimal is exact; products stay < 1e38) and
  // DuckDB HUGEINT — and only int64 values are output. Two exact hash
  // aggregations and one broadcast-sized join back onto the hourly
  // counts.
  private def stAnomalyHours(s: SparkSession, dir: String): DataFrame = {
    table(s, dir, "events").createOrReplaceTempView("an_events")
    s.sql(
      s"""WITH hc AS (
         |  SELECT event_type, ts div $HourNs AS win, COUNT(*) AS cnt
         |  FROM an_events GROUP BY event_type, ts div $HourNs),
         |st AS (
         |  SELECT event_type, COUNT(*) AS n, SUM(cnt) AS s,
         |    SUM(cast(cnt as decimal(38, 0)) * cnt) AS s2
         |  FROM hc GROUP BY event_type),
         |wide AS (
         |  SELECT hc.event_type, hc.win, hc.cnt,
         |    cast(st.n as decimal(38, 0)) * hc.cnt - st.s AS dev,
         |    cast(st.n as decimal(38, 0)) * st.s2
         |      - cast(st.s as decimal(38, 0)) * st.s AS varnum
         |  FROM hc JOIN st ON hc.event_type = st.event_type)
         |SELECT event_type, win * $HourNs AS win_start_ns, cnt
         |FROM wide
         |WHERE dev * dev > 4 * varnum
         |ORDER BY event_type, win_start_ns""".stripMargin)
  }

  private val stAnomalyHoursSql =
    s"""WITH hc AS (
       |  SELECT event_type, epoch_ns(ts) // $HourNs AS win,
       |    CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM events GROUP BY event_type, epoch_ns(ts) // $HourNs),
       |st AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(cnt) AS BIGINT) AS s,
       |    SUM(CAST(cnt AS HUGEINT) * cnt) AS s2
       |  FROM hc GROUP BY event_type),
       |wide AS (
       |  SELECT hc.event_type, hc.win, hc.cnt,
       |    CAST(st.n AS HUGEINT) * hc.cnt - st.s AS dev,
       |    CAST(st.n AS HUGEINT) * st.s2
       |      - CAST(st.s AS HUGEINT) * st.s AS varnum
       |  FROM hc JOIN st ON hc.event_type = st.event_type)
       |SELECT event_type, win * $HourNs AS win_start_ns, cnt
       |FROM wide
       |WHERE dev * dev > 4 * varnum
       |ORDER BY event_type, win_start_ns""".stripMargin

  // -- st_funnel: ordered multi-step conversion funnel ------------------------
  // The product-analytics primitive: per user, the first 'view', the
  // first 'click' strictly after it, the first 'purchase' strictly
  // after that — reported as per-step user counts. Timestamps compare
  // at MICROSECOND granularity (ts div 1000 == epoch_us; DuckDB's
  // parquet reader truncates TIMESTAMP(NANOS) to micros, so nano
  // comparisons would diverge on sub-microsecond orderings).
  // Scale shape: all three aggregations and both joins key on user_id,
  // so one hash partitioning is reused end to end (co-partitioned
  // joins, no extra exchange); at 100 TB pre-bucket events by user_id
  // and the whole funnel is shuffle-free.
  private def stFunnel(s: SparkSession, dir: String): DataFrame = {
    table(s, dir, "events").createOrReplaceTempView("fn_events")
    s.sql(
      """WITH v AS (
        |  SELECT user_id, MIN(ts div 1000) AS t1 FROM fn_events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, MIN(e.ts div 1000) AS t2
        |  FROM fn_events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts div 1000 > v.t1
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, MIN(e.ts div 1000) AS t3
        |  FROM fn_events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts div 1000 > c.t2
        |  GROUP BY e.user_id)
        |SELECT step, n_users FROM (
        |  SELECT 'step1_view' AS step, COUNT(*) AS n_users FROM v
        |  UNION ALL
        |  SELECT 'step2_click' AS step, COUNT(*) AS n_users FROM c
        |  UNION ALL
        |  SELECT 'step3_purchase' AS step, COUNT(*) AS n_users FROM p)
        |ORDER BY step""".stripMargin)
  }

  private val stFunnelSql =
    """WITH v AS (
      |  SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t1
      |  GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t2
      |  GROUP BY e.user_id)
      |SELECT step, n_users FROM (
      |  SELECT 'step1_view' AS step, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
      |  UNION ALL
      |  SELECT 'step2_click' AS step, CAST(COUNT(*) AS BIGINT) AS n_users FROM c
      |  UNION ALL
      |  SELECT 'step3_purchase' AS step, CAST(COUNT(*) AS BIGINT) AS n_users
      |  FROM p)
      |ORDER BY step""".stripMargin

  // -- st_retention: day-N cohort retention ----------------------------------
  // The other product-analytics staple: users cohorted by their first
  // active day, retention = how many are active again k days later
  // (k <= 7 here). Exact integer day arithmetic: ts div 1 day in nanos
  // — micro-truncation cannot move a timestamp across a midnight
  // boundary (it lowers by < 1 us and midnights are whole microseconds),
  // so nano- and micro-granularity day numbers agree. Scale shape: one
  // distinct on (user, day) — one shuffle — then the cohort aggregate
  // and the activity join are both keyed on user_id (co-partitioned);
  // output is cohort x offset, tiny at any corpus size.
  private val DayNs = 86400000000000L

  private def stRetention(s: SparkSession, dir: String): DataFrame = {
    table(s, dir, "events").createOrReplaceTempView("rt_events")
    s.sql(
      s"""WITH ud AS (
         |  SELECT DISTINCT user_id, ts div $DayNs AS day FROM rt_events),
         |coh AS (
         |  SELECT user_id, MIN(day) AS cohort_day FROM ud GROUP BY user_id)
         |SELECT c.cohort_day, ud.day - c.cohort_day AS day_offset,
         |  COUNT(*) AS n_users
         |FROM ud JOIN coh c ON ud.user_id = c.user_id
         |WHERE ud.day - c.cohort_day <= 7
         |GROUP BY c.cohort_day, ud.day - c.cohort_day
         |ORDER BY cohort_day, day_offset""".stripMargin)
  }

  private val stRetentionSql =
    s"""WITH ud AS (
       |  SELECT DISTINCT user_id, epoch_ns(ts) // $DayNs AS day FROM events),
       |coh AS (
       |  SELECT user_id, MIN(day) AS cohort_day FROM ud GROUP BY user_id)
       |SELECT c.cohort_day, ud.day - c.cohort_day AS day_offset,
       |  CAST(COUNT(*) AS BIGINT) AS n_users
       |FROM ud JOIN coh c ON ud.user_id = c.user_id
       |WHERE ud.day - c.cohort_day <= 7
       |GROUP BY c.cohort_day, ud.day - c.cohort_day
       |ORDER BY cohort_day, day_offset""".stripMargin

  // -- st_out_of_order: event-time disorder audit -----------------------------
  // The audit run before choosing a streaming watermark: how disordered
  // is each user's stream? Arrival order is event_id (the source's
  // append sequence); event time is ts. Per user: events whose event
  // time runs BACKWARD vs the previous arrival, and the worst backward
  // skew in micros — max_skew_us is exactly the watermark delay that
  // would have captured every late event for that user. One window
  // partitioned by user ordered by arrival, then one aggregate; both
  // integer-exact. The corpus-level quantile over max_skew_us is what
  // sets `withWatermark` (streaming/Streams.scala uses 30 min).
  private def stOutOfOrder(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    table(s, dir, "events")
      .selectExpr("user_id", "event_id", "ts div 1000 AS us")
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .selectExpr("user_id",
        "CASE WHEN prev_us IS NOT NULL AND us < prev_us THEN 1L ELSE 0L END"
          + " AS ooo",
        "CASE WHEN prev_us IS NOT NULL AND us < prev_us THEN prev_us - us"
          + " ELSE 0L END AS skew_us")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("ooo")).as("n_ooo"),
        max(col("skew_us")).as("max_skew_us"))
      .orderBy(col("user_id"))
  }

  private val stOutOfOrderSql =
    """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(ooo) AS BIGINT) AS n_ooo,
      |  MAX(skew_us) AS max_skew_us
      |FROM (
      |  SELECT user_id,
      |    CASE WHEN prev_us IS NOT NULL AND us < prev_us
      |         THEN 1 ELSE 0 END AS ooo,
      |    CASE WHEN prev_us IS NOT NULL AND us < prev_us
      |         THEN prev_us - us ELSE 0 END AS skew_us
      |  FROM (
      |    SELECT user_id, epoch_us(ts) AS us,
      |      lag(epoch_us(ts)) OVER (PARTITION BY user_id
      |        ORDER BY event_id) AS prev_us
      |    FROM events))
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(
      "st_retention" -> stRetention _,
      "st_funnel" -> stFunnel _,
      "st_anomaly_hours" -> stAnomalyHours _,
      "st_tumbling_1h" -> stTumbling _,
      "st_hopping_1h_30m" -> stHopping _,
      "st_user_activity" -> stUserActivity _,
      "st_out_of_order" -> stOutOfOrder _
    )

  override val oracles: Map[String, String] = Map(
    "st_retention" -> stRetentionSql,
    "st_funnel" -> stFunnelSql,
    "st_anomaly_hours" -> stAnomalyHoursSql,
    "st_tumbling_1h" -> stTumblingSql,
    "st_hopping_1h_30m" -> stHoppingSql,
    "st_user_activity" -> stUserActivitySql,
    "st_out_of_order" -> stOutOfOrderSql
  )
}

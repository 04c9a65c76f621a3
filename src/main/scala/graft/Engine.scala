package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Session factory + shared helpers for the graft engine.
  *
  * Tuned for the harness's `local[32]` single-JVM mode but written for a
  * real cluster: AQE on (runtime re-plan, skew-join splitting, partition
  * coalescing), shuffle partitions sized to the active parallelism instead
  * of Spark's default 200, and broadcast joins left to Catalyst's
  * statistics with explicit `broadcast()` hints where we know a side is a
  * dimension table.
  */
object Engine {

  def session(appName: String = "graft",
              cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      : SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Read one of the driver-generated tables (TESTDATA.md). */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  // ---------------------------------------------------------------------
  // Cross-engine-deterministic numerics.
  //
  // The driver's correctness gate hash-compares our result values against
  // DuckDB running the oracle SQL on the same parquet files. Raw
  // floating-point aggregation is NOT reproducible across engines (the
  // summation order differs), so every money/measure aggregate follows one
  // discipline, mirrored exactly in the oracle SQL:
  //
  //   1. compute the per-row measure in DOUBLE (IEEE ops on identical
  //      operands are bit-identical in any engine),
  //   2. CAST it to DECIMAL(18,4) (one deterministic rounding),
  //   3. SUM the decimals (exact, order-independent),
  //   4. present as CAST(CAST(sum AS DECIMAL(38,2)) AS DOUBLE)
  //      (scaled value < 2^53 so decimal->double is exact in both engines).
  // ---------------------------------------------------------------------

  /** Step 2: per-row measure -> exact decimal. */
  def m4(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Step 4: decimal aggregate -> presentation double. */
  def d2(c: Column): Column = c.cast(DecimalType(38, 2)).cast(DoubleType)

  /** SQL mirror of [[m4]]. */
  def m4s(e: String): String = s"CAST($e AS DECIMAL(18,4))"

  /** SQL mirror of [[d2]]. */
  def d2s(e: String): String = s"CAST(CAST($e AS DECIMAL(38,2)) AS DOUBLE)"

  /** sum(m4(expr)) presented via d2 — the standard money aggregate. */
  def sumM(c: Column): Column = d2(sum(m4(c)))
  def sumMs(e: String): String = d2s(s"SUM(${m4s(e)})")
}

/** A named group of queries plus their DuckDB oracle SQL. Each operator
  * pack contributes one; [[SparkEntry]] is the union.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]

  /** DuckDB-runnable ANSI SQL per query key; keys absent here get the
    * driver's weaker rows-only check (non-SQL-expressible operators).
    */
  def oracles: Map[String, String]
}

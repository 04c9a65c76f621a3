package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partitioned storage layout + partition pruning — the other half of the
  * storage story next to BucketedJoinSpec. At 100 TB an events table is
  * written `partitionBy(day)`; a day-scoped query must then read ONLY the
  * matching directories — pruning happens in the file index, before any
  * I/O, so a one-day query over a 10-year corpus touches ~0.03% of the
  * files. Asserted on the physical plan (the scan carries the day value
  * as a partition filter) and on the actual file set the scan selected.
  */
class PartitionPruningSpec extends AnyFunSuite {

  test("day-partitioned events scan prunes to the filtered day") {
    val spark = SparkSessionHelper.spark
    val out = Files.createTempDirectory("graft_part_events").toString

    // events.ts normalizes to bigint epoch-nanos at the read boundary
    // (Engine.table); derive the day once at write time — the 100 TB
    // layout writes the partition column, it never recomputes it at
    // read time.
    val events = Engine
      .table(spark, "/root/testdata/sf0.001", "events")
      .withColumn("day", expr("cast(ts div 86400000000000 as bigint)"))
    events.write.mode("overwrite").partitionBy("day").parquet(out)

    val days = events.select("day").distinct().count()
    assert(days > 1, s"fixture must span multiple days, got $days")

    val oneDay = events.select("day").orderBy("day").limit(1)
      .collect().head.getLong(0)
    val pruned = spark.read.parquet(out).filter(col("day") === oneDay)

    // 1. plan: the predicate lands in the scan's PartitionFilters, not in
    //    a post-scan Filter (which would mean every file was read)
    val plan = pruned.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[(.*?)\\]".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    assert(pf.contains("day"), s"no partition filter in scan:\n${plan.take(2000)}")
    // 2. file index: only the one day's directory is selected
    val scannedFiles = pruned.queryExecution.executedPlan.collectLeaves()
      .collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.totalNumberOfFiles
      }.sum
    val allFiles = spark.read.parquet(out).queryExecution.executedPlan
      .collectLeaves()
      .collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.totalNumberOfFiles
      }.sum
    assert(scannedFiles > 0 && scannedFiles < allFiles,
      s"pruning read $scannedFiles of $allFiles files")

    // 3. semantics: identical rows to the unpartitioned filter
    val expected = events.filter(col("day") === oneDay).count()
    assert(pruned.count() == expected)
  }
}

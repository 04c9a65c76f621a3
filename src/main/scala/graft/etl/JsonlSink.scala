package graft.etl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.Dataset

import JiraTransform.SourcedRecord

/** Corpus sinks.
  *
  * Two modes:
  *
  *  - [[writeCorpus]]: the scale path — records as JSONL text partitioned
  *    by project, parallel writers, no global sort (order is (file, pos)
  *    within each task). This is what a 100 TB corpus uses.
  *  - [[writeGoldenJsonl]]: the parity path — ONE file per project named
  *    `{PROJ}_issues.jsonl`, records globally ordered by (lexicographic
  *    source file name, in-page position), serialized byte-identically to
  *    CPython `json.dumps` (see [[PyJson]]). Mirrors the reference's
  *    single-threaded writer (`transformer.py:347-397`) for golden diffs.
  *    The global sort-to-one-partition is inherently serial — keep it for
  *    fixture-scale data only.
  */
object JsonlSink {

  /** Scalable partitioned JSONL corpus writer. */
  def writeCorpus(records: Dataset[SourcedRecord], outDir: String): Unit = {
    import records.sparkSession.implicits._
    records
      .map(r => (r.project, PyJson.serialize(r.record)))
      .toDF("project", "value")
      .write
      .partitionBy("project")
      .mode("overwrite")
      .text(outDir)
  }

  /** Golden-parity writer: `{outDir}/{PROJ}_issues.jsonl`, reference record
    * order and byte format. Driver-side file assembly (fixture scale).
    */
  def writeGoldenJsonl(records: Dataset[SourcedRecord],
                       outDir: String): Map[String, Long] = {
    import records.sparkSession.implicits._
    Files.createDirectories(Paths.get(outDir))
    val rows = records
      .map(r => (r.project, r.file, r.pos, PyJson.serialize(r.record)))
      .toDF("project", "file", "pos", "line")
      .orderBy("project", "file", "pos")
      .select("project", "line")
      .as[(String, String)]
      .collect()
    rows.groupBy(_._1).map { case (project, lines) =>
      val path = Paths.get(outDir, s"${project}_issues.jsonl")
      val body = lines.map(_._2).mkString("", "\n", "\n")
      Files.write(path, body.getBytes(StandardCharsets.UTF_8))
      project -> lines.length.toLong
    }
  }
}

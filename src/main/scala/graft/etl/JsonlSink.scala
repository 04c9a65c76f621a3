package graft.etl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

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

  /** JSONL reader (`utils.py:96-120` S8): distributed, blank lines are
    * skipped natively by the JSON source.
    */
  def readJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** Append one serialized record (`utils.py:72-94` S9 — the reference's
    * driver-side incremental sink; the distributed analog is
    * `df.write.mode("append").json(dir)`).
    */
  def appendJsonl(path: Path, jsonLine: String): Boolean =
    try {
      Option(path.getParent).foreach(Files.createDirectories(_))
      Files.writeString(path, jsonLine + "\n", StandardOpenOption.CREATE,
        StandardOpenOption.APPEND)
      true
    } catch { case _: Exception => false }

  /** MD5 of a file streamed in 4 KB chunks (`utils.py:122-147` S12). */
  def fileMd5(path: Path): String = {
    val md = MessageDigest.getInstance("MD5")
    val in = Files.newInputStream(path)
    try {
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n > 0) { md.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    md.digest().map("%02x".format(_)).mkString
  }
}

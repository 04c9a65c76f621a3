package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 "graft-shards" format — the WRITE side of the corpus
  * story (the read side is the "jira" provider + parquet): training
  * shards as JSONL files with a DETERMINISTIC, rerun-stable layout.
  *
  * The reference writes its corpus as one driver-side JSONL file
  * (`utils.py` / `transformer.py` save path — mirrored at fixture scale
  * by [[graft.etl.JsonlSink]]); at 100 TB the corpus must land as N
  * shard files written BY THE EXECUTORS, and a rerun must produce
  * byte-identical shards so downstream training jobs can cache/resume.
  *
  * Contract: input rows are `(shard bigint, pos bigint, line string)` —
  * produced by [[CorpusShards.layout]], which reuses txt_shuffle_shard's
  * md5 arithmetic (TextAnalysis.scala) — hash-partitioned on `shard` and
  * sorted by `(shard, pos)` within partitions, so every shard is owned
  * by exactly one task and arrives in final order. Each task streams its
  * shards to temp files and reports them in its commit message; the
  * DRIVER makes the result visible atomically-per-file via rename in
  * `commit` (the v1-output-committer discipline: task temp -> job
  * rename, no data visible on abort). A `_SHARDS.json` manifest records
  * the file list and row counts.
  *
  * Local-filesystem I/O (java.nio) matches the harness; a cluster
  * deployment swaps in the Hadoop FileSystem API at the four marked
  * call sites without touching the commit protocol.
  */
class ShardSinkProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-shards"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ShardSink.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new ShardTable(properties.asScala.toMap)
}

object ShardSink {
  val schema: StructType = StructType(Seq(
    StructField("shard", LongType, nullable = false),
    StructField("pos", LongType, nullable = false),
    StructField("line", StringType, nullable = false)))

  def shardFileName(shard: Long): String = f"shard-$shard%05d.jsonl"
}

private[sources] class ShardTable(props: Map[String, String])
    extends Table with SupportsWrite {
  override def name(): String = s"graft-shards(${props.getOrElse("path", "?")})"
  override def schema(): StructType = ShardSink.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val dir = Option(info.options.get("path"))
      .getOrElse(props.getOrElse("path",
        throw new IllegalArgumentException("graft-shards needs a path")))
    val in = info.schema()
    require(in.length == 3 &&
      in(0).dataType == LongType && in(1).dataType == LongType &&
      in(2).dataType == StringType,
      s"graft-shards expects (shard bigint, pos bigint, line string), " +
        s"got ${in.simpleString}")
    new ShardWriteBuilder(dir)
  }
}

private[sources] class ShardWriteBuilder(dir: String)
    extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new ShardBatchWrite(dir, truncateFirst)
    override def toStreaming: streaming.StreamingWrite =
      new ShardStreamingWrite(dir)
  }
}

/** Streaming face of the sink: each epoch's rows land as
  * `shard-SSSSS-epoch-E.jsonl` files, renamed into place atomically at
  * epoch commit (exactly-once per epoch under Structured Streaming's
  * epoch retry: a replayed epoch overwrites its own files). Within an
  * epoch rows are NOT globally ordered (streams cannot sort), so the
  * writer keeps one open file per shard it encounters; the
  * batch-path determinism contract (byte-stable layout) applies to the
  * BATCH writer — the stream's guarantee is per-epoch atomicity plus
  * hash-stable shard routing.
  */
private[sources] class ShardStreamingWrite(dir: String)
    extends streaming.StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): streaming.StreamingDataWriterFactory =
    ShardStreamingWriterFactory(dir)

  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    messages.collect { case ShardFilesMessage(files) => files }.flatten
      .foreach { case (tmp, fin, _) =>
        Files.move(Paths.get(tmp), d.resolve(fin), // [FS seam]
          StandardCopyOption.REPLACE_EXISTING)
      }
  }

  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case ShardFilesMessage(files) => files }.flatten
      .foreach { case (tmp, _, _) =>
        Files.deleteIfExists(Paths.get(tmp)) // [FS seam]
      }
}

/** One finished temp file: (tempPath, finalName, rows). */
private[sources] case class ShardFilesMessage(
    files: Seq[(String, String, Long)]) extends WriterCommitMessage

private[sources] class ShardBatchWrite(dir: String, truncateFirst: Boolean)
    extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new ShardWriterFactory(dir)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    if (truncateFirst) {
      // Overwrite semantics: clear previous shard files + manifest
      Files.list(d).iterator().asScala
        .filter { p =>
          val n = p.getFileName.toString
          n.startsWith("shard-") || n == "_SHARDS.json"
        }
        .foreach(Files.delete) // [FS seam]
    }
    val all = messages.collect {
      case ShardFilesMessage(files) => files
    }.flatten.sortBy(_._2)
    all.foreach { case (tmp, fin, _) =>
      Files.move(Paths.get(tmp), d.resolve(fin), // [FS seam]
        StandardCopyOption.REPLACE_EXISTING)
    }
    val manifest = all.map { case (_, fin, n) => s"""  "$fin": $n""" }
      .mkString("{\n", ",\n", "\n}\n")
    Files.write(d.resolve("_SHARDS.json"),
      manifest.getBytes(StandardCharsets.UTF_8)) // [FS seam]
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case ShardFilesMessage(files) => files }.flatten
      .foreach { case (tmp, _, _) =>
        Files.deleteIfExists(Paths.get(tmp)) // [FS seam]
      }
}

private[sources] case class ShardStreamingWriterFactory(dir: String)
    extends streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new ShardDataWriter(dir, taskId,
      shard => f"shard-$shard%05d-epoch-$epochId.jsonl",
      sortedInput = false)
}

private[sources] class ShardWriterFactory(dir: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
                            taskId: Long): DataWriter[InternalRow] =
    new ShardDataWriter(dir, taskId, ShardSink.shardFileName,
      sortedInput = true)
}

/** Writes (shard, pos, line) rows to per-shard temp files. With
  * `sortedInput` (the batch path — rows arrive sorted by shard) a new
  * shard value closes the previous file: one pass, one open file. The
  * streaming path sees interleaved shards and keeps one open writer per
  * shard instead.
  */
private[sources] class ShardDataWriter(dir: String, taskId: Long,
                                       fileName: Long => String,
                                       sortedInput: Boolean)
    extends DataWriter[InternalRow] {

  private val tmpDir = {
    val p = Paths.get(dir, "_tmp")
    Files.createDirectories(p)
    p
  }
  private val open =
    scala.collection.mutable.LinkedHashMap.empty[Long, java.io.BufferedWriter]
  private val rows = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
  private val done = Seq.newBuilder[(String, String, Long)]

  private def tmpPath(shard: Long) =
    tmpDir.resolve(s"task-$taskId-${fileName(shard)}")

  private def closeShard(shard: Long): Unit = open.remove(shard).foreach { w =>
    w.close()
    done += ((tmpPath(shard).toString, fileName(shard),
      rows.remove(shard).getOrElse(0L)))
  }

  override def write(row: InternalRow): Unit = {
    val shard = row.getLong(0)
    val w = open.getOrElse(shard, {
      // sorted input never revisits a shard — close the previous one so
      // exactly one file is open; unsorted (streaming) keeps all open
      if (sortedInput) open.keys.toSeq.foreach(closeShard)
      val nw = Files.newBufferedWriter(tmpPath(shard),
        StandardCharsets.UTF_8)
      open(shard) = nw
      nw
    })
    w.write(row.getString(2))
    w.write('\n')
    rows(shard) = rows.getOrElse(shard, 0L) + 1L
  }

  override def commit(): WriterCommitMessage = {
    open.keys.toSeq.foreach(closeShard)
    ShardFilesMessage(done.result())
  }

  override def abort(): Unit = {
    open.values.foreach(_.close())
    open.clear()
    done.result().foreach { case (tmp, _, _) =>
      Files.deleteIfExists(Paths.get(tmp))
    }
  }

  override def close(): Unit = ()
}

/** Caller-facing composition: deterministic shard layout + DSv2 write. */
object CorpusShards {

  /** (doc_id, line) -> (shard, pos, line): txt_shuffle_shard's md5
    * arithmetic (TextAnalysis.scala) — shard from the first 8 md5 hex
    * digits of doc_id, position = rank of the hash within the shard.
    */
  def layout(docs: DataFrame, nShards: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("hk"), col("doc_id"))
    docs
      .selectExpr("doc_id", "line", "md5(cast(doc_id as string)) AS hk")
      .selectExpr("doc_id", "line", "hk",
        s"cast(conv(substring(hk, 1, 8), 16, 10) as bigint)" +
          s" % $nShards AS shard")
      .withColumn("pos", row_number().over(w).cast("bigint"))
      .select("shard", "pos", "line")
  }

  /** Lay out and write `docs` (`doc_id`, `line`) as `nShards` JSONL
    * shard files under `dir`, byte-deterministically. Each shard is
    * written by exactly one task (hash partitioning on the shard id)
    * in final order (sortWithinPartitions).
    */
  def write(docs: DataFrame, dir: String, nShards: Int): Unit =
    layout(docs, nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "pos")
      .write.format("graft-shards").option("path", dir)
      .mode(SaveMode.Overwrite).save()
}

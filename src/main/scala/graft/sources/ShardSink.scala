package graft.sources

import java.io.{BufferedReader, BufferedWriter, IOException, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.{streaming => wstream}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 "graft-shards" format — the corpus shard store:
  * training shards as JSONL files with a DETERMINISTIC, rerun-stable
  * layout, written AND read through the same provider (write = the
  * curation pipeline's last step, read = the training job's first).
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
  * All I/O goes through the Hadoop `FileSystem` API resolved from the
  * sink path's scheme, with the session's Hadoop configuration captured
  * on the driver at write-planning time and shipped to executors inside
  * the writer factory — so the same sink writes `file:`, `hdfs:`, or any
  * object-store connector on the classpath with no code change. Rename
  * semantics are normalized in [[ShardFs.renameOver]]: HDFS `rename`
  * refuses to clobber an existing destination while the local FS
  * silently overwrites, so the destination is deleted first on every FS.
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

/** Hadoop `Configuration` is not `Serializable`; this wrapper ships it
  * to executors via its own `write`/`readFields` wire format (the same
  * approach as Spark's internal `SerializableConfiguration`, which is
  * `private[spark]`).
  */
private[sources] class SerializableHadoopConf(
    @transient var value: Configuration) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

/** `_SHARDS.json` — the store's commit pointer. Historically a flat
  * `{"shard-00000.jsonl": rows, ...}` row-count record; since the
  * compaction work it is the SOURCE OF TRUTH for the committed file
  * set (the batch reader plans from it when present), plus an optional
  * reserved `"_epochs"` object recording, per shard, the highest
  * streaming-epoch id already folded into the committed file — the
  * watermark that makes [[ShardCompact.compact]] crash-recoverable
  * (a consumed epoch file that survived a crashed GC pass is
  * recognized as stale instead of being folded in twice).
  *
  * Writes land via temp-file + rename-with-OVERWRITE through the
  * `FileContext` API, which is an ATOMIC replace on HDFS and the local
  * FS — the pointer is never absent, so no crash or concurrent read
  * can observe a missing manifest. On exotic FileSystems with no
  * AbstractFileSystem binding the write falls back to
  * delete-then-rename; [[ShardCompact.compact]] refuses to run against
  * a store whose pointer is missing but whose committed files exist,
  * so even that fallback's crash window degrades to an explicit
  * operator error instead of silent re-folding.
  */
private[sources] object ShardManifest {
  import com.fasterxml.jackson.databind.ObjectMapper
  import com.fasterxml.jackson.databind.node.ObjectNode

  val Name = "_SHARDS.json"

  /** Committed files (name -> rows) + per-shard consumed-epoch watermark. */
  case class State(files: Map[String, Long], epochsThrough: Map[Long, Long])

  private val Committed = "shard-(\\d+)(?:-gen-(\\d+))?\\.jsonl".r

  /** Shard id of a committed (plain or gen-suffixed) file name. */
  def shardOf(name: String): Option[Long] = name match {
    case Committed(id, _) => Some(id.toLong)
    case _ => None
  }

  /** Generation of a committed file name (plain = 0). */
  def genOf(name: String): Long = name match {
    case Committed(_, null) => 0L
    case Committed(_, g)    => g.toLong
    case _ => 0L
  }

  def fileName(shard: Long, gen: Long): String =
    if (gen == 0L) ShardSink.shardFileName(shard)
    else f"shard-$shard%05d-gen-$gen.jsonl"

  def read(fs: FileSystem, d: HPath): Option[State] = {
    val p = new HPath(d, Name)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val bytes = try in.readAllBytes() finally in.close()
      val root = new ObjectMapper().readTree(bytes).asInstanceOf[ObjectNode]
      val files = Map.newBuilder[String, Long]
      val epochs = Map.newBuilder[Long, Long]
      root.fields().asScala.foreach { e =>
        if (e.getKey == "_epochs")
          e.getValue.fields().asScala.foreach(se =>
            epochs += (se.getKey.toLong -> se.getValue.asLong()))
        else files += (e.getKey -> e.getValue.asLong())
      }
      Some(State(files.result(), epochs.result()))
    }
  }

  def write(fs: FileSystem, d: HPath, files: Map[String, Long],
            epochsThrough: Map[Long, Long]): Unit = {
    val fileLines = files.toSeq.sortBy(_._1)
      .map { case (f, n) => s"""  "$f": $n""" }
    val epochLines =
      if (epochsThrough.isEmpty) Seq.empty
      else Seq(epochsThrough.toSeq.sortBy(_._1)
        .map { case (s, e) => s""""$s": $e""" }
        .mkString("  \"_epochs\": {", ", ", "}"))
    val json = (fileLines ++ epochLines).mkString("{\n", ",\n", "\n}\n")
    val tmp = new HPath(d, Name + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(json.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val dst = new HPath(d, Name)
    try {
      val fc = org.apache.hadoop.fs.FileContext
        .getFileContext(fs.getUri, fs.getConf)
      // FileContext bypasses ChecksumFileSystem, so on the local FS the
      // .crc shadows would go stale: drop the destination's shadow
      // before the flip (a shadow-less file reads fine, unverified) and
      // the temp's orphaned shadow after. Neither delete touches the
      // pointer itself — the data rename below is the one atomic step.
      fs.delete(new HPath(d, "." + Name + ".crc"), false)
      fc.rename(fs.makeQualified(tmp), fs.makeQualified(dst),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      fs.delete(new HPath(d, "." + Name + ".tmp.crc"), false)
    } catch {
      // no AbstractFileSystem binding for this scheme: fall back to
      // delete-then-rename; ShardCompact refuses manifest-less stores
      // with committed files, so this window degrades to an operator
      // error, never a silent re-fold
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException |
           _: UnsupportedOperationException =>
        ShardFs.renameOver(fs, tmp, dst)
    }
  }
}

private[sources] object ShardFs {
  def resolve(dir: String, conf: Configuration): (FileSystem, HPath) = {
    val p = new HPath(dir)
    (p.getFileSystem(conf), p)
  }

  /** Rename with replace-existing semantics on every FileSystem: HDFS
    * `rename` returns false if the destination exists, the raw local FS
    * clobbers it — delete-then-rename makes both behave like the local
    * one, and a false return after that is a real failure worth raising
    * (a silent false would drop a committed shard).
    *
    * Overwrite is NOT read-concurrent: between the delete and the
    * rename a reader of an already-committed directory can observe the
    * shard missing. That is within this sink's documented overwrite
    * semantics (rewriting a live corpus in place is not supported —
    * publish a new directory and flip a pointer for that); first-time
    * commits are unaffected because nothing reads a directory before
    * its manifest lands.
    */
  def renameOver(fs: FileSystem, src: HPath, dst: HPath): Unit = {
    if (fs.exists(dst)) fs.delete(dst, false)
    if (!fs.rename(src, dst))
      throw new IOException(s"graft-shards: rename $src -> $dst failed")
  }
}

private[sources] class ShardTable(props: Map[String, String])
    extends Table with SupportsWrite with SupportsRead {
  override def name(): String = s"graft-shards(${props.getOrElse("path", "?")})"
  override def schema(): StructType = ShardSink.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE).asJava

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = {
    val dir = Option(options.get("path"))
      .getOrElse(props.getOrElse("path",
        throw new IllegalArgumentException("graft-shards needs a path")))
    new ShardScanBuilder(dir, new SerializableHadoopConf(
      SparkSession.active.sessionState.newHadoopConf()))
  }

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

/** Batch READ side: the round-trip for training jobs. One input
  * partition per committed batch-layout shard file (`shard-N.jsonl`
  * — epoch files and `_tmp` are not part of the batch contract), so
  * parallelism = shard count, the same unit training consumers use.
  * `(shard, pos, line)` is reconstructed from the layout contract: the
  * shard id from the file name, `pos` as the 1-based line number (the
  * batch writer lands rows in final `(shard, pos)` order). Files are
  * never split mid-file — a shard is the atomic consumption unit and
  * line-oriented JSONL has no row-group index to split on.
  *
  * The scan is a real columnar citizen at 100 TB, where the shard
  * store is the corpus's resting format:
  *  - column pruning ([[SupportsPushDownRequiredColumns]]): a
  *    shard/pos-only consumer (counts, manifests, co-partition checks)
  *    never decodes line payloads — the reader counts newlines on the
  *    raw byte stream instead of materializing strings;
  *  - shard filter pushdown ([[SupportsPushDownFilters]]): =, IN and
  *    range conjuncts over `shard` drop whole files at planning time
  *    (they are exact per file, so Spark re-evaluates nothing);
  *  - reported partitioning ([[SupportsReportPartitioning]]): every
  *    file holds exactly one shard key, so the scan reports
  *    KeyGroupedPartitioning over `shard` and a downstream shard-keyed
  *    join or aggregation skips its exchange (storage-partitioned
  *    execution; needs spark.sql.sources.v2.bucketing.enabled, set in
  *    Engine.session);
  *  - COUNT(*) pushdown ([[SupportsPushDownAggregates]]): an ungrouped
  *    count — optionally under pushed shard filters — is answered from
  *    the manifest's exact per-file row counts with zero data I/O (see
  *    the builder's manifest-count section).
  */
private[sources] class ShardScanBuilder(dir: String,
                                        conf: SerializableHadoopConf)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownAggregates {
  import org.apache.spark.sql.sources._

  private var required: StructType = ShardSink.schema
  private var pushed: Array[Filter] = Array.empty
  private var pushedCountAggs = 0

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** A conjunct is accepted iff it constrains only `shard` in a shape
    * we can test per file; accepted conjuncts are EXACT (a file's rows
    * all share one shard value), so only the rest remains post-scan.
    */
  private def shardTest(f: Filter): Option[Long => Boolean] = f match {
    case EqualTo("shard", v: Long)            => Some(_ == v)
    case In("shard", vs) =>
      // accept iff EVERY value is a long (a primitive Long pattern
      // already matches boxed values, so one case suffices); counting
      // matches — not comparing set size to list length — keeps
      // duplicate values in the IN list pushable (shard IN (3, 3, 5)
      // is still an exact per-file test)
      val longs = vs.collect { case v: Long => v }
      if (longs.length == vs.length) {
        val set = longs.toSet
        Some(set.contains)
      } else None
    case GreaterThan("shard", v: Long)        => Some(_ > v)
    case GreaterThanOrEqual("shard", v: Long) => Some(_ >= v)
    case LessThan("shard", v: Long)           => Some(_ < v)
    case LessThanOrEqual("shard", v: Long)    => Some(_ <= v)
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (acc, rest) = filters.partition(f => shardTest(f).isDefined)
    pushed = acc
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  // -- COUNT(*) answered from the manifest: zero data I/O ------------------
  // The commit pointer records exact per-file row counts (batch writer
  // at commit, compaction at fold), so an ungrouped COUNT(*) — with or
  // without pushed shard filters, which prune manifest entries the same
  // way they prune files — is a planning-time catalog lookup. At corpus
  // scale that's `SELECT count(*) FROM corpus` without touching 100 TB.
  // Spark only attempts aggregate pushdown when every filter was
  // absorbed by pushFilters, so a residual line/pos predicate keeps the
  // normal scan. Grouped aggregations are NOT pushed: group-by-shard
  // already runs exchange-free on the reported KeyGroupedPartitioning.
  import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}

  private lazy val manifestCounts: Option[Seq[(Long, Long)]] = {
    val (fs, d) = ShardFs.resolve(dir, conf.value)
    if (!fs.exists(d)) Some(Seq.empty)
    else ShardManifest.read(fs, d).map(_.files.toSeq.flatMap {
      case (f, n) => ShardManifest.shardOf(f).map(_ -> n)
    })
  }

  private def countOnly(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall(_.isInstanceOf[CountStar]) &&
      manifestCounts.isDefined

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    countOnly(agg)

  override def pushAggregation(agg: Aggregation): Boolean =
    countOnly(agg) && {
      pushedCountAggs = agg.aggregateExpressions.length
      true
    }

  override def build(): Scan = {
    val tests = pushed.flatMap(shardTest)
    val pred: Long => Boolean = shard => tests.forall(_(shard))
    if (pushedCountAggs > 0) {
      val total = manifestCounts.get
        .collect { case (sh, n) if pred(sh) => n }.sum
      new ManifestCountScan(dir, total, pushedCountAggs,
        pushed.mkString(", "))
    } else
      new ShardScan(dir, conf, required, pred, pushed.mkString(", "))
  }
}

/** The aggregate-pushdown result: one partition, one row, the COUNT(*)
  * value(s) straight from the manifest — no file is opened.
  */
private[sources] class ManifestCountScan(dir: String, total: Long,
                                         nAggs: Int, pushedDesc: String)
    extends Scan with Batch {
  override def readSchema(): StructType =
    StructType((0 until nAggs).map(i =>
      StructField(s"count_$i", LongType, nullable = false)))
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-shards read $dir PushedAggregates: [COUNT(*)] (manifest)" +
      (if (pushedDesc.nonEmpty) s" PushedFilters: [$pushedDesc]" else "")

  override def planInputPartitions(): Array[InputPartition] =
    Array(ManifestCountPartition(total, nAggs))

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(
          partition: InputPartition): PartitionReader[InternalRow] = {
        val p = partition.asInstanceOf[ManifestCountPartition]
        new PartitionReader[InternalRow] {
          private var emitted = false
          override def next(): Boolean =
            if (emitted) false else { emitted = true; true }
          override def get(): InternalRow =
            new GenericInternalRow(
              Array.fill[Any](p.nAggs)(p.total))
          override def close(): Unit = ()
        }
      }
    }
}

private[sources] case class ManifestCountPartition(total: Long, nAggs: Int)
    extends InputPartition

private[sources] class ShardScan(dir: String, conf: SerializableHadoopConf,
                                 required: StructType,
                                 shardPred: Long => Boolean,
                                 pushedDesc: String)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-shards read $dir ReadSchema: ${required.simpleString}" +
      (if (pushedDesc.nonEmpty) s" PushedFilters: [$pushedDesc]" else "")

  // Listed once, reused by planInputPartitions AND outputPartitioning
  // (the reported numPartitions must match the planned partitions).
  // Manifest-first: when `_SHARDS.json` exists it IS the committed file
  // set (so a compaction's generation flip is atomic — a reader planned
  // against the old pointer never sees half-replaced files, and orphan
  // gen files from a crashed flip are invisible). The directory-listing
  // fallback covers pre-manifest dirs and the delete-before-rename flip
  // window on non-atomic-replace FSs; it admits only plain batch-layout
  // names because without a pointer there is no way to tell a committed
  // generation from crash litter.
  private lazy val partitions: Array[InputPartition] = {
    val (fs, d) = ShardFs.resolve(dir, conf.value)
    val ShardFile = "shard-(\\d+)\\.jsonl".r
    if (!fs.exists(d)) Array.empty
    else {
      val named: Seq[(String, Long)] = ShardManifest.read(fs, d) match {
        case Some(st) =>
          st.files.keysIterator
            .flatMap(f => ShardManifest.shardOf(f).map(f -> _)).toSeq
        case None => fs.listStatus(d).iterator
          .flatMap(st => st.getPath.getName match {
            case ShardFile(id) if st.isFile =>
              Some((st.getPath.getName, id.toLong))
            case _ => None
          }).toSeq
      }
      named.iterator
        .map { case (f, id) =>
          ShardInputPartition(new HPath(d, f).toString, id)
        }
        .filter(p => shardPred(p.shard))
        .toArray.sortBy(_.shard)
        .map(p => p: InputPartition)
    }
  }

  override def planInputPartitions(): Array[InputPartition] = partitions

  /** One shard key per file: KeyGroupedPartitioning on `shard` —
    * unless pruning removed `shard` from the output, in which case
    * there is no key column to cluster on.
    */
  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    if (required.fieldNames.contains("shard"))
      new org.apache.spark.sql.connector.read.partitioning
        .KeyGroupedPartitioning(
          Array(org.apache.spark.sql.connector.expressions.Expressions
            .identity("shard")),
          partitions.length)
    else new org.apache.spark.sql.connector.read.partitioning
      .UnknownPartitioning(partitions.length)

  override def createReaderFactory(): PartitionReaderFactory =
    ShardReaderFactory(conf, required)
}

private[sources] case class ShardInputPartition(path: String, shard: Long)
    extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](shard))
}

private[sources] case class ShardReaderFactory(conf: SerializableHadoopConf,
                                               required: StructType)
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ShardInputPartition]
    val needLine = required.fieldNames.contains("line")
    // column index -> value builder, resolved once per partition
    val fields: Array[(Long, String) => Any] = required.fields.map { f =>
      f.name match {
        case "shard" => (_: Long, _: String) => p.shard
        case "pos"   => (pos: Long, _: String) => pos
        case "line"  => (_: Long, l: String) => UTF8String.fromString(l)
        case other => throw new IllegalArgumentException(
          s"graft-shards: unknown column $other")
      }
    }
    if (needLine)
      new PartitionReader[InternalRow] {
        private val hp = new HPath(p.path)
        private val in = new BufferedReader(new InputStreamReader(
          hp.getFileSystem(conf.value).open(hp), StandardCharsets.UTF_8))
        private var pos = 0L
        private var line: String = _
        override def next(): Boolean = {
          line = in.readLine()
          if (line != null) { pos += 1L; true } else false
        }
        override def get(): InternalRow =
          new GenericInternalRow(fields.map(_(pos, line)))
        override def close(): Unit = in.close()
      }
    else
      // Pruned fast path: no line column requested — count rows by
      // scanning raw bytes for newlines (the writer terminates every
      // row with '\n'), never decoding UTF-8 or allocating strings.
      new PartitionReader[InternalRow] {
        private val hp = new HPath(p.path)
        private val in = hp.getFileSystem(conf.value).open(hp)
        private val buf = new Array[Byte](1 << 16)
        private var avail = 0
        private var off = 0
        private var pos = 0L
        override def next(): Boolean = {
          while (true) {
            while (off < avail) {
              if (buf(off) == '\n') { off += 1; pos += 1L; return true }
              off += 1
            }
            avail = in.read(buf)
            off = 0
            if (avail < 0) return false
          }
          false
        }
        override def get(): InternalRow =
          new GenericInternalRow(fields.map(_(pos, null)))
        override def close(): Unit = in.close()
      }
  }
}

private[sources] class ShardWriteBuilder(dir: String)
    extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  override def build(): Write = {
    // Captured on the driver at plan time (core-site/session overrides
    // included); the factories carry it to executors.
    val conf = new SerializableHadoopConf(
      SparkSession.active.sessionState.newHadoopConf())
    new Write with RequiresDistributionAndOrdering {
      // Final file names are pure functions of the shard id, so rows
      // for ONE shard spread across tasks would produce IDENTICAL
      // names and commit's renameOver would silently keep one task's
      // file — declaring the clustering makes Spark insert the shuffle
      // for ANY input (a Kafka stream, an un-partitioned batch frame)
      // instead of trusting callers to pre-partition. The in-partition
      // (shard, pos) sort likewise ENFORCES the batch writer's
      // sortedInput contract (one open file, byte-stable in-file
      // order) rather than assuming it.
      import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
      import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}
      override def requiredDistribution(): Distribution =
        Distributions.clustered(Array(Expressions.identity("shard")))
      override def requiredOrdering(): Array[SortOrder] = Array(
        Expressions.sort(Expressions.identity("shard"),
          SortDirection.ASCENDING),
        Expressions.sort(Expressions.identity("pos"),
          SortDirection.ASCENDING))
      override def toBatch: BatchWrite =
        new ShardBatchWrite(dir, truncateFirst, conf)
      override def toStreaming: wstream.StreamingWrite =
        new ShardStreamingWrite(dir, conf)
    }
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
private[sources] class ShardStreamingWrite(dir: String,
                                           conf: SerializableHadoopConf)
    extends wstream.StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): wstream.StreamingDataWriterFactory =
    ShardStreamingWriterFactory(dir, conf)

  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit = {
    val (fs, d) = ShardFs.resolve(dir, conf.value)
    fs.mkdirs(d)
    messages.collect { case ShardFilesMessage(files) => files }.flatten
      .foreach { case (tmp, fin, _) =>
        ShardFs.renameOver(fs, new HPath(tmp), new HPath(d, fin))
      }
  }

  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit = {
    val (fs, _) = ShardFs.resolve(dir, conf.value)
    messages.collect { case ShardFilesMessage(files) => files }.flatten
      .foreach { case (tmp, _, _) => fs.delete(new HPath(tmp), false) }
  }
}

/** One finished temp file: (tempPath, finalName, rows). */
private[sources] case class ShardFilesMessage(
    files: Seq[(String, String, Long)]) extends WriterCommitMessage

private[sources] class ShardBatchWrite(dir: String, truncateFirst: Boolean,
                                       conf: SerializableHadoopConf)
    extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new ShardWriterFactory(dir, conf)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val (fs, d) = ShardFs.resolve(dir, conf.value)
    fs.mkdirs(d)
    if (truncateFirst) {
      // Overwrite semantics: clear previous shard files + manifest.
      // `contains` (not startsWith) also catches the local FS's hidden
      // `.shard-NNNNN.jsonl.crc` companions — a stale checksum next to
      // a renamed-over shard would fail later checksummed reads.
      fs.listStatus(d).iterator.filter(_.isFile)
        .filter { st =>
          val n = st.getPath.getName
          n.contains("shard-") || n.contains("_SHARDS.json")
        }
        .foreach(st => fs.delete(st.getPath, false))
    } else if (ShardManifest.read(fs, d).isDefined ||
               fs.listStatus(d).exists(st => st.isFile &&
                 ShardManifest.shardOf(st.getPath.getName).isDefined)) {
      // Batch append into a populated store is refused, mirroring the
      // compact refusal guard: this commit's manifest would list only
      // this job's files (hiding prior shards from readers and making
      // the next compact GC them), its cleared _epochs watermark would
      // let stale epoch litter re-fold, and shard file names are pure
      // functions of the shard id so same-shard data files would be
      // renamed over. The store's append story is the streaming sink's
      // epoch files + compact(); whole-corpus rewrites use Overwrite.
      messages.collect { case ShardFilesMessage(files) => files }.flatten
        .foreach { case (tmp, _, _) => fs.delete(new HPath(tmp), false) }
      throw new IOException(
        s"graft-shards: $dir already holds a committed store — batch " +
          "append would clobber its manifest and shard files; use " +
          "SaveMode.Overwrite for a rewrite or the streaming sink + " +
          "compact() for incremental lands")
    }
    val all = messages.collect {
      case ShardFilesMessage(files) => files
    }.flatten.sortBy(_._2)
    all.foreach { case (tmp, fin, _) =>
      ShardFs.renameOver(fs, new HPath(tmp), new HPath(d, fin))
    }
    ShardManifest.write(fs, d,
      all.map { case (_, fin, n) => fin -> n }.toMap, Map.empty)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val (fs, _) = ShardFs.resolve(dir, conf.value)
    messages.collect { case ShardFilesMessage(files) => files }.flatten
      .foreach { case (tmp, _, _) => fs.delete(new HPath(tmp), false) }
  }
}

private[sources] case class ShardStreamingWriterFactory(
    dir: String, conf: SerializableHadoopConf)
    extends wstream.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new ShardDataWriter(dir, conf, taskId,
      shard => f"shard-$shard%05d-epoch-$epochId.jsonl",
      sortedInput = false)
}

private[sources] class ShardWriterFactory(dir: String,
                                          conf: SerializableHadoopConf)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
                            taskId: Long): DataWriter[InternalRow] =
    new ShardDataWriter(dir, conf, taskId, ShardSink.shardFileName,
      sortedInput = true)
}

/** Writes (shard, pos, line) rows to per-shard temp files. With
  * `sortedInput` (the batch path — rows arrive sorted by shard) a new
  * shard value closes the previous file: one pass, one open file. The
  * streaming path sees interleaved shards and keeps one open writer per
  * shard instead.
  */
private[sources] class ShardDataWriter(dir: String,
                                       conf: SerializableHadoopConf,
                                       taskId: Long,
                                       fileName: Long => String,
                                       sortedInput: Boolean)
    extends DataWriter[InternalRow] {

  private val (fs, tmpDir) = {
    val p = new HPath(dir, "_tmp")
    val f = p.getFileSystem(conf.value)
    f.mkdirs(p)
    (f, p)
  }
  private val open =
    scala.collection.mutable.LinkedHashMap.empty[Long, BufferedWriter]
  private val rows = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
  private val done = Seq.newBuilder[(String, String, Long)]

  private def tmpPath(shard: Long) =
    new HPath(tmpDir, s"task-$taskId-${fileName(shard)}")

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
      // overwrite=true: a retried task (or replayed streaming epoch)
      // rewrites its own temp file rather than failing on the leftover
      val nw = new BufferedWriter(new OutputStreamWriter(
        fs.create(tmpPath(shard), true), StandardCharsets.UTF_8))
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
    // both the closed-and-reported temp files and the still-open ones —
    // a task abort must leave nothing of its own behind in _tmp
    val stillOpen = open.keys.toSeq
    open.values.foreach(_.close())
    open.clear()
    done.result().foreach { case (tmp, _, _) =>
      fs.delete(new HPath(tmp), false)
    }
    stillOpen.foreach(s => fs.delete(tmpPath(s), false))
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

/** Oracle gate for the shard round-trip: write the documents corpus
  * through the DSv2 sink, read it back through the DSv2 source, and
  * hash-compare against DuckDB recomputing the layout contract directly
  * from the parquet table. This pins BOTH faces — writer layout
  * determinism and reader (shard, pos, line) reconstruction — to an
  * independent engine. The line payload is `doc_id:md5(text)`:
  * newline-free by construction and byte-identical in both dialects.
  */
object ShardIo extends graft.QueryPack {
  import graft.Engine.table

  private val RtShards = 16
  private val CompactEpochs = 4L

  /** Deterministic per-(process, input) scratch dir (NOT a fresh temp
    * dir per invocation, which leaked a 16-shard corpus copy per
    * bench rep): reruns within a process overwrite in place, so the
    * gate's disk footprint is one copy per fixture per process. The
    * pid in the path keeps two concurrent harness processes from
    * truncating each other's store mid-read.
    */
  private def scratch(tag: String, dir: String): String =
    new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      s"graft_shard_${tag}_" + java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes(StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString.take(12) +
        "_p" + ProcessHandle.current().pid()).toString

  private def corpusLines(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents")
      .selectExpr("doc_id",
        "concat(cast(doc_id as string), ':', md5(text)) AS line")

  private def shardRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = scratch("rt", dir)
    CorpusShards.write(corpusLines(s, dir), out, RtShards)
    s.read.format("graft-shards").option("path", out).load()
      .orderBy("shard", "pos")
  }

  // -- shard_compact: streamed-epoch store sealed into the batch layout ----
  // The ingestion-side small-files gate: the corpus lands as 4 epoch
  // waves (epoch = doc_id % 4 — a deterministic stand-in for arrival
  // batching), each wave an epoch-file drop in the streaming sink's
  // landing format; ShardCompact folds them into one next-generation
  // file per shard with an atomic manifest flip, and the batch read
  // face reconstructs (shard, pos, line) from the sealed store. The
  // oracle restates the end state declaratively: within a shard, rows
  // are ordered by (epoch, md5(doc_id), doc_id) — epoch-arrival order
  // outermost, the writer's deterministic within-epoch order inside.
  private def shardCompact(s: SparkSession, dir: String): DataFrame = {
    val out = scratch("cp", dir)
    val conf = s.sessionState.newHadoopConf()
    val (fs, d) = ShardFs.resolve(out, conf)
    if (fs.exists(d)) fs.delete(d, true) // fresh store per invocation
    val docs = corpusLines(s, dir)
    (0L until CompactEpochs).foreach { e =>
      ShardCompact.landEpoch(
        CorpusShards.layout(docs.where(s"doc_id % $CompactEpochs = $e"),
          RtShards),
        out, e, RtShards)
    }
    ShardCompact.compact(s, out)
    s.read.format("graft-shards").option("path", out).load()
      .orderBy("shard", "pos")
  }

  private val shardRoundtripSql =
    s"""SELECT shard, pos, line FROM (
       |  SELECT shard,
       |    CAST(row_number() OVER (PARTITION BY shard
       |      ORDER BY hk, doc_id) AS BIGINT) AS pos,
       |    line
       |  FROM (
       |    SELECT doc_id, line, hk,
       |      CAST('0x' || substr(hk, 1, 8) AS BIGINT) % $RtShards AS shard
       |    FROM (SELECT doc_id,
       |            CAST(doc_id AS VARCHAR) || ':' || md5(text) AS line,
       |            md5(CAST(doc_id AS VARCHAR)) AS hk
       |          FROM documents)))
       |ORDER BY shard, pos""".stripMargin

  // -- shard_stats: the store's metadata-only balance audit ----------------
  // Per-shard row counts from the manifest + byte sizes from file
  // status — ZERO data scanned, the pre-training skew check a consumer
  // runs before committing 1000 executors to a corpus. The oracle
  // recomputes BOTH channels from the documents table (rows by layout
  // arithmetic, bytes as sum(strlen(line)+1) — the writer is
  // one UTF-8 line + '\n' per row), so the manifest's counts and the
  // files' physical sizes are each pinned to an independent engine.
  // Driver-side by design: the manifest is model-sized (one entry per
  // shard), the same object every reader already consults at planning.
  private def shardStats(s: SparkSession, dir: String): DataFrame = {
    val out = scratch("st", dir)
    CorpusShards.write(corpusLines(s, dir), out, RtShards)
    import s.implicits._
    ShardStats.audit(s, out).toDF("shard", "n_rows", "bytes")
      .orderBy("shard")
  }

  private val shardStatsSql =
    s"""SELECT shard, CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(SUM(strlen(line) + 1) AS BIGINT) AS bytes
       |FROM (
       |  SELECT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
       |           AS BIGINT) % $RtShards AS shard,
       |    CAST(doc_id AS VARCHAR) || ':' || md5(text) AS line
       |  FROM documents)
       |GROUP BY shard
       |ORDER BY shard""".stripMargin

  private val shardCompactSql =
    s"""SELECT shard,
       |  CAST(row_number() OVER (PARTITION BY shard
       |    ORDER BY epoch, hk, doc_id) AS BIGINT) AS pos,
       |  line
       |FROM (
       |  SELECT doc_id, line, hk, doc_id % $CompactEpochs AS epoch,
       |    CAST('0x' || substr(hk, 1, 8) AS BIGINT) % $RtShards AS shard
       |  FROM (SELECT doc_id,
       |          CAST(doc_id AS VARCHAR) || ':' || md5(text) AS line,
       |          md5(CAST(doc_id AS VARCHAR)) AS hk
       |        FROM documents))
       |ORDER BY shard, pos""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("shard_roundtrip" -> (shardRoundtrip _),
        "shard_compact" -> (shardCompact _),
        "shard_stats" -> (shardStats _))

  override val oracles: Map[String, String] =
    Map("shard_roundtrip" -> shardRoundtripSql,
        "shard_compact" -> shardCompactSql,
        "shard_stats" -> shardStatsSql)
}

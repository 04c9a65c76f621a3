package graft.sources

import java.io.{BufferedWriter, OutputStreamWriter}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col

/** Metadata-only audit of a graft-shards store: per-shard row counts
  * from the manifest, byte sizes from file status — no data read. The
  * manifest is model-sized (one entry per shard), so this is a
  * driver-side catalog lookup, the same object every batch read
  * already consults at planning time.
  */
object ShardStats {

  /** (shard, rows, bytes) per committed shard, ascending. */
  def audit(spark: SparkSession, dir: String): Seq[(Long, Long, Long)] = {
    val conf = spark.sessionState.newHadoopConf()
    val (fs, d) = ShardFs.resolve(dir, conf)
    if (!fs.exists(d)) return Seq.empty
    ShardManifest.read(fs, d)
      .map(_.files.toSeq.flatMap { case (f, n) =>
        ShardManifest.shardOf(f).map(sh =>
          (sh, n, fs.getFileStatus(new HPath(d, f)).getLen))
      }.sortBy(_._1))
      .getOrElse(Seq.empty)
  }
}

/** Compaction ("seal") for the graft-shards store — the bridge from the
  * streaming sink's per-epoch landing files to the batch/training
  * layout, and the store's answer to the small-files problem.
  *
  * A long-running ingestion writes `shard-SSSSS-epoch-E.jsonl` per
  * (shard, epoch) — at 100 TB that is thousands of tiny files per shard,
  * and the batch read face deliberately ignores them (an epoch file is
  * an ingestion artifact, not a committed training unit). `compact`
  * folds each shard's unconsumed epoch files, in epoch order, onto the
  * shard's committed file, producing ONE next-generation file per shard
  * (`shard-SSSSS-gen-G.jsonl`) and flipping the `_SHARDS.json` pointer
  * to the new file set in one atomic manifest rename. Readers plan from
  * the pointer, so they see the store before-or-after, never mid-flip.
  *
  * Crash recovery is watermark-based, not marker-based: the manifest
  * records, per shard, the highest epoch id already folded in
  * (`_epochs`). The commit ORDER makes every crash window safe under
  * the store's single-compactor discipline:
  *
  *   1. write new gen files (task temp -> rename; crash = orphan gen
  *      files the manifest never references -> invisible, GC'd later);
  *   2. flip the manifest (atomic rename; crash before = old store,
  *      crash after = new store);
  *   3. GC replaced gen files + consumed epoch files (crash = litter
  *      whose epochs are <= the watermark -> the next compact deletes
  *      instead of re-folding; double-count is impossible).
  *
  * The fold itself is DISTRIBUTED and byte-oriented: one task per shard
  * streams its input files' bytes to the output (counting newlines for
  * the manifest), so compaction cost is one read + one write of the
  * folded data with zero decode, zero shuffle, and parallelism = shard
  * count — the same scaling unit as the store itself.
  */
object ShardCompact {

  /** What a compact() pass did: shards rewritten, epoch files folded
    * (stale ones GC'd but not counted), total rows in rewritten files.
    */
  case class CompactStats(shards: Int, epochFiles: Int, rows: Long)

  private val EpochFile = "shard-(\\d+)-epoch-(\\d+)\\.jsonl".r

  /** One unit of distributed work: rewrite a shard's committed+epoch
    * chain into its next generation. A dir with no manifest is treated
    * as streaming-only (the batch writer always leaves a manifest, so
    * committed-but-unreferenced plain files cannot arise from this
    * store's own writers).
    */
  private case class ShardTask(shard: Long, outName: String,
                               inputs: Seq[String])

  def compact(spark: SparkSession, dir: String): CompactStats = {
    val conf = new SerializableHadoopConf(
      spark.sessionState.newHadoopConf())
    val (fs, d) = ShardFs.resolve(dir, conf.value)
    if (!fs.exists(d)) return CompactStats(0, 0, 0L)

    val committed = ShardManifest.read(fs, d)
      .getOrElse(ShardManifest.State(Map.empty, Map.empty))
    val byShard: Map[Long, String] = committed.files.keysIterator
      .flatMap(f => ShardManifest.shardOf(f).map(_ -> f)).toMap

    // epoch files on disk, split into fresh (to fold) vs stale (already
    // <= the consumed watermark: litter from a crashed GC pass)
    val epochs = fs.listStatus(d).iterator.filter(_.isFile)
      .flatMap(st => st.getPath.getName match {
        case EpochFile(s, e) => Some((s.toLong, e.toLong, st.getPath))
        case _ => None
      }).toSeq
    val (fresh, stale) = epochs.partition { case (s, e, _) =>
      e > committed.epochsThrough.getOrElse(s, -1L)
    }

    val tasks: Seq[ShardTask] = fresh.groupBy(_._1).toSeq.map {
      case (shard, efs) =>
        val prev = byShard.get(shard)
        val gen = prev.map(ShardManifest.genOf).getOrElse(-1L) + 1L
        ShardTask(shard, ShardManifest.fileName(shard, math.max(gen, 1L)),
          prev.map(f => new HPath(d, f).toString).toSeq ++
            efs.sortBy(_._2).map(_._3.toString))
    }

    val results: Seq[(Long, String, Long)] =
      if (tasks.isEmpty) Seq.empty
      else {
        val sc = spark.sparkContext
        val n = math.min(tasks.size, math.max(sc.defaultParallelism, 1))
        sc.parallelize(tasks, n).map { t =>
          val (tfs, td) = ShardFs.resolve(dir, conf.value)
          (t.shard, t.outName, rewrite(tfs, td, t))
        }.collect().toSeq
      }

    // rename new gen files into place, then flip the pointer — skipped
    // entirely on a pure no-op pass (nothing fresh), so re-running
    // compact on a sealed store never touches the commit pointer; the
    // GC below still clears crash litter
    results.foreach { case (_, outName, _) =>
      ShardFs.renameOver(fs, new HPath(d, "_tmp/compact-" + outName),
        new HPath(d, outName))
    }
    val replaced = results.flatMap { case (s, _, _) => byShard.get(s) }
    val newFiles = (committed.files -- replaced) ++
      results.map { case (_, f, n) => f -> n }
    if (results.nonEmpty) {
      val newEpochs = committed.epochsThrough ++
        fresh.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      ShardManifest.write(fs, d, newFiles, newEpochs)
    }

    // GC (best-effort, all invisible to manifest-planned readers):
    // replaced generations, consumed + stale epoch files, and any
    // gen-pattern file the new pointer does not reference (crashed-flip
    // litter — gen names never re-enter use, so this cannot race a
    // reader planned against the current pointer)
    replaced.foreach(f => fs.delete(new HPath(d, f), false))
    (fresh ++ stale).foreach { case (_, _, p) => fs.delete(p, false) }
    fs.listStatus(d).iterator.filter(_.isFile)
      .map(_.getPath)
      .filter { p =>
        val n = p.getName
        n.matches("shard-\\d+-gen-\\d+\\.jsonl") && !newFiles.contains(n)
      }
      .foreach(p => fs.delete(p, false))

    CompactStats(results.size, fresh.size,
      results.map(_._3).sum)
  }

  /** Stream-copy `t.inputs` into `_tmp/compact-<outName>`, returning the
    * row (newline) count. Pure byte I/O — no UTF-8 decode, no parsing;
    * a missing final newline on an input (hand-landed file) is repaired
    * so the concatenation cannot glue two rows together.
    */
  private def rewrite(fs: FileSystem, d: HPath, t: ShardTask): Long = {
    val tmpDir = new HPath(d, "_tmp")
    fs.mkdirs(tmpDir)
    val out = fs.create(new HPath(tmpDir, "compact-" + t.outName), true)
    val buf = new Array[Byte](1 << 16)
    var rows = 0L
    try {
      t.inputs.foreach { in =>
        val src = fs.open(new HPath(in))
        var last: Byte = '\n'
        try {
          var n = src.read(buf)
          while (n > 0) {
            var i = 0
            while (i < n) { if (buf(i) == '\n') rows += 1L; i += 1 }
            last = buf(n - 1)
            out.write(buf, 0, n)
            n = src.read(buf)
          }
        } finally src.close()
        if (last != '\n') { out.write('\n'); rows += 1L }
      }
    } finally out.close()
    rows
  }

  /** Deterministic epoch feeder for gates and fixtures: land `df`
    * (`shard`, `pos`, `line`) as `shard-SSSSS-epoch-<epoch>.jsonl`
    * files, one per shard, rows in (shard, pos) order — the byte-stable
    * stand-in for an external ingester dropping epoch files. The
    * PRODUCTION ingest face is the streaming sink (whose per-epoch row
    * order is arrival order); this utility exists so compaction can be
    * hash-gated against an independent oracle, the same role the
    * Replay feeders play for the streaming operators.
    */
  def landEpoch(df: DataFrame, dir: String, epoch: Long,
                nShards: Int): Unit = {
    val conf = new SerializableHadoopConf(
      df.sparkSession.sessionState.newHadoopConf())
    df.select(col("shard").cast("long"), col("pos").cast("long"),
        col("line"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "pos")
      .foreachPartition { (it: Iterator[Row]) =>
        if (it.hasNext) {
          val (fs, d) = ShardFs.resolve(dir, conf.value)
          val tmpDir = new HPath(d, "_tmp")
          fs.mkdirs(tmpDir)
          val attempt = TaskContext.get().taskAttemptId()
          var cur = -1L
          var w: BufferedWriter = null
          var tmp: HPath = null
          var fin: HPath = null
          def closeShard(): Unit = if (w != null) {
            w.close()
            ShardFs.renameOver(fs, tmp, fin)
            w = null
          }
          it.foreach { r =>
            val sh = r.getLong(0)
            if (sh != cur) {
              closeShard()
              val name = f"shard-$sh%05d-epoch-$epoch.jsonl"
              tmp = new HPath(tmpDir, s"land-$attempt-$name")
              fin = new HPath(d, name)
              // overwrite=true: a retried task rewrites its own temp
              w = new BufferedWriter(new OutputStreamWriter(
                fs.create(tmp, true), StandardCharsets.UTF_8))
              cur = sh
            }
            w.write(r.getString(2))
            w.write('\n')
          }
          closeShard()
        }
      }
  }
}

package graft.sources

import java.io.{BufferedWriter, IOException, OutputStreamWriter}
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
  *   1. write new gen files (attempt-qualified task temp -> rename;
  *      crash = orphan files the manifest never references ->
  *      invisible, GC'd later);
  *   2. flip the manifest (atomic OVERWRITE rename; crash before = old
  *      store, crash after = new store);
  *   3. GC consumed epoch files and unreferenced committed-pattern
  *      files (crash = litter whose epochs are <= the watermark -> the
  *      next compact deletes instead of re-folding; double-count is
  *      impossible). The generation replaced THIS pass gets one
  *      compaction cycle of grace before collection, so a reader that
  *      planned against the old pointer can finish scanning it —
  *      planning is atomic at the pointer, execution is protected by
  *      the grace window (one compact cycle, like a lakehouse VACUUM
  *      retention floor).
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
  private val LandTmp = "land-\\d+-shard-(\\d+)-epoch-(\\d+)\\.jsonl".r

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

    val manifest = ShardManifest.read(fs, d)
    val listed = fs.listStatus(d).filter(_.isFile)
    // A dir with committed-pattern files but NO pointer is crash
    // fallout (possible only under the non-atomic fallback write) or
    // external tampering: refuse loudly. Silently treating it as
    // streaming-only would re-fold epochs into a fresh gen-1 and the
    // catch-all GC would then delete the orphaned committed files —
    // permanent data loss. Recovery is an operator decision (restore
    // the pointer or adopt the files), not something to guess at here.
    if (manifest.isEmpty &&
        listed.exists(st => ShardManifest.shardOf(st.getPath.getName)
          .isDefined))
      throw new IOException(
        s"graft-shards: $dir has committed shard files but no " +
          s"${ShardManifest.Name} pointer — refusing to compact; " +
          "restore the manifest before re-running")
    val committed = manifest
      .getOrElse(ShardManifest.State(Map.empty, Map.empty))
    val byShard: Map[Long, String] = committed.files.keysIterator
      .flatMap(f => ShardManifest.shardOf(f).map(_ -> f)).toMap

    // Epoch files on disk, split into fresh (to fold) vs stale (at or
    // below the consumed watermark). Stale = a re-delivered copy of an
    // epoch already folded in — the streaming sink's epoch ids are
    // monotone per query (checkpointed), and landEpoch callers must
    // keep per-shard epoch ids monotone too (the documented landing
    // contract); under that contract "stale" can only mean
    // already-consumed, so deleting it is the crash-recovery path,
    // never data loss.
    val epochs = listed.iterator
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

    // Each attempt writes an attempt-qualified temp (a speculative or
    // zombie duplicate can never interleave with the winner's bytes —
    // the same discipline as ShardDataWriter's task-id temps); the
    // winning attempt's path comes back in its result and is what the
    // driver renames.
    val results: Seq[(Long, String, String, Long)] =
      if (tasks.isEmpty) Seq.empty
      else {
        val sc = spark.sparkContext
        val n = math.min(tasks.size, math.max(sc.defaultParallelism, 1))
        sc.parallelize(tasks, n).map { t =>
          val (tfs, td) = ShardFs.resolve(dir, conf.value)
          val tmp = new HPath(td,
            s"_tmp/compact-${TaskContext.get().taskAttemptId()}-" +
              t.outName)
          (t.shard, t.outName, tmp.toString, rewrite(tfs, tmp, t))
        }.collect().toSeq
      }

    // rename new gen files into place, then flip the pointer — skipped
    // entirely on a pure no-op pass (nothing fresh), so re-running
    // compact on a sealed store never touches the commit pointer; the
    // GC below still clears crash litter
    results.foreach { case (_, outName, tmp, _) =>
      ShardFs.renameOver(fs, new HPath(tmp), new HPath(d, outName))
    }
    val replaced = results.flatMap { case (s, _, _, _) => byShard.get(s) }
    val newFiles = (committed.files -- replaced) ++
      results.map { case (_, f, _, n) => f -> n }
    val epochsAfter =
      if (results.isEmpty) committed.epochsThrough
      else committed.epochsThrough ++
        fresh.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    if (results.nonEmpty)
      ShardManifest.write(fs, d, newFiles, epochsAfter)

    // GC (best-effort, all invisible to manifest-planned readers):
    //  - consumed + stale epoch files;
    //  - committed-pattern files the pointer does not reference, EXCEPT
    //    the generation replaced THIS pass — it gets one compaction
    //    cycle of grace so a reader that planned against the old
    //    pointer can finish its scan (the next pass, including a no-op
    //    one, collects it);
    //  - dead compact temps + a stranded manifest temp from a crashed
    //    pass (the current pass's temps were just renamed away).
    val grace = replaced.toSet
    (fresh ++ stale).foreach { case (_, _, p) => fs.delete(p, false) }
    fs.listStatus(d).filter(_.isFile).map(_.getPath)
      .filter { p =>
        val n = p.getName
        ShardManifest.shardOf(n).isDefined &&
          !newFiles.contains(n) && !grace(n)
      }
      .foreach(p => fs.delete(p, false))
    fs.delete(new HPath(d, ShardManifest.Name + ".tmp"), false)
    val tmpDir = new HPath(d, "_tmp")
    if (fs.exists(tmpDir))
      fs.listStatus(tmpDir).filter(_.isFile).map(_.getPath)
        .filter { p =>
          p.getName match {
            // dead compact temps: the current pass's were just renamed
            // away, so anything left is a crashed pass's litter
            case n if n.startsWith("compact-") => true
            // crashed landEpoch temps: collectable once their epoch is
            // at-or-below the shard's consumed watermark — the landing
            // contract (monotone epoch ids per shard) means a temp for
            // a folded epoch can never belong to an in-flight land,
            // while a FRESH epoch's temp might (its re-land publishes,
            // compact folds it, and the litter becomes stale next pass)
            case LandTmp(s, e) =>
              e.toLong <= epochsAfter.getOrElse(s.toLong, -1L)
            case _ => false
          }
        }
        .foreach(p => fs.delete(p, false))

    CompactStats(results.size, fresh.size,
      results.map(_._4).sum)
  }

  /** Stream-copy `t.inputs` into the attempt's temp path, returning the
    * row (newline) count. Pure byte I/O — no UTF-8 decode, no parsing;
    * a missing final newline on an input (hand-landed file) is repaired
    * so the concatenation cannot glue two rows together.
    */
  private def rewrite(fs: FileSystem, tmp: HPath, t: ShardTask): Long = {
    fs.mkdirs(tmp.getParent)
    val out = fs.create(tmp, true)
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
    *
    * LANDING CONTRACT: per shard, epoch ids must be landed in monotone
    * increasing order (re-landing an already-compacted epoch id is
    * allowed — that's the crash re-delivery case and is GC'd as stale).
    * The streaming sink satisfies this by construction (checkpointed
    * monotone epoch ids); an external ingester that lands a LOWER
    * epoch id after a higher one was compacted would see it discarded
    * as stale.
    */
  def landEpoch(df: DataFrame, dir: String, epoch: Long,
                nShards: Int): Unit = {
    val conf = new SerializableHadoopConf(
      df.sparkSession.sessionState.newHadoopConf())
    // Two-phase like compact() itself: tasks only write _tmp files and
    // return the rename plan; the DRIVER publishes after the whole job
    // succeeds. Renaming inside the task (the pre-r20 shape) made a
    // permanently-failed job leave a PARTIAL epoch visible — the next
    // compact would fold it as if complete and advance the watermark,
    // after which the true re-land of the full epoch is discarded as
    // stale, permanently losing the missing shards' rows. The residual
    // window (driver dies mid-publish) matches the streaming sink's
    // own epoch-commit window; crashed tasks' temps are collected by
    // compact's GC once their epoch falls at-or-below the watermark.
    val planned: Array[(String, String)] = df
      .select(col("shard").cast("long"), col("pos").cast("long"),
        col("line"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "pos")
      .rdd.mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val (fs, d) = ShardFs.resolve(dir, conf.value)
          val tmpDir = new HPath(d, "_tmp")
          fs.mkdirs(tmpDir)
          val attempt = TaskContext.get().taskAttemptId()
          val out = Seq.newBuilder[(String, String)]
          var cur = -1L
          var w: BufferedWriter = null
          var tmp: HPath = null
          var name: String = null
          def closeShard(): Unit = if (w != null) {
            w.close()
            out += ((tmp.toString, name))
            w = null
          }
          it.foreach { r =>
            val sh = r.getLong(0)
            if (sh != cur) {
              closeShard()
              name = f"shard-$sh%05d-epoch-$epoch.jsonl"
              tmp = new HPath(tmpDir, s"land-$attempt-$name")
              // overwrite=true: a retried task rewrites its own temp
              w = new BufferedWriter(new OutputStreamWriter(
                fs.create(tmp, true), StandardCharsets.UTF_8))
              cur = sh
            }
            w.write(r.getString(2))
            w.write('\n')
          }
          closeShard()
          out.result().iterator
        }
      }.collect()
    val (fs, d) = ShardFs.resolve(dir, conf.value)
    planned.foreach { case (tmp, fin) =>
      ShardFs.renameOver(fs, new HPath(tmp), new HPath(d, fin))
    }
  }
}

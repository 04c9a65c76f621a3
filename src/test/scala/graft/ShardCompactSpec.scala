package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{CorpusShards, ShardCompact, ShardStats}

/** Compaction of the graft-shards store: epoch landing files fold into
  * one next-generation file per shard behind an atomic `_SHARDS.json`
  * pointer flip, watermark-guarded so no crash window can double-fold
  * an epoch.
  */
class ShardCompactSpec extends AnyFunSuite {

  private val spark = SparkSessionHelper.spark

  private def corpus() =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id", "concat(cast(doc_id as string),':',md5(text)) AS line")

  private def landAll(dir: String, epochs: Seq[Long], nShards: Int = 8): Unit =
    epochs.foreach { e =>
      ShardCompact.landEpoch(
        CorpusShards.layout(corpus().where(s"doc_id % 4 = $e"), nShards),
        dir, e, nShards)
    }

  private def files(dir: String): Set[String] =
    Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString)
      .filter(f => f.startsWith("shard-") && !f.endsWith(".crc"))
      .toSet

  private def readBack(dir: String): Seq[(Long, Long, String)] =
    spark.read.format("graft-shards").option("path", dir).load()
      .orderBy("shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq

  /** Expected sealed layout: within a shard, (epoch, hk, doc_id) order. */
  private def expected(epochs: Seq[Long], nShards: Int = 8)
      : Seq[(Long, Long, String)] = {
    val rows = epochs.flatMap { e =>
      CorpusShards.layout(corpus().where(s"doc_id % 4 = $e"), nShards)
        .orderBy("shard", "pos").collect()
        .map(r => (r.getLong(0), e, r.getLong(1), r.getString(2)))
    }
    rows.groupBy(_._1).toSeq.flatMap { case (shard, rs) =>
      rs.sortBy(t => (t._2, t._3)).zipWithIndex
        .map { case ((_, _, _, line), i) => (shard, i + 1L, line) }
    }.sortBy(t => (t._1, t._2))
  }

  test("compaction seals epoch files into one gen file per shard") {
    val out = Files.createTempDirectory("graft_cp_seal").toString
    landAll(out, Seq(0L, 1L, 2L, 3L))
    // pre-compact: epoch files only; the batch face plans from the
    // (absent) manifest -> directory fallback admits no epoch files
    val landed = files(out)
    assert(landed.forall(_.matches("shard-\\d{5}-epoch-\\d\\.jsonl")))
    assert(readBack(out).isEmpty)
    // occupancy from the layout itself — sf0.001 may leave some
    // (shard, epoch) cells (or whole shards) empty
    val occupiedShards = expected(Seq(0L, 1L, 2L, 3L)).map(_._1).distinct
    val stats = ShardCompact.compact(spark, out)
    assert(stats.shards == occupiedShards.size)
    assert(stats.epochFiles == landed.size)
    // post-compact: one gen-1 file per occupied shard, zero epoch litter
    assert(files(out) ==
      occupiedShards.map(s => f"shard-$s%05d-gen-1.jsonl").toSet)
    assert(readBack(out) == expected(Seq(0L, 1L, 2L, 3L)))
    // the manifest counts every row of the sealed store
    val manifest = new String(
      Files.readAllBytes(Paths.get(out, "_SHARDS.json")))
    val total = corpus().count()
    assert(stats.rows == total)
    assert(manifest.contains("\"_epochs\""), manifest)
    // the zero-scan audit agrees with an actual read on both channels
    val audit = ShardStats.audit(spark, out)
    val byShard = readBack(out).groupBy(_._1)
    assert(audit.map(t => t._1 -> t._2).toMap ==
      byShard.view.mapValues(_.size.toLong).toMap)
    audit.foreach { case (sh, _, bytes) =>
      assert(bytes ==
        byShard(sh).map(_._3.getBytes("UTF-8").length + 1L).sum)
    }
    // the sealed (gen-suffixed) store still reports one shard key per
    // file, so a shard-keyed aggregation over it runs with NO exchange
    // — the exchange-free claim holds across compaction, not just for
    // batch-written plain files (pinned for the same reason as the
    // read-face test: a regression here re-shuffles the corpus at
    // 100 TB)
    val agg = spark.read.format("graft-shards").option("path", out).load()
      .groupBy("shard").count()
    val aPlan = agg.queryExecution.executedPlan.toString
    assert(!aPlan.contains("Exchange"), aPlan)
    assert(agg.collect().map(r => (r.getLong(0), r.getLong(1))).toMap ==
      byShard.view.mapValues(_.size.toLong).toMap)
  }

  test("incremental compaction = one-shot compaction, via generations") {
    val once = Files.createTempDirectory("graft_cp_once").toString
    landAll(once, Seq(0L, 1L, 2L, 3L))
    ShardCompact.compact(spark, once)
    val twice = Files.createTempDirectory("graft_cp_twice").toString
    landAll(twice, Seq(0L, 1L))
    ShardCompact.compact(spark, twice)
    assert(readBack(twice) == expected(Seq(0L, 1L)))
    landAll(twice, Seq(2L, 3L))
    ShardCompact.compact(spark, twice)
    // same sealed content; shards touched by the second wave are one
    // generation later, shards only the first wave reached stay gen-1
    assert(readBack(twice) == readBack(once))
    val wave2Shards = expected(Seq(2L, 3L)).map(_._1).distinct.toSet
    // replaced gen-1 files get one compaction cycle of grace (a reader
    // planned on the old pointer can finish its scan), so both
    // generations are on disk right after the flip...
    wave2Shards.foreach { s =>
      assert(files(twice).contains(f"shard-$s%05d-gen-1.jsonl"))
      assert(files(twice).contains(f"shard-$s%05d-gen-2.jsonl"))
    }
    // ...and the NEXT pass (even a no-op) collects them
    ShardCompact.compact(spark, twice)
    files(twice).foreach { f =>
      val s = f.slice(6, 11).toLong
      assert(f == f"shard-$s%05d-gen-${if (wave2Shards(s)) 2 else 1}.jsonl", f)
    }
    assert(readBack(twice) == readBack(once))
  }

  test("stale epochs and orphan gens from a crashed pass are inert") {
    val out = Files.createTempDirectory("graft_cp_crash").toString
    landAll(out, Seq(0L, 1L))
    ShardCompact.compact(spark, out)
    val sealedRows = readBack(out)
    // crash simulation, both windows at once:
    //  - a consumed epoch file GC missed (epoch 0 <= watermark 1)
    //  - a would-be-next-gen file whose manifest flip never happened
    landAll(out, Seq(0L))
    Files.writeString(Paths.get(out, "shard-00000-gen-9.jsonl"),
      "ghost-row\n")
    // readers plan from the pointer: both artifacts invisible
    assert(readBack(out) == sealedRows)
    // the next pass deletes both instead of folding or adopting them
    val stats = ShardCompact.compact(spark, out)
    assert(stats.shards == 0 && stats.epochFiles == 0)
    assert(readBack(out) == sealedRows)
    assert(!files(out).exists(_.contains("epoch")))
    assert(!files(out).contains("shard-00000-gen-9.jsonl"))
    // and genuinely new epochs still fold on top
    landAll(out, Seq(2L, 3L))
    ShardCompact.compact(spark, out)
    assert(readBack(out) == expected(Seq(0L, 1L, 2L, 3L)))
  }

  /** (shard, pos, line) layout of epoch class `c` at 8 shards, cached. */
  private lazy val classLayout: Map[Long, Seq[(Long, Long, String)]] =
    (0L to 3L).map { c =>
      c -> CorpusShards.layout(corpus().where(s"doc_id % 4 = $c"), 8)
        .orderBy("shard", "pos").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    }.toMap

  test("random land/compact/litter schedules always read as the sealed " +
       "epoch order (3 seeds)") {
    // Stateful property: whatever interleaving of epoch landings,
    // compaction passes, and crash litter (stale epoch re-drops, orphan
    // gen files) occurs, a batch read equals the reference fold — per
    // shard, all landed epochs' rows in (epoch, pos) order, counting
    // only epochs that a compact() pass has sealed.
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val out = Files.createTempDirectory(s"graft_cp_prop$seed").toString
      var landed = Vector.empty[Long] // epochs landed, in landing order
      var compactedThrough = -1 // index into `landed` of last sealed epoch
      var nextEpoch = 0L
      (1 to 10).foreach { _ =>
        rnd.nextInt(4) match {
          case 0 | 1 => // land the next epoch wave
            ShardCompact.landEpoch(
              CorpusShards.layout(
                corpus().where(s"doc_id % 4 = ${nextEpoch % 4}"), 8),
              out, nextEpoch, 8)
            landed :+= nextEpoch
            nextEpoch += 1
          case 2 => // compact (seals everything landed so far)
            ShardCompact.compact(spark, out)
            compactedThrough = landed.size - 1
          case 3 => // crash litter: re-drop a consumed epoch + orphan gen
            if (compactedThrough >= 0) {
              val stale = landed(rnd.nextInt(compactedThrough + 1))
              ShardCompact.landEpoch(
                CorpusShards.layout(
                  corpus().where(s"doc_id % 4 = ${stale % 4}"), 8),
                out, stale, 8)
              Files.writeString(Paths.get(out, "shard-00000-gen-77.jsonl"),
                "ghost\n")
            }
        }
        // invariant after EVERY op: the batch face reads exactly the
        // sealed prefix (stale re-drops and orphans are invisible;
        // unsealed epochs are not part of the batch contract)
        val vis = landed.take(compactedThrough + 1)
        val exp = vis.zipWithIndex.flatMap { case (e, ord) =>
          classLayout(e % 4).map { case (sh, pos, line) =>
            (sh, ord, pos, line)
          }
        }.groupBy(_._1).toSeq.flatMap { case (shard, rs) =>
          rs.sortBy(t => (t._2, t._3)).zipWithIndex
            .map { case ((_, _, _, line), i) => (shard, i + 1L, line) }
        }.sortBy(t => (t._1, t._2))
        assert(readBack(out) == exp, s"seed $seed after ${landed.size} lands")
      }
      // final seal: everything lands in the read
      ShardCompact.compact(spark, out)
      compactedThrough = landed.size - 1
      assert(readBack(out).size ==
        landed.map(e => classLayout(e % 4).size).sum)
    }
  }

  test("a streamed store seals into a batch-readable corpus") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("graft_cp_stream").toString
    val ckpt = Files.createTempDirectory("graft_cp_stream_ck").toString
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "line")
      .selectExpr("cast(doc_id % 4 as bigint) AS shard",
        "doc_id AS pos", "line")
      .writeStream.format("graft-shards")
      .option("path", out).option("checkpointLocation", ckpt)
      .start()
    try {
      in.addData((1L, "a"), (2L, "b"), (5L, "c"))
      q.processAllAvailable()
      in.addData((3L, "d"), (9L, "e"))
      q.processAllAvailable()
    } finally q.stop()
    assert(readBack(out).isEmpty) // landing files are not the corpus yet
    ShardCompact.compact(spark, out)
    val got = readBack(out)
    // multiset of lines survives; epoch order is preserved per shard
    // (1:"a" landed in epoch 0, 5:"c" in the same epoch before 9:"e")
    assert(got.map(_._3).sorted == Seq("a", "b", "c", "d", "e"))
    val shard1 = got.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    assert(shard1 == Seq("a", "c", "e"), got)
  }
}

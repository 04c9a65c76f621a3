package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.CorpusShards

/** The DSv2 "graft-shards" corpus sink: executor-written JSONL shards
  * with a deterministic, rerun-stable layout and a rename-on-commit
  * protocol (no partial data visible).
  */
class ShardSinkSpec extends AnyFunSuite {

  private val spark = SparkSessionHelper.spark

  private def corpus() = {
    val spark0 = spark
    import spark0.implicits._
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id", "to_json(struct(doc_id, lang, n_chars)) AS line")
  }

  private def readDir(dir: String): Map[String, Seq[String]] =
    Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("shard-"))
      .map(p => p.getFileName.toString ->
        Files.readAllLines(p).asScala.toSeq)
      .toMap

  test("shards partition the corpus exactly, in deterministic order") {
    val out = Files.createTempDirectory("graft_shards").toString
    CorpusShards.write(corpus(), out, 8)
    val byFile = readDir(out)
    assert(byFile.keySet.forall(_.matches("shard-\\d{5}\\.jsonl")))
    // every input line lands in exactly one shard
    val expected = corpus().select("line").collect().map(_.getString(0))
    val got = byFile.values.flatten.toSeq
    assert(got.sorted == expected.toSeq.sorted)
    assert(got.size == expected.length)
    // layout agrees with the declarative txt_shuffle_shard arithmetic:
    // within a shard, lines are ordered by (md5(doc_id), doc_id)
    val layout = CorpusShards.layout(corpus(), 8)
      .orderBy("shard", "pos").collect()
      .groupBy(_.getLong(0))
      .map { case (s, rows) =>
        f"shard-$s%05d.jsonl" -> rows.sortBy(_.getLong(1))
          .map(_.getString(2)).toSeq
      }
    assert(byFile == layout)
    // and the DSv2 read side reconstructs (shard, pos, line) exactly
    val rt = spark.read.format("graft-shards").option("path", out).load()
      .orderBy("shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val exp = CorpusShards.layout(corpus(), 8)
      .orderBy("shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(rt == exp)
  }

  test("streaming write lands each epoch's shards atomically") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("graft_shards_st").toString
    val ckpt = Files.createTempDirectory("graft_shards_ck").toString
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
      in.addData((3L, "d"))
      q.processAllAvailable()
      val files = readDir(out) // epoch-suffixed names
      assert(files.keySet.forall(_.matches("shard-\\d{5}-epoch-\\d+\\.jsonl")),
        files.keySet)
      assert(files.values.flatten.toSeq.sorted == Seq("a", "b", "c", "d"))
      // shard routing is stable: doc 1 and 5 share shard 1
      val s1 = files.collect {
        case (f, lines) if f.startsWith("shard-00001") => lines
      }.flatten.toSeq.sorted
      assert(s1 == Seq("a", "c"), files)
    } finally q.stop()
  }

  test("rows for ONE shard spread across many input partitions all " +
      "land — the Write declares its clustering+ordering, so Spark " +
      "inserts the shuffle instead of trusting callers to pre-partition") {
    // final file names are pure functions of the shard id: before the
    // distribution declaration, two tasks holding rows for the same
    // shard produced identical names and commit's renameOver silently
    // kept one task's file
    val out = Files.createTempDirectory("graft_shards_dist").toString
    CorpusShards.layout(corpus(), 8)
      .repartition(4) // adversarial: round-robin, every shard split
      .write.format("graft-shards").option("path", out)
      .mode(org.apache.spark.sql.SaveMode.Overwrite).save()
    val expected = corpus().select("line").collect()
      .map(_.getString(0)).toSeq.sorted
    assert(readDir(out).values.flatten.toSeq.sorted == expected)
    // byte-identical to the pre-clustered writer: the declared
    // in-partition (shard, pos) sort restores the batch layout too
    val out2 = Files.createTempDirectory("graft_shards_dist2").toString
    CorpusShards.write(corpus(), out2, 8)
    assert(readDir(out) == readDir(out2))
    // streaming face: same-shard rows in different stream partitions
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stOut = Files.createTempDirectory("graft_shards_dist_st").toString
    val ckpt = Files.createTempDirectory("graft_shards_dist_ck").toString
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "line")
      .repartition(4)
      .selectExpr("cast(doc_id % 2 as bigint) AS shard",
        "doc_id AS pos", "line")
      .writeStream.format("graft-shards")
      .option("path", stOut).option("checkpointLocation", ckpt)
      .start()
    try {
      in.addData((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"),
        (6L, "f"), (7L, "g"), (8L, "h"))
      q.processAllAvailable()
      assert(readDir(stOut).values.flatten.toSeq.sorted ==
        Seq("a", "b", "c", "d", "e", "f", "g", "h"),
        readDir(stOut))
    } finally q.stop()
  }

  test("an aborted write leaves the previous corpus visible and no litter") {
    import org.apache.spark.sql.functions._
    val out = Files.createTempDirectory("graft_shards_ab").toString
    CorpusShards.write(corpus(), out, 4)
    val before = readDir(out)
    val manifestBefore = new String(
      Files.readAllBytes(Paths.get(out, "_SHARDS.json")))
    assert(before.nonEmpty)
    // poison exactly one row so a writer task throws mid-write; the
    // overwrite job must abort WITHOUT truncating (truncate happens in
    // commit) and without renaming any temp file into place
    val victim = corpus().select("doc_id").orderBy("doc_id").head.getLong(0)
    val poisoned = corpus().withColumn("line",
      when(col("doc_id") === victim,
        raise_error(lit("boom")).cast("string"))
        .otherwise(col("line")))
    intercept[Exception] { CorpusShards.write(poisoned, out, 4) }
    // the committed corpus and its manifest are untouched
    assert(readDir(out) == before)
    assert(new String(Files.readAllBytes(Paths.get(out, "_SHARDS.json")))
      == manifestBefore)
    // and the temp dir drains: task-level abort deletes both reported
    // and still-open temp files, job-level abort the committed ones.
    // killed concurrent tasks clean up asynchronously — poll briefly
    val tmp = Paths.get(out, "_tmp")
    def leftovers() =
      if (!Files.exists(tmp)) Seq.empty
      else Files.list(tmp).iterator().asScala
        .map(_.getFileName.toString).filterNot(_.startsWith(".")).toSeq
    val deadline = System.nanoTime() + 10_000_000_000L
    while (leftovers().nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(100)
    assert(leftovers().isEmpty, leftovers())
  }

  test("a failed streaming epoch lands nothing; the replay lands it all") {
    import org.apache.spark.sql.functions._
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("graft_shards_stab").toString
    val ckpt = Files.createTempDirectory("graft_shards_stck").toString
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    // `armed` is captured at plan time, so a restart can disarm the
    // poison and let the replayed epoch succeed — the streaming analog
    // of a transient task failure spanning a job restart
    def start(armed: Boolean) = {
      val base = in.toDF().toDF("doc_id", "line")
        .selectExpr("cast(doc_id % 4 as bigint) AS shard",
          "doc_id AS pos", "line")
      val df = if (armed) base.withColumn("line",
        when(col("line") === "POISON",
          raise_error(lit("boom")).cast("string"))
          .otherwise(col("line"))) else base
      df.writeStream.format("graft-shards")
        .option("path", out).option("checkpointLocation", ckpt)
        .start()
    }
    val q1 = start(armed = true)
    try {
      in.addData((1L, "a"), (2L, "b"))
      q1.processAllAvailable()
      assert(readDir(out).values.flatten.toSeq.sorted == Seq("a", "b"))
      in.addData((3L, "POISON"), (5L, "c"))
      intercept[Exception] { q1.processAllAvailable() }
    } finally q1.stop()
    // the failed epoch left nothing visible: only epoch-0 files exist
    val afterFail = readDir(out)
    assert(afterFail.keySet.forall(_.endsWith("-epoch-0.jsonl")), afterFail)
    assert(afterFail.values.flatten.toSeq.sorted == Seq("a", "b"))
    // restart from the checkpoint replays the failed batch; disarmed,
    // it lands atomically (the sink's overwrite-own-files temp protocol
    // makes the epoch retry exactly-once), and new data follows
    in.addData((6L, "d"))
    val q2 = start(armed = false)
    try q2.processAllAvailable() finally q2.stop()
    val recovered = readDir(out)
    assert(recovered.values.flatten.toSeq.sorted ==
      Seq("POISON", "a", "b", "c", "d"), recovered)
  }

  test("rewrites are byte-identical and the manifest counts rows") {
    val a = Files.createTempDirectory("graft_shards_a").toString
    val b = Files.createTempDirectory("graft_shards_b").toString
    CorpusShards.write(corpus(), a, 4)
    CorpusShards.write(corpus(), b, 4)
    assert(readDir(a) == readDir(b))
    val manifest = new String(
      Files.readAllBytes(Paths.get(a, "_SHARDS.json")))
    readDir(a).foreach { case (f, lines) =>
      assert(manifest.contains(s""""$f": ${lines.size}"""), manifest)
    }
    // overwrite truncates: a second write with fewer shards leaves no
    // stale files from the first layout
    CorpusShards.write(corpus(), a, 2)
    assert(readDir(a).keySet ==
      Set("shard-00000.jsonl", "shard-00001.jsonl"))
  }

  test("read face prunes columns, pushes shard filters, reports partitioning") {
    val out = Files.createTempDirectory("graft_shards_read").toString
    CorpusShards.write(corpus(), out, 8)
    def ds = spark.read.format("graft-shards").option("path", out).load()
    val full = ds.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq

    // column pruning reaches the scan: a shard/pos projection reads no
    // line payloads (the pruned reader counts newlines byte-wise)
    val pruned = ds.select("shard", "pos")
    val pPlan = pruned.queryExecution.executedPlan.toString
    assert(pPlan.contains("struct<shard:bigint,pos:bigint>"), pPlan)
    assert(pruned.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      == full.map(t => (t._1, t._2)))

    // shard filters drop whole files at planning: one input partition
    // (= one RDD partition) per surviving shard file
    val one = ds.filter("shard = 3")
    assert(one.rdd.getNumPartitions == 1)
    assert(one.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
      == full.filter(_._1 == 3L))
    val range = ds.filter("shard >= 2 AND shard < 5")
    assert(range.rdd.getNumPartitions == 3)
    assert(range.count() == full.count(t => t._1 >= 2 && t._1 < 5))

    // one shard key per file -> KeyGroupedPartitioning: a shard-keyed
    // aggregation runs with NO exchange (storage-partitioned execution)
    val agg = ds.groupBy("shard").count()
    val aPlan = agg.queryExecution.executedPlan.toString
    assert(!aPlan.contains("Exchange"), aPlan)
    val got = agg.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val exp = full.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(got == exp)
  }

  test("batch append into a committed store is refused, store intact") {
    // A non-truncate batch commit would rewrite _SHARDS.json to list
    // only its own files (hiding prior shards from readers, priming
    // the next compact to GC them) and rename over same-shard data
    // files — so the sink refuses, mirroring the compact refusal
    // guard. Overwrite and the streaming-epoch path stay the two
    // supported write modes.
    val out = Files.createTempDirectory("graft_shards_app").toString
    CorpusShards.write(corpus(), out, 8)
    val before = readDir(out)
    val manifestBefore = new String(
      Files.readAllBytes(Paths.get(out, "_SHARDS.json")))
    val ex = intercept[java.io.IOException] {
      CorpusShards.layout(corpus(), 8)
        .write.format("graft-shards").option("path", out)
        .mode(org.apache.spark.sql.SaveMode.Append).save()
    }
    assert(ex.getMessage.contains("batch append"), ex.getMessage)
    // nothing moved: same shard files, same manifest, no temp litter
    assert(readDir(out) == before)
    assert(new String(Files.readAllBytes(Paths.get(out, "_SHARDS.json")))
      == manifestBefore)
    val tmp = Paths.get(out, "_tmp")
    assert(!Files.exists(tmp) ||
      !Files.list(tmp).iterator().hasNext)
    // a fresh (manifest-less, file-less) dir still accepts append mode
    val fresh = Files.createTempDirectory("graft_shards_app2").toString
    CorpusShards.layout(corpus(), 8)
      .repartition(8, org.apache.spark.sql.functions.col("shard"))
      .sortWithinPartitions("shard", "pos")
      .write.format("graft-shards").option("path", fresh)
      .mode(org.apache.spark.sql.SaveMode.Append).save()
    assert(readDir(fresh) == before)
  }

  test("ungrouped COUNT(*) is answered from the manifest, not the files") {
    val out = Files.createTempDirectory("graft_shards_cnt").toString
    CorpusShards.write(corpus(), out, 8)
    def ds = spark.read.format("graft-shards").option("path", out).load()
    val trueTotal = ds.collect().length.toLong
    assert(ds.count() == trueTotal)
    assert(ds.filter("shard >= 2 AND shard < 5").count() ==
      ds.collect().count(r => r.getLong(0) >= 2 && r.getLong(0) < 5))
    // the proof it never opens a shard file: inflate one manifest entry
    // and watch count() follow the catalog while collect() reads truth
    val mp = Paths.get(out, "_SHARDS.json")
    val manifest = new String(Files.readAllBytes(mp))
    val firstCount = ": (\\d+)".r.findFirstMatchIn(manifest)
      .get.group(1).toLong
    Files.write(mp,
      manifest.replaceFirst(": (\\d+)", ": 100$1").getBytes)
    // the out-of-band edit invalidates the local FS's checksum shadow
    Files.deleteIfExists(Paths.get(out, "._SHARDS.json.crc"))
    assert(ds.collect().length.toLong == trueTotal)
    assert(ds.count() ==
      trueTotal - firstCount + s"100$firstCount".toLong)
    // a residual non-shard predicate disables the pushdown: Spark only
    // pushes aggregates when every filter was absorbed by the scan
    assert(ds.filter("pos >= 1").count() == trueTotal)
  }
}

package graft.run

import org.apache.spark.sql.SparkSession
import graft.Engine
import graft.operators.{Dedup, Multimodal, Similarity, StoreFiles}

/** Delta-chain serve-cost probe: how much does READING a store
  * degrade as its `advance --delta` chain deepens? The write side is
  * FoldAmp's flat-amp win; this measures what that win costs the
  * readers — the number that decides the compact cadence and the
  * [[StoreCtl.ChainWarnKey]] defaults (r18 verdict item 1; findings
  * in BENCHING.md's chain-depth section).
  *
  * Per kind: build gen-0 from batch 0 of `depth` equal hash batches,
  * then `advance --delta` the rest, timing the kind's REAL serve
  * read at checkpoint depths (1, 6, 12, `depth`):
  *
  *   - cluster/embed: `Dedup.storeAssignment` (the last-writer-wins
  *     min-by-depth agg over the chain) + `Dedup.storeGrp` — the two
  *     relations every stored-model consumer resolves;
  *   - phash: `storeGrp` + the banded index union (`readRelChain
  *     bands`) — the streaming probe's static side;
  *   - ivfpq: `IvfPqStore.load` + a full `codes` chain count — the
  *     serve path's ADC input.
  *
  * Each timing is min-of-2 on a warm session (the chain cost is
  * driver planning + k-way-union scan; caching would hide exactly
  * what we measure). The final row times `compact` sealing the whole
  * chain, and re-times the serve read at depth 1 after it — the
  * before/after a nightly compact buys.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
  *     sbt "runMain graft.run.ChainDepth [depth]"
  */
object ChainDepth {

  private def timeMin2(body: => Long): (Double, Long) = {
    def once(): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = body
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val a = once(); val b = once()
    (math.min(a._1, b._1), b._2)
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")
    val depth = args.headOption.map(_.toInt).getOrElse(24)
    val marks = Seq(1, 6, 12, depth).distinct.filter(_ <= depth).sorted
    val spark = Engine.session("graft-chaindepth")
    val base = new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      s"graft_chaindepth_p${ProcessHandle.current().pid()}")
    graft.operators.StoreFiles.deleteTree(base)
    def fail(msg: String): Nothing = {
      System.err.println(msg)
      // a failed probe must not strand its multi-GB scratch tree: the
      // next run's pid-suffixed path is a DIFFERENT dir, so nothing
      // else ever cleans this one
      graft.operators.StoreFiles.deleteTree(base)
      spark.stop(); sys.exit(1)
    }
    def runOrDie(cmd: Seq[String]): Unit =
      StoreCtl.run(spark, cmd).left.foreach(e => fail(s"$cmd: $e"))
    // the guard exists to stop exactly the chains this probe builds
    spark.conf.set(StoreCtl.ChainWarnKey, (depth + 1).toString)
    spark.conf.set(StoreCtl.ChainMaxKey, (depth + 1).toString)

    val kinds = Seq(
      ("cluster", "doc_id"),
      ("embed", "vec_id"),
      ("ivfpq", "vec_id"),
      ("phash", "doc_id"))

    def serveRead(kind: String, idCol: String, root: String)
        : (Double, Long) = {
      val served = StoreFiles.serve(root)
        .fold(e => fail(s"serve $root: $e"), identity)
      kind match {
        case "cluster" | "embed" => timeMin2 {
          Dedup.storeAssignment(spark, served, idCol).count() +
            Dedup.storeGrp(spark, served, idCol).count()
        }
        case "phash" => timeMin2 {
          Dedup.storeGrp(spark, served, idCol).count() +
            StoreFiles.readRelChain(spark, served, "bands").count()
        }
        case "ivfpq" => timeMin2 {
          Similarity.IvfPqStore.load(spark, served).codes.count()
        }
      }
    }

    val out = kinds.map { case (kind, idCol) =>
      val root = new java.io.File(base, kind)
      root.mkdirs()
      runOrDie(Seq("build", kind, dir, s"$root/gen-0",
        s"$idCol % $depth = 0"))
      runOrDie(Seq("flip", root.toString, "gen-0"))
      val readAt = scala.collection.mutable.Map[Int, (Double, Long)]()
      readAt(1) = serveRead(kind, idCol, root.toString)
      (1 until depth).foreach { k =>
        runOrDie(Seq("advance", "--delta", kind, dir, root.toString,
          s"$idCol % $depth = $k"))
        val d = k + 1
        if (marks.contains(d))
          readAt(d) = serveRead(kind, idCol, root.toString)
      }
      val tCompact = {
        val t0 = System.nanoTime()
        runOrDie(Seq("compact", kind, root.toString))
        (System.nanoTime() - t0) / 1e9
      }
      val sealedRead = serveRead(kind, idCol, root.toString)
      val reads = marks.map(d => s""""$d":${
        "%.3f".format(readAt(d)._1)}""").mkString(",")
      s""""$kind":{"serve_s_by_depth":{$reads},""" +
        s""""rows":${readAt(marks.last)._2},""" +
        s""""compact_s":${"%.3f".format(tCompact)},""" +
        s""""sealed_serve_s":${"%.3f".format(sealedRead._1)}}"""
    }
    println(s"""{"metric":"chain_depth","depth":$depth,"sf_dir":"$dir",${
      out.mkString(",")}}""")
    graft.operators.StoreFiles.deleteTree(base)
    spark.stop()
  }
}

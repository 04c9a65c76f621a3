package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{StreamDoc, Streams}
import graft.operators.{Dedup, StoreFiles}
import graft.run.StoreCtl

/** The streaming pointer-advance CONTRACT (r18 verdict item 4): a
  * served-store stream resolves the pointed generation's chain ONCE,
  * at stream construction, over immutable generations — so an
  * `advance` landing mid-stream changes NOTHING the running stream
  * emits (its frozen chain stays readable: generations are immutable
  * and gc's grace window keeps the displaced chain alive), and
  * serving the advanced store requires a STREAM RESTART. This is a
  * feature, not a gap: a micro-batch pipeline whose static side
  * mutated between batches would emit pairs no single store version
  * justifies, and restart-to-advance is exactly the blue/green
  * discipline the pointer file exists for.
  */
class PointerAdvanceContractSpec extends AnyFunSuite {

  private val spark = SparkSessionHelper.spark
  private val dir = "/root/testdata/sf0.001"
  private val Tick = 1000000000L

  test("a served-store stream freezes the pointed chain at " +
      "construction: advance mid-stream changes nothing (gc grace " +
      "keeps the old chain readable), a restart serves the new chain") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      s"graft_ptradv_p${ProcessHandle.current().pid()}").toString
    def rec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rec)
      f.delete()
    }
    rec(new java.io.File(root)); new java.io.File(root).mkdirs()
    assert(StoreCtl.run(spark, Seq("build", "cluster", dir,
      s"$root/gen-0", Dedup.oldPred)).isRight)
    assert(StoreCtl.run(spark, Seq("flip", root, "gen-0")).isRight)
    // the doc the mid-stream advance will add to the store: streaming
    // its text again after the advance would jaccard-1-match its own
    // stored copy IF the stream saw the new generation
    val x = Engine.table(spark, dir, "documents")
      .where(s"NOT (${Dedup.oldPred}) AND length(text) > 20")
      .orderBy("doc_id").select("doc_id", "text").head()
    val (xId, xText) = (x.getLong(0), x.getString(1))

    val served0 = StoreFiles.serve(root).toOption.get
    assert(served0.endsWith("gen-0"), served0)
    def owners(sink: String, docId: Long): Set[Long] =
      spark.table(sink).where(s"doc_id = $docId")
        .select("owner_id").collect().map(_.getLong(0)).toSet
    val wasParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val in = MemoryStream[StreamDoc]
      val q = Streams.storeNearDupStream(in.toDF(), served0)
        .writeStream.format("memory").queryName("ptradv_sink")
        .outputMode("append").start()
      try {
        in.addData(StreamDoc(900001L, Tick, xText))
        q.processAllAvailable()
        val pre = owners("ptradv_sink", 900001L)
        assert(!pre(xId), "fixture broken: x already stored in gen-0")
        // ADVANCE mid-stream: x joins the store, pointer walks on
        assert(StoreCtl.run(spark, Seq("advance", "--delta", "cluster",
          dir, root, s"doc_id = $xId")).isRight)
        assert(StoreFiles.serve(root).exists(_.endsWith("gen-1")))
        // gc's grace keeps the running stream's frozen chain readable
        assert(StoreCtl.run(spark, Seq("gc", root)).isRight)
        assert(new java.io.File(s"$root/gen-0/manifest.json").exists,
          "gc collected the displaced generation under a live reader")
        in.addData(StreamDoc(900002L, 2 * Tick, xText))
        q.processAllAvailable()
        val post = owners("ptradv_sink", 900002L)
        assert(post == pre,
          s"mid-stream advance leaked into a running stream: $post vs $pre")
      } finally q.stop()
      // RESTART: a fresh stream resolves the advanced pointer and
      // flags x's stored copy
      val served1 = StoreFiles.serve(root).toOption.get
      assert(served1.endsWith("gen-1"), served1)
      val in2 = MemoryStream[StreamDoc]
      val q2 = Streams.storeNearDupStream(in2.toDF(), served1)
        .writeStream.format("memory").queryName("ptradv_sink2")
        .outputMode("append").start()
      try {
        in2.addData(StreamDoc(900003L, Tick, xText))
        q2.processAllAvailable()
        val restarted = owners("ptradv_sink2", 900003L)
        assert(restarted(xId),
          s"a restarted stream did not serve the advanced chain: " +
            s"$restarted")
      } finally q2.stop()
    } finally
      spark.conf.set("spark.sql.shuffle.partitions", wasParts)
  }
}

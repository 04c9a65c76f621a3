package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, Path, PathFilter}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.InMemoryCheckpointFileManager

/** The replay harness's heap-backed CheckpointFileManager (r22) must
  * preserve every checkpoint semantic the streaming gates lean on —
  * atomic visibility, the no-overwrite create guard, hierarchical
  * list/exists/delete, and faithful byte round-trips with positioned
  * reads — and a streaming gate run under it must emit the SAME rows
  * as under Spark's default durable manager.
  */
class InMemoryCheckpointSpec extends AnyFunSuite {

  private def mgr(root: String) =
    new InMemoryCheckpointFileManager(new Path(root), new Configuration())

  private val all = new PathFilter { def accept(p: Path) = true }

  test("createAtomic is invisible until close, and cancel discards") {
    val m = mgr("/imck/t1")
    val p = new Path("/imck/t1/offsets/0")
    val out = m.createAtomic(p, overwriteIfPossible = false)
    out.write("v1".getBytes("UTF-8"))
    assert(!m.exists(p), "bytes visible before close")
    out.close()
    assert(m.exists(p))
    val in = m.open(p)
    val buf = new Array[Byte](2)
    in.readFully(0L, buf)
    assert(new String(buf, "UTF-8") == "v1")
    val out2 = m.createAtomic(new Path("/imck/t1/offsets/1"),
      overwriteIfPossible = false)
    out2.write("zz".getBytes("UTF-8"))
    out2.cancel()
    assert(!m.exists(new Path("/imck/t1/offsets/1")),
      "cancelled write became visible")
  }

  test("no-overwrite create throws FileAlreadyExists; overwrite wins") {
    val m = mgr("/imck/t2")
    val p = new Path("/imck/t2/commits/0")
    val a = m.createAtomic(p, overwriteIfPossible = false)
    a.write("a".getBytes); a.close()
    val b = m.createAtomic(p, overwriteIfPossible = false)
    b.write("b".getBytes)
    intercept[FileAlreadyExistsException](b.close())
    val c = m.createAtomic(p, overwriteIfPossible = true)
    c.write("c".getBytes); c.close()
    val buf = new Array[Byte](1)
    m.open(p).readFully(0L, buf)
    assert(buf(0) == 'c'.toByte)
  }

  test("list sees files and implicit child dirs; delete removes subtrees") {
    val m = mgr("/imck/t3")
    m.mkdirs(new Path("/imck/t3/state/0/0"))
    Seq("offsets/0", "offsets/1", "state/0/0/1.delta").foreach { f =>
      val o = m.createAtomic(new Path(s"/imck/t3/$f"), true)
      o.write(f.getBytes); o.close()
    }
    val names = m.list(new Path("/imck/t3/offsets"), all)
      .map(_.getPath.getName).sorted.toSeq
    assert(names == Seq("0", "1"))
    val rootKids = m.list(new Path("/imck/t3"), all)
    assert(rootKids.exists(s => s.isDirectory && s.getPath.getName == "state"))
    assert(rootKids.exists(s => s.isDirectory && s.getPath.getName == "offsets"))
    // scheme-insensitive addressing: file:/ and bare paths are one file
    assert(m.exists(new Path("file:/imck/t3/offsets/0")))
    m.delete(new Path("/imck/t3"))
    assert(!m.exists(new Path("/imck/t3/offsets/0")))
    assert(!m.exists(new Path("/imck/t3/state/0/0/1.delta")))
    intercept[java.io.FileNotFoundException](
      m.open(new Path("/imck/t3/offsets/0")))
  }

  test("a stateful streaming gate emits identical rows under the " +
      "in-memory and the default checkpoint managers") {
    val spark = SparkSessionHelper.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = (0L until 400L).map(i =>
      graft.streaming.Event(i, (i + 1) * 1000000000L, i % 7,
        if (i % 3 == 0) "view" else "click", i.toDouble))
    def run(useInMemory: Boolean): Seq[(Long, Long, Long)] = {
      val fmKey = "spark.sql.streaming.checkpointFileManagerClass"
      val was = spark.conf.getOption(fmKey)
      if (useInMemory)
        spark.conf.set(fmKey, classOf[InMemoryCheckpointFileManager].getName)
      else spark.conf.unset(fmKey)
      try {
        val in = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[graft.streaming.Event]
        val sink = s"imck_gate_${useInMemory}_${System.nanoTime()}"
        val q = graft.streaming.Streams
          .sessionize(in.toDS(), 5000000000L)
          .writeStream.format("memory").queryName(sink)
          .outputMode("append").start()
        try {
          evs.grouped(100).foreach { b =>
            in.addData(b); q.processAllAvailable()
          }
          in.addData(graft.streaming.Event(-1L,
            evs.map(_.ts).max + 30000000000L, -1L, "sentinel", 0.0))
          q.processAllAvailable()
          in.addData(graft.streaming.Event(-2L,
            evs.map(_.ts).max + 30000000000L, -1L, "sentinel", 0.0))
          q.processAllAvailable()
          val rows = spark.table(sink).filter("user_id >= 0")
            .selectExpr("user_id", "start_ns", "n_events")
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
            .sortBy(identity).toSeq
          spark.catalog.dropTempView(sink)
          rows
        } finally q.stop()
      } finally was match {
        case Some(v) => spark.conf.set(fmKey, v)
        case None    => spark.conf.unset(fmKey)
      }
    }
    val durable = run(useInMemory = false)
    val inMem = run(useInMemory = true)
    assert(durable.nonEmpty, "gate emitted nothing — vacuous comparison")
    assert(inMem == durable)
  }
}

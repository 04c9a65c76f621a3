package graft

/** Dev helper: per-MICRO-BATCH duration breakdown of one replay query —
  * the drill-down the job/stage channels can't give for the streaming
  * gates, whose wall cost is per-batch scheduling, not stage compute.
  * A StreamingQueryListener prints each batch's `durationMs` components
  * (triggerExecution = the whole batch; addBatch = the data-plane part;
  * queryPlanning / walCommit / commitOffsets / latestOffset = the
  * per-batch control-plane floor) plus state-store commit time, for a
  * warm run of the named query.
  * Usage: runMain graft.DevStreamProf <query> [sfDir] [reps]
  */
object DevStreamProf {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty || !SparkEntry.queries.contains(args(0))) {
      System.err.println(
        "usage: runMain graft.DevStreamProf <query> [sfDir] [reps]" +
          args.headOption.fold("")(n => s" — unknown query '$n'"))
      sys.exit(1)
    }
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 1
    val spark = Engine.session("stream-prof")
    val quiet = new java.util.concurrent.atomic.AtomicBoolean(true)
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit =
          if (!quiet.get()) println(s"-- stream start ${e.name}")
        override def onQueryProgress(e: QueryProgressEvent): Unit = {
          if (!quiet.get()) {
            val p = e.progress
            import scala.jdk.CollectionConverters._
            val d = p.durationMs.asScala.toSeq.sortBy(-_._2)
              .map { case (k, v) => s"$k=$v" }.mkString(" ")
            val st = p.stateOperators.map(o =>
              s"${o.operatorName}:commit=${o.commitTimeMs}ms rows=${o.numRowsTotal}")
              .mkString(" ")
            println(f"batch ${p.batchId}%3d rows ${p.numInputRows}%6d  $d  $st")
          }
        }
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      })
    // warm run: codegen + JIT + state-store provider init
    try SparkEntry.queries(name)(spark, dir).count()
    catch { case e: Throwable => println(s"warmup failed: $e") }
    spark.catalog.clearCache()
    quiet.set(false)
    (1 to reps).foreach { r =>
      println(s"== rep $r ==")
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      println(f"rep wall ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
      // listener events are async; drain before the next rep so lines
      // land under their own rep header
      Thread.sleep(500)
    }
    spark.stop()
  }
}

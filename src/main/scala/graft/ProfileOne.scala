package graft

/** Dev helper: per-STAGE executor-CPU breakdown of one named query —
  * the drill-down TimeOne's per-query totals can't give. Each completed
  * stage prints its id, task count, cumulative executor CPU, shuffle
  * write, and the head of its name (which encodes the call site).
  * Usage: runMain graft.ProfileOne <query> [sfDir]
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Engine.session("profile-one")
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[String]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        private val cpuByStage =
          new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val tm = te.taskMetrics
          if (tm != null) {
            val acc = cpuByStage.computeIfAbsent(te.stageId,
              _ => Array(0L, 0L, 0L))
            acc.synchronized {
              acc(0) += tm.executorCpuTime + tm.executorDeserializeCpuTime
              acc(1) += tm.shuffleWriteMetrics.bytesWritten
              acc(2) += 1
            }
            ()
          }
        }
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val info = sc.stageInfo
          val acc = cpuByStage.getOrDefault(info.stageId,
            Array(0L, 0L, 0L))
          rows.add(f"stage ${info.stageId}%4d tasks ${acc(2)}%4d " +
            f"cpu ${acc(0) / 1e9}%7.2fs shufW ${acc(1) / 1e6}%8.2fMB  " +
            info.name.takeWhile(_ != '\n').take(90))
          ()
        }
      })
    // warm the PROFILED query itself (codegen + JIT), then profile a
    // second, warm run — cold-run CPU is dominated by interpreter time
    // before the JIT kicks in and mis-attributes cost to whichever
    // stages happen to run first
    try SparkEntry.queries(name)(spark, dir).count()
    catch { case _: Throwable => () }
    spark.catalog.clearCache()
    org.apache.spark.graftbench.BusFlush.flush(spark.sparkContext)
    rows.clear()
    SparkEntry.queries(name)(spark, dir).count()
    org.apache.spark.graftbench.BusFlush.flush(spark.sparkContext)
    import scala.jdk.CollectionConverters._
    rows.asScala.toSeq.foreach(println)
    spark.stop()
  }
}

package graft

/** Dev helper: time one named query N times at a given SF dir.
  * Usage: runMain graft.TimeOne <query> [sfDir] [reps]
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = Engine.session("time-one")
    val metrics = MetricListener.install(spark.sparkContext)
    val jobCounter = metrics.jobs
    val cpuNs = metrics.cpuNs
    try SparkEntry.queries("q02_filter_pushdown")(spark, dir).count()
    catch { case _: Throwable => () }
    val times = (1 to reps).map { _ =>
      org.apache.spark.graftbench.BusFlush.flush(spark.sparkContext)
      val j0 = jobCounter.get()
      val c0 = cpuNs.get()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      org.apache.spark.graftbench.BusFlush.flush(spark.sparkContext)
      (dt, jobCounter.get() - j0, (cpuNs.get() - c0) / 1e9)
    }
    println(f"TIMEONE $name: ${times
      .map { case (t, j, c) => f"$t%.2f(${j}j,$c%.1fc)" }.mkString(" ")}")
    spark.stop()
  }
}

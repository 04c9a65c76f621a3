package graft

/** Dev helper: time one named query N times at a given SF dir.
  * Usage: runMain graft.TimeOne <query> [sfDir] [reps]
  *
  * Each rep prints immediately as `wall(jobs,cpu,gcMs)` — the cpu
  * figure is the same contention-proof executor-CPU channel the bench
  * reports; gcMs is the JVM-wide stop-the-world collection time that
  * landed inside the rep (GarbageCollectorMXBean deltas), the channel
  * that attributes a wall/CPU spike at unchanged jobs to heap weather
  * rather than plan change.
  *
  * GRAFT_LP_COLD=1 additionally drops the shared LP edge registry
  * before every rep, so LP-family queries pay their cold edge
  * materialization each time — the A/B lever for separating edge-build
  * cost from loop cost (see Dedup.lpEdgeCache).
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cold = sys.env.get("GRAFT_LP_COLD").contains("1")
    val spark = Engine.session("time-one")
    val metrics = MetricListener.install(spark.sparkContext)
    val jobCounter = metrics.jobs
    val cpuNs = metrics.cpuNs
    // the bench's accounting, shared so the two never diverge
    def gcMs: Long = Bench.gcMsTotal()
    try SparkEntry.queries("q02_filter_pushdown")(spark, dir).count()
    catch { case _: Throwable => () }
    val times = (1 to reps).map { _ =>
      if (cold) graft.operators.Dedup.clearLpEdgeCache()
      org.apache.spark.graftbench.BusFlush.flush(spark.sparkContext)
      val j0 = jobCounter.get()
      val c0 = cpuNs.get()
      val g0 = gcMs
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      org.apache.spark.graftbench.BusFlush.flush(spark.sparkContext)
      val r = (dt, jobCounter.get() - j0, (cpuNs.get() - c0) / 1e9, gcMs - g0)
      System.err.println(
        f"rep: ${r._1}%.2f(${r._2}j,${r._3}%.1fc,${r._4}g)")
      r
    }
    println(f"TIMEONE $name${if (cold) " [lp-cold]" else ""}: ${times
      .map { case (t, j, c, g) => f"$t%.2f(${j}j,$c%.1fc,${g}g)" }
      .mkString(" ")}")
    spark.stop()
  }
}

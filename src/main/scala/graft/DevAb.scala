package graft

/** Dev helper: run one named query twice — AQE on, then AQE off — with
  * warm reps, printing wall/jobs/cpu for each, to attribute plan-scope
  * cost differences (e.g. the label-propagation loop's AQE-off scope).
  * Usage: runMain graft.DevAb <query> [sfDir]
  */
object DevAb {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Engine.session("dev-ab")
    val metrics = MetricListener.install(spark.sparkContext)
    val cpuNs = metrics.cpuNs
    val jobs = metrics.jobs
    def frame(): org.apache.spark.sql.DataFrame =
      if (name == "embed_edges")
        graft.operators.Dedup.embedClusterEdges(spark, dir)
      else SparkEntry.queries(name)(spark, dir)
    def rep(label: String, checkpoint: Boolean = false): Unit = {
      org.apache.spark.graftbench.BusFlush.flush(spark.sparkContext)
      val c0 = cpuNs.get(); val j0 = jobs.get()
      val t0 = System.nanoTime()
      if (checkpoint) frame().localCheckpoint() else frame().count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      org.apache.spark.graftbench.BusFlush.flush(spark.sparkContext)
      println(f"DEVAB $label wall $dt%.2f jobs ${jobs.get() - j0} " +
        f"cpu ${(cpuNs.get() - c0) / 1e9}%.1f")
    }
    // warmup (codegen/JIT)
    try frame().count()
    catch { case e: Throwable => println(s"warmup failed: $e") }
    spark.catalog.clearCache()
    rep("aqe=on  count r1"); rep("aqe=on  count r2")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    rep("aqe=off count r1"); rep("aqe=off count r2")
    rep("aqe=off ckpt  r1", checkpoint = true)
    rep("aqe=off ckpt  r2", checkpoint = true)
    frame().explain("formatted")
    spark.stop()
  }
}

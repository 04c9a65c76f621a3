package graft

import java.nio.file.{Files, Paths}

/** Dev helper (r21): dump `.explain("formatted")` of named queries to
  * files — the before/after plan evidence the optimization rounds
  * commit under plans/rNN/.
  * Usage: runMain graft.PlanDump <q1,q2,...> <outDir> <suffix> [sfDir]
  * writes <outDir>/<query>_<suffix>.txt per query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').map(_.trim).filter(_.nonEmpty)
    val outDir = args(1)
    val suffix = args(2)
    val dir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val spark = Engine.session("plan-dump")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val text =
        try {
          val df = SparkEntry.queries(name)(spark, dir)
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        } catch { case e: Throwable =>
          s"PLAN FAILED: ${e.getClass.getName}: ${e.getMessage}"
        }
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), text)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

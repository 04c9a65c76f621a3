package graft.run

import graft.Engine
import graft.sources.{ShardCompact, ShardStats}

/** Operational CLI for the graft-shards store:
  *
  *   runMain graft.run.ShardCtl compact <dir>   seal epoch files into
  *                                              the next generation
  *   runMain graft.run.ShardCtl stats <dir>     zero-scan balance audit
  *
  * `compact` prints what the pass folded; `stats` prints one line per
  * shard (rows + bytes from the manifest and file statuses — no data
  * read). Exit 0 on success, 1 on usage error.
  */
object ShardCtl {

  def main(args: Array[String]): Unit = args.toSeq match {
    case Seq("compact", dir) =>
      val spark = Engine.session("graft-shardctl")
      try {
        val st = ShardCompact.compact(spark, dir)
        println(s"[compact] $dir: ${st.shards} shards rewritten, " +
          s"${st.epochFiles} epoch files folded, ${st.rows} rows")
      } catch {
        case e: java.io.IOException =>
          // e.g. the missing-pointer refusal — an operator decision,
          // not a crash worth a stack trace
          System.err.println(s"[compact] ${e.getMessage}")
          spark.stop()
          sys.exit(1)
      } finally spark.stop()
    case Seq("stats", dir) =>
      val spark = Engine.session("graft-shardctl")
      try {
        val rows = ShardStats.audit(spark, dir)
        rows.foreach { case (shard, n, bytes) =>
          println(f"[stats] shard $shard%05d: $n rows, $bytes bytes")
        }
        val total = rows.map(_._2).sum
        println(s"[stats] total: ${rows.size} shards, $total rows")
      } finally spark.stop()
    case _ =>
      System.err.println(
        "usage: ShardCtl (compact|stats) <store-dir>")
      sys.exit(1)
  }
}

package graft.run

import org.apache.spark.sql.SparkSession
import graft.Engine

/** Fold write-amplification probe for the four persistent store
  * kinds: build gen-0 from a third of the corpus, `advance` two more
  * thirds as generations through the pointer discipline, and report
  * BYTES WRITTEN per generation against the batch's row count — the
  * number that decides a deployment's fold cadence (r17 directive 6;
  * findings in BENCHING.md's write-amplification section).
  *
  * All four kinds currently write SELF-CONTAINED generations (each
  * fold lands prior ∪ increment, never a delta), so bytes-per-fold is
  * expected to track the full store size, not the batch — this tool
  * measures exactly how much, per kind, so the cadence statement in
  * BENCHING.md is a measurement rather than an assumption.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.run.FoldAmp"
  */
object FoldAmp {

  private def du(f: java.io.File): Long =
    if (f.isDirectory)
      Option(f.listFiles()).toSeq.flatten.map(du).sum
    else f.length()

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session("graft-foldamp")
    val base = new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      s"graft_foldamp_p${ProcessHandle.current().pid()}")
    def rec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rec)
      f.delete()
    }
    rec(base)
    def fail(msg: String): Nothing = {
      System.err.println(msg); spark.stop(); sys.exit(1)
    }
    def runOrDie(cmd: Seq[String]): Unit =
      StoreCtl.run(spark, cmd).left.foreach(e => fail(s"$cmd: $e"))
    val kinds = Seq(
      ("cluster", "documents", "doc_id"),
      ("embed", "embeddings", "vec_id"),
      ("ivfpq", "embeddings", "vec_id"),
      ("phash", "documents", "doc_id"))
    val out = kinds.map { case (kind, tbl, idCol) =>
      val root = new java.io.File(base, kind)
      root.mkdirs()
      def batchRows(third: Int): Long =
        Engine.table(spark, dir, tbl).where(s"$idCol % 3 = $third").count()
      runOrDie(Seq("build", kind, dir, s"$root/gen-0", s"$idCol % 3 = 0"))
      runOrDie(Seq("flip", root.toString, "gen-0"))
      runOrDie(Seq("advance", kind, dir, root.toString, s"$idCol % 3 = 1"))
      runOrDie(Seq("advance", kind, dir, root.toString, s"$idCol % 3 = 2"))
      val gens = (0 to 2).map(g => du(new java.io.File(root, s"gen-$g")))
      val rows = (0 to 2).map(g => batchRows(g))
      s""""$kind":{"batch_rows":${rows.mkString("[", ",", "]")},""" +
        s""""gen_bytes":${gens.mkString("[", ",", "]")},""" +
        s""""fold1_amp":${"%.2f".format(gens(1).toDouble / gens(0))},""" +
        s""""fold2_amp":${"%.2f".format(gens(2).toDouble / gens(0))}}"""
    }
    println(out.mkString("{\"sf_dir\":\"" + dir + "\",", ",", "}"))
    rec(base)
    spark.stop()
  }
}

package graft.run

import java.nio.file.{Files, Path, Paths}

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.SparkSession

import graft.Engine
import graft.etl.{JiraTransform, JsonlSink}
import graft.sources.{Checkpoints, JdkJiraHttp, JiraConfig, JiraSource}

/** EP1 parity — the full pipeline CLI (`main.py:98-211`):
  *
  *   runMain graft.run.Main [--extract] [--transform] [--project P]
  *                          [--clean] [--data-dir DIR]
  *
  * No phase flag means both phases (`main.py:116-119`); `--clean` wipes
  * checkpoint state first (`main.py:65-96`); `--project` restricts the
  * run (`main.py:149-155`); transform only runs when extraction
  * succeeded (`main.py:175`). Exit code 0/1 mirrors `main.py:203-211`.
  */
object Main {

  case class Options(runExtract: Boolean = true, runTransform: Boolean = true,
                     project: Option[String] = None, clean: Boolean = false,
                     dataDir: Path = Paths.get("data"),
                     cfg: JiraConfig = JiraConfig())

  def parse(args: Array[String]): Options = {
    var o = Options()
    val hasPhaseFlag =
      args.contains("--extract") || args.contains("--transform")
    if (hasPhaseFlag)
      o = o.copy(runExtract = args.contains("--extract"),
        runTransform = args.contains("--transform"))
    args.sliding(2).foreach {
      case Array("--project", p) => o = o.copy(project = Some(p))
      case Array("--data-dir", d) => o = o.copy(dataDir = Paths.get(d))
      case Array("--config", c) =>
        Config.load(Paths.get(c)) match {
          case Right(cfg) => o = o.copy(cfg = cfg)
          case Left(err)  =>
            System.err.println(s"[config] $err"); sys.exit(1)
        }
      case _ => ()
    }
    if (args.contains("--clean")) o = o.copy(clean = true)
    o
  }

  /** The whole DAG; returns success like `main()` (`main.py:122-192`). */
  def runPipeline(o: Options,
                  sparkOpt: Option[SparkSession] = None): Boolean = {
    val rawDir = o.dataDir.resolve("raw")
    val processedDir = o.dataDir.resolve("processed")
    val checkpoints = new Checkpoints(o.dataDir.resolve("checkpoints"))
    Seq(rawDir, processedDir).foreach(Files.createDirectories(_))
    val log = new RunLog(o.dataDir, o.cfg.logFiles)
    log.main("Pipeline started")

    if (o.clean) checkpoints.clean(o.project)

    val cfg = o.project match {
      case Some(p) => o.cfg.copy(projects = o.cfg.projects.filter(_ == p))
      case None    => o.cfg
    }

    val extractOk =
      if (!o.runExtract) true
      else {
        val http = new JdkJiraHttp(cfg.timeoutMillis, cfg.verifySsl)
        val results = JiraSource.fetchAll(cfg, rawDir, checkpoints, http)
        results.foreach {
          case Right(r) =>
            println(
              s"[extract] ${r.project}: ${r.issues} issues / ${r.pages} pages")
            log.extraction(
              s"${r.project}: ${r.issues} issues / ${r.pages} pages")
          case Left((p, e)) =>
            System.err.println(s"[extract] $p failed: ${e.getMessage}")
            log.extraction(s"$p failed: ${e.getMessage}", "ERROR")
        }
        results.exists(_.isRight) || results.isEmpty
      }

    val transformOk =
      if (!o.runTransform || !extractOk) extractOk
      else Try {
        val spark = sparkOpt.getOrElse(Engine.session("graft-main"))
        val glob = o.project match {
          case Some(p) => s"$rawDir/${p}_*.json"
          case None    => s"$rawDir/*.json"
        }
        val records =
          JiraTransform.transform(JiraTransform.readRawPages(spark, glob))
        val counts = JsonlSink.writeGoldenJsonl(records, processedDir.toString)
        counts.toSeq.sortBy(_._1).foreach { case (p, n) =>
          println(s"[transform] $p: $n records")
          log.transformation(s"$p: $n records")
        }
        true
      } match {
        case Success(ok) => ok
        case Failure(e) =>
          System.err.println(s"[transform] failed: ${e.getMessage}")
          log.transformation(s"failed: ${e.getMessage}", "ERROR")
          false
      }

    val ok = extractOk && transformOk
    log.main(if (ok) "Pipeline completed successfully"
             else "Pipeline completed with errors",
      if (ok) "INFO" else "ERROR")
    ok
  }

  def main(args: Array[String]): Unit = {
    val ok = runPipeline(parse(args))
    sys.exit(if (ok) 0 else 1)
  }
}

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
    val valueFlags = Seq("--project", "--data-dir", "--config")
    // argparse (the reference CLI) errors on a missing value: a
    // following flag is not a value (`--project --clean` must not
    // process a project named '--clean'), and a trailing value flag
    // is not silently ignored
    def missingValue(flag: String): Nothing = {
      System.err.println(s"[args] $flag expects a value")
      sys.exit(1)
    }
    if (args.nonEmpty && valueFlags.contains(args.last))
      missingValue(args.last)
    args.sliding(2).foreach {
      case Array(flag, v) if valueFlags.contains(flag) &&
          v.startsWith("--") =>
        missingValue(flag)
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
      // `main.py:150-151` narrows ONLY when the named project is in
      // the configured list — the reference keeps the FULL list on an
      // unknown name, so a typo'd --project runs everything loudly
      // rather than "succeeding" over an empty project set (quirk
      // preserved; the warning makes the surprise visible)
      case Some(p) if o.cfg.projects.contains(p) =>
        o.cfg.copy(projects = Seq(p))
      case Some(p) =>
        log.main(s"--project $p not in configured projects " +
          s"${o.cfg.projects.mkString(",")} — running all (the " +
          "reference's behavior)")
        o.cfg
      case None => o.cfg
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
          // the reference transforms the (possibly narrowed) config
          // list (`main.py:179`), so an unknown --project — which
          // fell through to the full list above — must fall through
          // here too, not glob a project that doesn't exist
          case Some(p) if cfg.projects.contains(p) =>
            s"$rawDir/${p}_*.json"
          case _ => s"$rawDir/*.json"
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

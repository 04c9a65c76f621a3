package graft.run

import java.nio.file.{Files, Path, Paths}
import java.time.{Duration, Instant}

import scala.util.{Failure, Success, Try}

/** EP3 parity — the reference's scheduled/streaming mode
  * (`worker.py:130-184`): run the pipeline at startup (unless skipped),
  * then every `intervalHours`, polling every 30 s, writing a health
  * status file after every state change, with graceful-shutdown status on
  * termination (`worker.py:40-128`).
  *
  * Clock/sleep/job are injectable so the scheduler is unit-testable in
  * virtual time; `maxTicks` bounds the poll loop for tests (None = run
  * forever like the reference).
  *
  * In Spark terms this is the `Trigger.ProcessingTime`-style driver for
  * the batch pipeline; the true streaming surface lives in
  * [[graft.streaming.Streams]] (SURVEY.md §2.9 St1/St4/St5).
  */
class Worker(statusPath: Path = Paths.get("data/worker_status.json"),
             now: () => Instant = () => Instant.now(),
             sleep: Double => Unit = s => Thread.sleep((s * 1000).toLong),
             log: RunLog = RunLog.disabled) {

  private val startTime = now()
  private var lastSuccessfulRun: Option[Instant] = None

  /** `update_status` (`worker.py:40-65`): health JSON, human-readable.
    * QUIRK PRESERVED: any success=true status — including the "Job
    * started" one runJob writes BEFORE the pipeline runs — advances
    * last_successful_run, exactly as the reference's global
    * assignment does (`worker.py:50-51`); a monitor keying staleness
    * off that field inherits the reference's semantics. The JSON
    * escaping is NOT a quirk to preserve: the reference goes through
    * json.dump, which escapes control characters, so a multi-line
    * Spark exception message must land as a VALID one-line JSON
    * string here too.
    */
  def updateStatus(success: Boolean, message: String): Unit = {
    if (success) lastSuccessfulRun = Some(now())
    val uptime = Duration.between(startTime, now())
    def q(s: String) = "\"" + s.flatMap {
      case '\\' => "\\\\"
      case '"'  => "\\\""
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json =
      s"""{
         |  "last_update": ${q(now().toString)},
         |  "worker_uptime": ${q(uptime.toString)},
         |  "last_successful_run": ${
           lastSuccessfulRun.map(i => q(i.toString)).getOrElse("null")},
         |  "status": ${q(if (success) "healthy" else "error")},
         |  "message": ${q(message)}
         |}""".stripMargin
    Try {
      Option(statusPath.getParent).foreach(Files.createDirectories(_))
      // temp + ATOMIC_MOVE: a monitor polling the file mid-write must
      // never see a torn document (content identical to the
      // reference's in-place json.dump — only the write is atomic)
      val tmp = Files.createTempFile(
        Option(statusPath.getParent).getOrElse(Paths.get(".")),
        statusPath.getFileName.toString + ".", ".tmp")
      Files.writeString(tmp, json)
      Files.move(tmp, statusPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    log.worker(message, if (success) "INFO" else "ERROR")
    ()
  }

  /** `job()` (`worker.py:67-102`): run, time, report; never throws. */
  def runJob(pipeline: () => Boolean): Unit = {
    val jobStart = now()
    updateStatus(success = true, "Job started")
    Try(pipeline()) match {
      case Success(ok) =>
        val secs = Duration.between(jobStart, now()).toMillis / 1000.0
        if (ok) updateStatus(success = true,
          f"Job completed successfully in $secs%.2f seconds")
        else updateStatus(success = false,
          f"Job completed with errors in $secs%.2f seconds")
      case Failure(e) =>
        val secs = Duration.between(jobStart, now()).toMillis / 1000.0
        updateStatus(success = false,
          f"Job failed after $secs%.2f seconds: ${e.getMessage}")
    }
  }

  /** `run_worker` (`worker.py:130-184`): initial run + fixed-interval
    * schedule over a 30 s poll loop.
    */
  def run(pipeline: () => Boolean, intervalHours: Double,
          skipInitialRun: Boolean = false,
          maxTicks: Option[Int] = None): Unit = {
    updateStatus(success = true, "Worker started")
    if (!skipInitialRun) runJob(pipeline)
    val intervalMillis = (intervalHours * 3600 * 1000).toLong
    var nextRun = now().plusMillis(intervalMillis)
    var ticks = 0
    val shutdownHook = new Thread(() =>
      updateStatus(success = true, "Worker shutting down"))
    Runtime.getRuntime.addShutdownHook(shutdownHook)
    try {
      while (maxTicks.forall(ticks < _)) {
        if (!now().isBefore(nextRun)) {
          runJob(pipeline)
          nextRun = now().plusMillis(intervalMillis)
        }
        sleep(30)
        ticks += 1
      }
    } finally {
      Try(Runtime.getRuntime.removeShutdownHook(shutdownHook))
      ()
    }
  }
}

object Worker {
  /** `python worker.py --interval N [--no-initial-run]`. */
  def main(args: Array[String]): Unit = {
    val interval = args.sliding(2).collectFirst {
      case Array("--interval", v) => v.toDouble
    }.getOrElse(6.0)
    val skipInitial = args.contains("--no-initial-run")
    new Worker().run(() => Main.runPipeline(Main.Options()), interval,
      skipInitial)
  }
}

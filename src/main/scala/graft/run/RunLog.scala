package graft.run

import java.nio.file.{Files, Path, StandardOpenOption}
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneId}

import scala.util.Try

/** Ops-parity with the reference's per-module log files: each Python
  * module wires a `FileHandler(..., mode='a')` next to its console
  * handler — `main.py:22-29` (`data/main.log`), `extract.py:21-28`
  * (`data/extraction.log`), `transformer.py:20-27`
  * (`data/transformation.log`), `worker.py:26-33` (`data/worker.log`) —
  * all with the format `"%(asctime)s [%(levelname)s] %(message)s"`.
  *
  * This mirrors the file side behind the `log_files` config flag
  * (console output stays the default surface): the same four file
  * names under the run's data dir, append-only, one
  * `<ts> [LEVEL] message` line per call, timestamps in Python's
  * default asctime shape (`2025-01-01 12:00:00,123`). Logging never
  * throws — an unwritable file degrades to console-only, like a
  * failed Python handler would be an ops nit, not a pipeline failure.
  */
class RunLog(dataDir: Path, enabled: Boolean,
             now: () => Instant = () => Instant.now()) {

  private val fmt = DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss,SSS")
    .withZone(ZoneId.systemDefault())

  private def write(file: String, level: String, msg: String): Unit =
    if (enabled) {
      Try {
        Files.createDirectories(dataDir)
        Files.writeString(dataDir.resolve(file),
          s"${fmt.format(now())} [$level] $msg\n",
          StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      }
      ()
    }

  def main(msg: String, level: String = "INFO"): Unit =
    write("main.log", level, msg)
  def extraction(msg: String, level: String = "INFO"): Unit =
    write("extraction.log", level, msg)
  def transformation(msg: String, level: String = "INFO"): Unit =
    write("transformation.log", level, msg)
  def worker(msg: String, level: String = "INFO"): Unit =
    write("worker.log", level, msg)
}

object RunLog {
  /** The default: no files, console only. */
  def disabled: RunLog = new RunLog(Path.of("."), enabled = false)
}

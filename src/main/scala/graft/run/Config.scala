package graft.run

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._
import scala.util.Try

import com.fasterxml.jackson.databind.ObjectMapper

import graft.sources.JiraConfig

/** `load_config` (`main.py:32-50`): parse `config.json` into the typed
  * run configuration, defaulting each missing key exactly like the
  * reference's `cfg.get(..., default)` calls (`extract.py:151-162`).
  * A malformed file is a hard error (the reference exits on bad JSON).
  */
object Config {

  def load(path: Path): Either[String, JiraConfig] = {
    if (!Files.exists(path)) return Left(s"config not found: $path")
    Try {
      val node = new ObjectMapper().readTree(Files.readString(path))
      def int(k: String, d: Int) =
        Option(node.get(k)).map(_.asInt(d)).getOrElse(d)
      def dbl(k: String, d: Double) =
        Option(node.get(k)).map(_.asDouble(d)).getOrElse(d)
      def bool(k: String, d: Boolean) =
        Option(node.get(k)).map(_.asBoolean(d)).getOrElse(d)
      val projects = Option(node.get("projects")) match {
        // a wrong-typed value (a bare string, an object) must be the
        // documented hard error, not a silent fall-through to the
        // default list: elements() on a non-array is empty, and
        // "projects": "KAFKA" silently extracting HADOOP/SPARK/KAFKA
        // burns hours of API fetches on projects nobody asked for
        case Some(n) if !n.isArray =>
          throw new IllegalArgumentException(
            s""""projects" must be a JSON array, got: $n""")
        case Some(n) =>
          val ps = n.elements().asScala.map(_.asText()).toSeq
          if (ps.nonEmpty) ps else JiraConfig().projects
        case None => JiraConfig().projects
      }
      JiraConfig(
        projects = projects,
        maxResults = int("max_results", 50),
        politeDelaySeconds = dbl("polite_delay_seconds", 2.0),
        rateLimitSleepSeconds = dbl("rate_limit_sleep_seconds", 30.0),
        retryBackoffBase = dbl("retry_backoff_base", 2.0),
        maxRetries = int("max_retries", 5),
        incremental = bool("incremental", false),
        lookbackDays = int("lookback_days", 7),
        // default true (deliberate divergence from extract.py:162's
        // verify=False — see JiraConfig.verifySsl)
        verifySsl = bool("verify_ssl", true),
        logFiles = bool("log_files", false))
    }.toEither.left.map(e => s"invalid config $path: ${e.getMessage}")
  }
}

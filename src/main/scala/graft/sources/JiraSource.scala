package graft.sources

import java.net.URI
import java.net.URLEncoder
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.time.{Duration, LocalDate}

import scala.jdk.CollectionConverters._
import scala.util.{Failure, Success, Try}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Run configuration, defaults mirroring `config.json:1-15` /
  * `extract.py:151-162`.
  */
case class JiraConfig(
    baseUrl: String = "https://issues.apache.org/jira/rest/api/latest/search",
    projects: Seq[String] = Seq("HADOOP", "SPARK", "KAFKA"),
    maxResults: Int = 50,
    politeDelaySeconds: Double = 2.0,
    rateLimitSleepSeconds: Double = 30.0,
    retryBackoffBase: Double = 2.0,
    maxRetries: Int = 5,
    // `cfg.get("incremental", False)` — opt-in, `extract.py:158`
    incremental: Boolean = false,
    lookbackDays: Int = 7,
    // Deliberate divergence from the reference: `extract.py:162` ships
    // `cfg.get("verify_ssl", False)` — TLS verification OFF by default —
    // which silently exposes credentials to MITM. We default to ON;
    // self-signed instances must opt out explicitly with
    // `"verify_ssl": false` in config.json (and get a loud warning).
    verifySsl: Boolean = true,
    timeoutMillis: Int = 15000,
    // `"log_files": true` turns on the reference's per-module append-only
    // log files (`main.py:22-29` etc. — see graft.run.RunLog); console
    // output stays the default surface either way
    logFiles: Boolean = false)

/** Minimal HTTP surface so the retry state machine is testable against a
  * scripted stub (SURVEY.md §5 item 4). `get` returns (status, body) or
  * throws for network-level failures (the reference's RequestException
  * channel, `extract.py:259-273`).
  */
trait JiraHttp {
  def get(url: String): (Int, String)
}

/** Production implementation over the JDK client (15 s timeout like
  * `extract.py:219`). `verifySsl=false` reproduces the reference's
  * `verify=False` behavior (`extract.py:162-167, 221`): certificate-chain
  * validation is disabled via a trust-all context — needed for the
  * self-signed-cert Jira instances the reference explicitly supports —
  * but unlike the reference it is opt-in (default verifies) and warns
  * loudly instead of suppressing the urllib3 InsecureRequestWarning.
  * (The JDK client's hostname check is a JVM-wide property, not
  * per-client; chain trust is the part self-signed certs fail on.)
  */
class JdkJiraHttp(timeoutMillis: Int, verifySsl: Boolean)
    extends JiraHttp {
  private val client = {
    val b = HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(timeoutMillis))
    if (!verifySsl) {
      System.err.println(
        "WARN JdkJiraHttp: verify_ssl=false — TLS certificate validation" +
          " is DISABLED for all Jira requests; credentials/tokens are" +
          " exposed to man-in-the-middle interception. Only use against" +
          " trusted self-signed instances.")
      val trustAll: Array[javax.net.ssl.TrustManager] = Array(
        new javax.net.ssl.X509TrustManager {
          override def checkClientTrusted(
              chain: Array[java.security.cert.X509Certificate],
              authType: String): Unit = ()
          override def checkServerTrusted(
              chain: Array[java.security.cert.X509Certificate],
              authType: String): Unit = ()
          override def getAcceptedIssuers
              : Array[java.security.cert.X509Certificate] = Array.empty
        })
      val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
      ctx.init(null, trustAll, new java.security.SecureRandom())
      b.sslContext(ctx)
    }
    b.build()
  }

  override def get(url: String): (Int, String) = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(timeoutMillis))
      .header("Accept", "application/json").GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }
}

/** Result of one project's fetch (`extract.py:122-370` reporting). */
case class FetchResult(project: String, pages: Int, issues: Int,
                       finalStartAt: Int, latestUpdated: Option[String])

/** Paginated, incremental, rate-limit-aware Jira ingestion — the
  * reference's extract stage (`extract.py:122-403`) re-expressed as a
  * driver-side source that lands the raw page zone Spark then scans.
  *
  * Faithful semantics (each cited to the reference):
  *  - JQL pushdown: `project={KEY}` plus, when incremental, `AND updated
  *    >= 'date'` from the checkpoint watermark date-truncated via the
  *    `T` split, else `now - lookback_days` (`extract.py:178-188`);
  *  - retry state machine per request (`extract.py:208-273`): 429 sleeps
  *    `rate_limit_sleep_seconds`; 5xx and timeouts/network errors sleep
  *    `backoff_base ** attempt`; every branch increments `attempt`;
  *    `attempt > max_retries` raises RuntimeError; non-retryable status
  *    raises immediately (`raise_for_status`);
  *  - pagination: stop on empty page or `start_at >= total`, `total` =
  *    last seen value (`extract.py:275-280, 368-370`);
  *  - watermark: cumulative lexicographic max of `fields.updated`
  *    (`extract.py:347-351`; safe because the timestamp format is
  *    fixed-width `+0000`);
  *  - commit order: page file FIRST, then checkpoint — crash between the
  *    two refetches one page, at-least-once (`extract.py:353-356`);
  *  - polite delay after each page (`extract.py:365-366`);
  *  - per-project failure isolation in [[fetchAll]]
  *    (`extract.py:389-400`).
  *
  * Scale note: Jira's `startAt` pagination is inherently serial PER
  * PROJECT, so the parallel axis is projects (and at 100 TB: thousands
  * of JQL slices, e.g. per-month `created` windows, each an independent
  * serial cursor) — the cluster-side parallelism lives in the raw-zone
  * scan that follows, not inside one cursor.
  */
object JiraSource {
  private val mapper = new ObjectMapper()

  /** `extract.py:178-188`. `today` injectable for deterministic tests. */
  def buildJql(project: String, checkpoint: Checkpoint, cfg: JiraConfig,
               today: () => LocalDate = () => LocalDate.now()): String = {
    val base = s"project=$project"
    if (!cfg.incremental) base
    else checkpoint.lastUpdated match {
      case Some(lu) => s"$base AND updated >= '${lu.split('T')(0)}'"
      case None =>
        s"$base AND updated >= '${today().minusDays(cfg.lookbackDays)}'"
    }
  }

  /** `fields` narrows what the API serializes per issue (the DSv2 scan
    * passes a pruned list; the faithful driver-side path keeps the
    * reference's `*all`, `extract.py:205`).
    */
  def pageUrl(cfg: JiraConfig, jql: String, startAt: Int,
              fields: String = "*all"): String = {
    val enc = URLEncoder.encode(jql, StandardCharsets.UTF_8)
    s"${cfg.baseUrl}?jql=$enc&maxResults=${cfg.maxResults}" +
      s"&startAt=$startAt&fields=$fields"
  }

  /** One GET with the reference's retry state machine
    * (`extract.py:208-273`). Returns the parsed body. `sleep` injectable
    * so specs assert the exact wait sequence without real delays.
    */
  def getWithRetries(http: JiraHttp, url: String, cfg: JiraConfig,
                     sleep: Double => Unit): JsonNode = {
    var attempt = 0
    while (true) {
      val outcome: Either[Throwable, (Int, String)] =
        try Right(http.get(url))
        catch { case e: java.io.IOException => Left(e) }
      outcome match {
        case Right((200, body)) => return mapper.readTree(body)
        case Right((429, _)) =>
          sleep(cfg.rateLimitSleepSeconds)
          attempt += 1
        case Right((status, _)) if status >= 500 && status < 600 =>
          sleep(math.pow(cfg.retryBackoffBase, attempt))
          attempt += 1
        case Right((status, body)) =>
          throw new RuntimeException(
            s"Unexpected HTTP status $status: ${body.take(200)}")
        case Left(_: java.net.http.HttpTimeoutException) =>
          // timeout channel (`extract.py:250-256`): backoff like 5xx;
          // the TERMINAL error is the common RuntimeError below, unlike
          // network errors which re-raise the original
          sleep(math.pow(cfg.retryBackoffBase, attempt))
          attempt += 1
        case Left(e) =>
          // network channel (`extract.py:258-273`): re-raises the
          // ORIGINAL exception once retries are exhausted
          if (attempt >= cfg.maxRetries) throw e
          sleep(math.pow(cfg.retryBackoffBase, attempt))
          attempt += 1
      }
      if (attempt > cfg.maxRetries)
        throw new RuntimeException(
          s"Max retries exceeded at $url")
    }
    sys.error("unreachable")
  }

  /** `save_raw_issues` (`extract.py:39-51`): one pretty-printed JSON
    * array per page at `{rawDir}/{PROJ}_{startAt}.json`.
    */
  def saveRawPage(rawDir: Path, project: String, startAt: Int,
                  issues: JsonNode): Path = {
    Files.createDirectories(rawDir)
    val out = rawDir.resolve(s"${project}_$startAt.json")
    Files.writeString(out,
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(issues))
    out
  }

  /** `fetch_issues_for_project` (`extract.py:122-370`). */
  def fetchProject(project: String, cfg: JiraConfig, rawDir: Path,
                   checkpoints: Checkpoints, http: JiraHttp,
                   sleep: Double => Unit = s =>
                     Thread.sleep((s * 1000).toLong),
                   today: () => LocalDate = () => LocalDate.now())
      : FetchResult = {
    val checkpoint = checkpoints.load(project)
    var startAt = checkpoint.startAt
    var latestUpdated: Option[String] = None // cumulative within this run
    var total: Option[Int] = None
    val jql = buildJql(project, checkpoint, cfg, today)
    var pages = 0
    var issueCount = 0

    var done = false
    while (!done) {
      val data = getWithRetries(http, pageUrl(cfg, jql, startAt), cfg, sleep)
      val issues = Option(data.get("issues"))
        .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
      total = Option(data.get("total")).filter(!_.isNull)
        .map(_.asInt).orElse(total)

      if (issues.isEmpty) done = true
      else {
        // watermark: lexicographic max of fields.updated across the run
        issues.foreach { issue =>
          val updated = Option(issue.get("fields"))
            .flatMap(f => Option(f.get("updated"))).filter(!_.isNull)
            .map(_.asText())
          updated.foreach { u =>
            if (latestUpdated.forall(u > _)) latestUpdated = Some(u)
          }
        }
        saveRawPage(rawDir, project, startAt, data.get("issues"))
        issueCount += issues.size
        pages += 1
        startAt += issues.size
        checkpoints.save(project, startAt, latestUpdated)
        sleep(cfg.politeDelaySeconds)
        if (total.exists(startAt >= _)) done = true
      }
    }
    FetchResult(project, pages, issueCount, startAt, latestUpdated)
  }

  /** `fetch_all_projects` (`extract.py:372-403`): sequential per-project
    * loop with failure isolation.
    */
  def fetchAll(cfg: JiraConfig, rawDir: Path, checkpoints: Checkpoints,
               http: JiraHttp,
               sleep: Double => Unit = s => Thread.sleep((s * 1000).toLong))
      : Seq[Either[(String, Throwable), FetchResult]] =
    cfg.projects.map { p =>
      Try(fetchProject(p, cfg, rawDir, checkpoints, http, sleep)) match {
        case Success(r) => Right(r)
        case Failure(e) => Left((p, e))
      }
    }
}

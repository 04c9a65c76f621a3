package graft

import java.nio.file.{Files, Path}
import java.time.LocalDate

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.sources._

/** Ports the reference's connector suite (`tests/test_extract.py`) against
  * the Scala source: incremental JQL, 429 / 5xx / network retry machine,
  * dual-format checkpoints, pagination + watermark commit protocol.
  */
class JiraSourceSpec extends AnyFunSuite {

  private def tmpDir(): Path = Files.createTempDirectory("graft-src")

  /** Scripted HTTP stub: each call pops the next (status, body) or throws. */
  private class StubHttp(script: Seq[Either[Exception, (Int, String)]])
      extends JiraHttp {
    val urls = mutable.Buffer[String]()
    private val it = script.iterator
    override def get(url: String): (Int, String) = {
      urls += url
      it.next() match {
        case Right(r) => r
        case Left(e)  => throw e
      }
    }
  }

  private val cfg = JiraConfig(baseUrl = "http://stub/search",
    projects = Seq("TEST"), maxResults = 2, politeDelaySeconds = 0.25,
    rateLimitSleepSeconds = 30, retryBackoffBase = 2, maxRetries = 5,
    incremental = true, lookbackDays = 7)

  private def page(issues: String*)(total: Int): (Int, String) =
    (200, s"""{"total": $total, "issues": [${issues.mkString(",")}]}""")

  private def issue(key: String, updated: String): String =
    s"""{"key": "$key", "fields": {"updated": "$updated", "summary": "s"}}"""

  // -- JQL construction (test_extract.py:55-77) -----------------------------

  test("incremental JQL uses checkpoint watermark date") {
    val jql = JiraSource.buildJql("TEST",
      Checkpoint(50, Some("2025-01-01T10:30:00.000+0000")), cfg)
    assert(jql == "project=TEST AND updated >= '2025-01-01'")
  }

  test("incremental JQL without checkpoint uses lookback window") {
    val jql = JiraSource.buildJql("TEST", Checkpoint(0, None), cfg,
      () => LocalDate.of(2025, 1, 8))
    assert(jql == "project=TEST AND updated >= '2025-01-01'")
  }

  test("non-incremental JQL is the bare project filter") {
    val jql = JiraSource.buildJql("TEST", Checkpoint(0, None),
      cfg.copy(incremental = false))
    assert(jql == "project=TEST")
  }

  // -- retry state machine (test_extract.py:79-153) -------------------------

  test("429 sleeps rate_limit_sleep_seconds then retries") {
    val http = new StubHttp(Seq(Right((429, "")),
      Right(page(issue("T-1", "2025-01-02T00:00:00.000+0000"))(1))))
    val sleeps = mutable.Buffer[Double]()
    val node = JiraSource.getWithRetries(http, "u", cfg, sleeps += _)
    assert(sleeps.head == 30.0)
    assert(node.get("total").asInt == 1)
  }

  test("5xx backs off exponentially: base^0 then base^1") {
    val http = new StubHttp(Seq(Right((500, "")), Right((503, "")),
      Right(page()(0))))
    val sleeps = mutable.Buffer[Double]()
    JiraSource.getWithRetries(http, "u", cfg, sleeps += _)
    assert(sleeps.toSeq == Seq(1.0, 2.0))
  }

  test("persistent 5xx raises after max_retries") {
    val http = new StubHttp(Seq.fill(10)(Right((500, ""))))
    val e = intercept[RuntimeException] {
      JiraSource.getWithRetries(http, "u", cfg, _ => ())
    }
    assert(e.getMessage.contains("Max retries exceeded"))
    assert(http.urls.size == cfg.maxRetries + 1)
  }

  test("network errors back off then rethrow past max_retries") {
    val boom = new java.io.IOException("connection reset")
    val http = new StubHttp(Seq.fill(10)(Left(boom)))
    val sleeps = mutable.Buffer[Double]()
    val e = intercept[java.io.IOException] {
      JiraSource.getWithRetries(http, "u", cfg, sleeps += _)
    }
    assert(e eq boom)
    assert(sleeps.toSeq == Seq(1.0, 2.0, 4.0, 8.0, 16.0))
  }

  test("bare JiraConfig: incremental off (extract.py:158), verify_ssl ON by design") {
    val d = JiraConfig()
    assert(!d.incremental) // `cfg.get("incremental", False)`, extract.py:158
    // Deliberate divergence from `cfg.get("verify_ssl", False)`
    // (extract.py:162): TLS verification defaults ON; disabling it is an
    // explicit opt-in for self-signed instances.
    assert(d.verifySsl)
    assert(JiraSource.buildJql("TEST", Checkpoint(0, None), d)
      == "project=TEST")
  }

  test("verify_ssl=false must be an explicit config opt-out") {
    val p = java.nio.file.Files.createTempFile("cfg", ".json")
    java.nio.file.Files.writeString(p, """{"verify_ssl": false}""")
    val cfg = graft.run.Config.load(p).fold(e => fail(e), identity)
    assert(!cfg.verifySsl)
    val p2 = java.nio.file.Files.createTempFile("cfg", ".json")
    java.nio.file.Files.writeString(p2, """{}""")
    val cfg2 = graft.run.Config.load(p2).fold(e => fail(e), identity)
    assert(cfg2.verifySsl) // missing key → verification stays on
  }

  test("timeouts back off then raise RuntimeError past max_retries") {
    // `requests.exceptions.Timeout` branch (extract.py:250-256): backs
    // off like 5xx and terminates through the common RuntimeError
    // (extract.py:270-273) — NOT the original-exception re-raise the
    // network channel uses. One extra backoff vs the network channel.
    val boom = new java.net.http.HttpTimeoutException("read timed out")
    val http = new StubHttp(Seq.fill(10)(Left(boom)))
    val sleeps = mutable.Buffer[Double]()
    val e = intercept[RuntimeException] {
      JiraSource.getWithRetries(http, "u", cfg, sleeps += _)
    }
    assert(e.getMessage.contains("Max retries exceeded"))
    assert(sleeps.toSeq == Seq(1.0, 2.0, 4.0, 8.0, 16.0, 32.0))
  }

  test("non-retryable status raises immediately") {
    val http = new StubHttp(Seq(Right((404, "not found"))))
    val e = intercept[RuntimeException] {
      JiraSource.getWithRetries(http, "u", cfg, _ => ())
    }
    assert(e.getMessage.contains("404"))
    assert(http.urls.size == 1)
  }

  // -- checkpoints (test_extract.py:155-201) --------------------------------

  test("checkpoint save writes both json and legacy txt " +
       "(test_extract.py:155-171, fixture verbatim)") {
    // the reference's exact fixture: save_checkpoint("HADOOP", 50,
    // "2025-01-15T12:34:56.789Z") must open BOTH HADOOP.json and the
    // legacy HADOOP.txt for writing, with content in each
    val dir = tmpDir()
    val cp = new Checkpoints(dir)
    cp.save("HADOOP", 50, Some("2025-01-15T12:34:56.789Z"))
    assert(Files.exists(dir.resolve("HADOOP.json")))
    assert(Files.size(dir.resolve("HADOOP.json")) > 0)
    assert(Files.readString(dir.resolve("HADOOP.txt")).trim == "50")
    assert(cp.load("HADOOP") ==
      Checkpoint(50, Some("2025-01-15T12:34:56.789Z")))
  }

  test("checkpoint load falls back to legacy txt, then defaults") {
    val dir = tmpDir()
    val cp = new Checkpoints(dir)
    assert(cp.load("TEST") == Checkpoint(0, None))
    Files.writeString(dir.resolve("TEST.txt"), "61")
    assert(cp.load("TEST") == Checkpoint(61, None))
  }

  test("checkpoint save with None preserves the stored watermark") {
    val dir = tmpDir()
    val cp = new Checkpoints(dir)
    cp.save("TEST", 10, Some("2025-01-01T00:00:00.000+0000"))
    cp.save("TEST", 20, None)
    assert(cp.load("TEST") ==
      Checkpoint(20, Some("2025-01-01T00:00:00.000+0000")))
  }

  test("clean removes per-project or all checkpoint state") {
    val dir = tmpDir()
    val cp = new Checkpoints(dir)
    cp.save("A", 1, None); cp.save("B", 2, None)
    cp.clean(Some("A"))
    assert(!Files.exists(dir.resolve("A.json")) &&
      Files.exists(dir.resolve("B.json")))
    cp.clean(None)
    assert(!Files.exists(dir.resolve("B.json")))
  }

  // -- full fetch loop (test_extract.py:205-245) ----------------------------

  test("paginates, saves raw pages, commits checkpoints, tracks watermark") {
    val raw = tmpDir(); val cps = new Checkpoints(tmpDir())
    val http = new StubHttp(Seq(
      Right(page(issue("T-1", "2025-01-02T00:00:00.000+0000"),
        issue("T-2", "2025-01-03T00:00:00.000+0000"))(3)),
      Right(page(issue("T-3", "2025-01-01T00:00:00.000+0000"))(3))))
    val r = JiraSource.fetchProject("TEST", cfg, raw, cps, http, _ => ())
    assert(r == FetchResult("TEST", 2, 3, 3,
      Some("2025-01-03T00:00:00.000+0000")))
    assert(Files.exists(raw.resolve("TEST_0.json")))
    assert(Files.exists(raw.resolve("TEST_2.json")))
    // checkpoint holds final position + run watermark (not page-2's older ts)
    assert(cps.load("TEST") ==
      Checkpoint(3, Some("2025-01-03T00:00:00.000+0000")))
    // requests resumed pagination: startAt=0 then startAt=2
    assert(http.urls(0).contains("startAt=0"))
    assert(http.urls(1).contains("startAt=2"))
    assert(http.urls.forall(_.contains("fields=*all")))
  }

  test("resumes from a stored checkpoint and stops on empty page") {
    val raw = tmpDir(); val dir = tmpDir(); val cps = new Checkpoints(dir)
    cps.save("TEST", 4, Some("2025-01-01T00:00:00.000+0000"))
    val http = new StubHttp(Seq(Right(page()(4))))
    val r = JiraSource.fetchProject("TEST", cfg, raw, cps, http, _ => ())
    assert(r.pages == 0 && r.finalStartAt == 4)
    assert(http.urls.head.contains("startAt=4"))
    // incremental JQL derived from the stored watermark
    assert(http.urls.head.contains(
      java.net.URLEncoder.encode("updated >= '2025-01-01'", "UTF-8")))
  }

  test("fetchAll isolates per-project failures") {
    val raw = tmpDir(); val cps = new Checkpoints(tmpDir())
    val http = new StubHttp(Seq(Right((404, "nope")), Right(page()(0))))
    val rs = JiraSource.fetchAll(cfg.copy(projects = Seq("BAD", "GOOD")),
      raw, cps, http, _ => ())
    assert(rs.head.isLeft && rs(1).isRight)
  }
}

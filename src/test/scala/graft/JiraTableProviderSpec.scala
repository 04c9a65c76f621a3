package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{JiraHttp, JiraTableProvider}

/** Drives the DataSource V2 "jira" format end-to-end through
  * `spark.read.format("jira")` with a scripted HTTP stub: partition
  * planning (one per project), lazy pagination inside the partition
  * reader, the `since` JQL pushdown option, and schema.
  */
class JiraTableProviderSpec extends AnyFunSuite {

  private val spark = SparkSessionHelper.spark

  /** Thread-safe scripted stub keyed by URL content. */
  private class ScriptedHttp extends JiraHttp {
    val seen = new ConcurrentLinkedQueue[String]()
    override def get(url: String): (Int, String) = {
      seen.add(url)
      val project = "project%3D(\\w+)".r.findFirstMatchIn(url)
        .map(_.group(1)).getOrElse("?")
      val startAt = "startAt=(\\d+)".r.findFirstMatchIn(url)
        .map(_.group(1).toInt).getOrElse(0)
      // two pages of 2 then 1 for every project (total 3)
      val issues =
        if (startAt == 0)
          s"""[{"key": "$project-1", "fields": {"summary": "a"}},
             | {"key": "$project-2", "fields": {"summary": "b"}}]"""
            .stripMargin
        else s"""[{"key": "$project-3", "fields": {"summary": "c"}}]"""
      (200, s"""{"total": 3, "issues": $issues}""")
    }
  }

  test("format(jira) plans one partition per project and paginates") {
    val stub = new ScriptedHttp
    JiraTableProvider.httpStubs.put("spec1", stub)
    try {
      val df = spark.read.format("jira")
        .option("projects", "AAA,BBB")
        .option("maxResults", "2")
        .option("politeDelaySeconds", "0")
        .option("httpStub", "spec1")
        .load()
      assert(df.schema.fieldNames.toSeq ==
        Seq("project", "start_at", "page_json"))
      assert(df.rdd.getNumPartitions == 2)
      val rows = df.collect().map(r =>
        (r.getString(0), r.getInt(1))).toSet
      assert(rows == Set(("AAA", 0), ("AAA", 2), ("BBB", 0), ("BBB", 2)))
      // page_json is a valid issue array usable by the transform
      val issues = df.selectExpr(
        "explode(from_json(page_json," +
          " 'array<struct<key:string>>')) AS issue")
        .selectExpr("issue.key").collect().map(_.getString(0)).toSet
      assert(issues == Set("AAA-1", "AAA-2", "AAA-3",
        "BBB-1", "BBB-2", "BBB-3"))
    } finally JiraTableProvider.httpStubs.remove("spec1")
  }

  test("column pruning narrows the REST fields= parameter") {
    val stub = new ScriptedHttp
    JiraTableProvider.httpStubs.put("spec3", stub)
    try {
      val df = spark.read.format("jira")
        .option("projects", "DDD")
        .option("politeDelaySeconds", "0")
        .option("httpStub", "spec3")
        .load()
      // projecting query that never reads page_json: the scan must ask
      // the server for `fields=id`, not `fields=*all`
      val pages = df.select("project", "start_at").collect()
      assert(pages.map(r => (r.getString(0), r.getInt(1))).toSet ==
        Set(("DDD", 0), ("DDD", 2)))
      val urls = stub.seen.toArray(Array.empty[String])
      assert(urls.nonEmpty && urls.forall(_.contains("fields=id")), urls.toSeq)
      assert(urls.forall(!_.contains("fields=*all")), urls.toSeq)

      // reading page_json keeps the reference's *all default
      stub.seen.clear()
      df.select("page_json").collect()
      val full = stub.seen.toArray(Array.empty[String])
      assert(full.nonEmpty && full.forall(_.contains("fields=*all")),
        full.toSeq)

      // ...unless the user narrows it explicitly via the fields option
      stub.seen.clear()
      spark.read.format("jira")
        .option("projects", "DDD")
        .option("politeDelaySeconds", "0")
        .option("fields", "summary,comment")
        .option("httpStub", "spec3")
        .load().select("page_json").collect()
      val narrowed = stub.seen.toArray(Array.empty[String])
      assert(narrowed.nonEmpty &&
        narrowed.forall(_.contains("fields=summary,comment")),
        narrowed.toSeq)
    } finally JiraTableProvider.httpStubs.remove("spec3")
  }

  test("since option pushes the updated predicate into the JQL") {
    val stub = new ScriptedHttp
    JiraTableProvider.httpStubs.put("spec2", stub)
    try {
      spark.read.format("jira")
        .option("projects", "CCC")
        .option("politeDelaySeconds", "0")
        .option("since", "2025-01-01")
        .option("httpStub", "spec2")
        .load().count()
      val urls = stub.seen.toArray(Array.empty[String])
      assert(urls.nonEmpty && urls.forall(_.contains(
        java.net.URLEncoder.encode("updated >= '2025-01-01'", "UTF-8"))))
    } finally JiraTableProvider.httpStubs.remove("spec2")
  }
}

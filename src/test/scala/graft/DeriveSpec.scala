package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Derive
import graft.functions.Derive.QaPair
import graft.etl._

/** Ports `tests/test_transformer.py` for extract_qa_pairs, generate_summary,
  * classify_issue, validate_issue and the end-to-end transform_issue cases.
  */
class DeriveSpec extends AnyFunSuite {

  // --- extract_qa_pairs ---

  test("qa: empty inputs") {
    assert(Derive.extractQaPairs("", Nil) == Nil)
  }

  test("qa: no questions") {
    assert(Derive.extractQaPairs(
      "This is a statement. This is another statement.", Nil) == Nil)
  }

  test("qa: questions but no comments") {
    assert(Derive.extractQaPairs("How do I fix this bug?", Nil) == Nil)
  }

  test("qa: question paired with first long-enough comment") {
    val got = Derive.extractQaPairs("How do I fix this bug?",
      Seq("short", "You need to update the library."))
    assert(got == Seq(QaPair("How do I fix this bug?",
      "You need to update the library.")))
  }

  test("qa: every question shares the same first answer") {
    val got = Derive.extractQaPairs("Why does it fail? What should I do?",
      Seq("This is a sufficiently long answer."))
    assert(got.map(_.question) == Seq("Why does it fail?", "What should I do?"))
    assert(got.map(_.answer).distinct ==
      Seq("This is a sufficiently long answer."))
  }

  test("qa: 10-char comment is NOT a valid answer (strictly > 10)") {
    assert(Derive.extractQaPairs("Really?", Seq("exactly10!")) == Nil)
    assert(Derive.extractQaPairs("Really?", Seq("exactly11!!")).nonEmpty)
  }

  // --- generate_summary ---

  test("summary: title only") {
    assert(Derive.generateSummary("Bug in parser", "") == "Bug in parser")
  }

  test("summary: title and description") {
    assert(Derive.generateSummary("Bug in parser",
      "The JSON parser fails when given empty input.")
      == "Bug in parser - The JSON parser fails when given empty input")
  }

  test("summary: description starts with title") {
    assert(Derive.generateSummary("Bug in parser",
      "Bug in parser when handling empty input.")
      == "Bug in parser when handling empty input")
  }

  test("summary: long summaries truncate to exactly 150 ending in ...") {
    val r = Derive.generateSummary("A" * 100, "B" * 100)
    assert(r.length == 150 && r.endsWith("..."))
  }

  test("summary: first sentence of <= 5 chars is ignored") {
    assert(Derive.generateSummary("Title", "Hi yo. Long tail here.") == "Title")
  }

  test("summary: real-world Jira example (test_transformer.py:115-125, " +
       "fixture verbatim)") {
    // the reference's exact fixture strings and its three containment
    // assertions, plus the 150-cap the contract guarantees
    val title = "S3A: retry on MPU completion failure"
    val description = "Experienced transient failure in test run: all " +
      "MPU complete posts failed because the request or parts were not " +
      "found. The tests started succeeding 60-90s later."
    val r = Derive.generateSummary(title, description)
    assert(r.contains(title))
    assert(r.contains("Experienced transient failure"))
    assert(r.contains("MPU complete posts failed"))
    assert(r.length <= 150)
  }

  // --- classify_issue ---

  test("classify: issue type always included") {
    assert(Derive.classifyIssue(Some("Something"), Nil, Some("Task"))
      == Seq("task"))
  }

  test("classify: keyword rules fire on summary substrings") {
    val got = Derive.classifyIssue(
      Some("Fix memory leak to improve performance"), Nil, None)
    assert(got.toSet == Set("bug", "improvement", "performance"))
  }

  test("classify: whitelisted labels added, others ignored") {
    val got = Derive.classifyIssue(Some("misc"),
      Seq("security", "wontfix", "Documentation"), None)
    assert(got.toSet == Set("security", "documentation"))
  }

  test("classify: duplicates removed (set semantics)") {
    val got = Derive.classifyIssue(Some("Bug: fix the error"),
      Seq("bug"), Some("Bug"))
    assert(got == Seq("bug")) // canonical first-occurrence order
  }

  test("classify: multi-label real example") {
    val got = Derive.classifyIssue(
      Some("Add new feature to speed up processing"), Seq("performance"),
      Some("New Feature"))
    assert(got.toSet == Set("new feature", "feature", "performance"))
  }

  // --- validate_issue ---

  private def rec(id: String = "HADOOP-123", title: String = "t",
                  created: Option[String] = Some("2025-10-24T09:31:18.000+0000"),
                  updated: Option[String] = None,
                  bodies: Seq[String] = Nil) =
    Derive.validateIssue(Option(id), Option(title), created, updated, bodies)

  test("validate: valid record") { assert(rec().isEmpty) }

  test("validate: missing id / empty title") {
    assert(rec(id = null).contains("Missing issue ID"))
    assert(rec(title = "").contains("Missing or empty title"))
  }

  test("validate: malformed dates flagged, empty/absent dates pass") {
    assert(rec(created = Some("2025/10/24")).exists(_.startsWith(
      "Malformed date in created")))
    assert(rec(created = None, updated = Some("not-a-date")).exists(
      _.startsWith("Malformed date in updated")))
    assert(rec(created = Some("")).isEmpty)
  }

  test("validate: empty comment body flagged with index") {
    assert(rec(bodies = Seq("ok", "")).contains("Empty comment body at index 1"))
  }

  // --- transform_issue end-to-end (tests/test_transformer.py:257-377) ---

  private val canned = RawIssue(
    key = Some("HADOOP-123"),
    fields = Some(JFields(
      summary = Some("Fix memory leak in HDFS"),
      description = Some("There is a memory leak. How can we fix it?"),
      created = Some("2025-10-24T09:31:18.000+0000"),
      updated = Some("2025-10-25T09:31:18.000+0000"),
      status = Some(JNamed(Some("Open"))),
      priority = Some(JNamed(Some("Major"))),
      issuetype = Some(JNamed(Some("Bug"))),
      reporter = Some(JUser(Some("Alice"))),
      assignee = None,
      labels = Some(Seq("performance")),
      components = Some(Seq(JComponent(Some("hdfs")))),
      comment = Some(JCommentBlock(Some(Seq(JComment(
        author = Some(JUser(Some("Bob"))),
        body = Some("Try closing the stream in a finally block."),
        created = Some("2025-10-24T10:00:00.000+0000")))))))))

  test("transform_issue: canned issue field-by-field") {
    val r = JiraTransform.transformIssue(canned)
    assert(r.id == "HADOOP-123")
    assert(r.title == "Fix memory leak in HDFS")
    assert(r.status == Some("Open"))
    assert(r.priority == Some("Major"))
    assert(r.reporter == Some("Alice"))
    assert(r.assignee == None)
    assert(r.labels == Seq("performance"))
    assert(r.components == Seq("hdfs"))
    assert(r.comments == Seq(CommentRecord(Some("Bob"),
      "Try closing the stream in a finally block.",
      Some("2025-10-24T10:00:00.000+0000"))))
    assert(r.derived_tasks.classifications.toSet ==
      Set("bug", "performance"))
    assert(r.derived_tasks.qa_pairs == Seq(QaPair("How can we fix it?",
      "Try closing the stream in a finally block.")))
    assert(r.error.isEmpty)
  }

  test("transform_issue: null status yields Unknown without raising") {
    val r = JiraTransform.transformIssue(
      canned.copy(fields = canned.fields.map(_.copy(status = None))))
    assert(r.status == Some("Unknown"))
    assert(r.error.isEmpty)
  }

  test("transform_issue: null comment author yields Unknown") {
    val withNullAuthor = canned.copy(fields = canned.fields.map(f =>
      f.copy(comment = Some(JCommentBlock(Some(Seq(JComment(None,
        Some("body text here"), None))))))))
    val r = JiraTransform.transformIssue(withNullAuthor)
    assert(r.comments.head.author == Some("Unknown"))
  }

  test("transform_issue: missing key becomes UNKNOWN") {
    val r = JiraTransform.transformIssue(canned.copy(key = None))
    assert(r.id == "UNKNOWN")
  }

  test("transform_issue: empty issue returns the literal {} record") {
    // `if not raw_issue: return {}` (transformer.py:238-240); the
    // reference writes that `{}` verbatim to the corpus
    // (transformer.py:395) and still runs validation on it
    // (transformer.py:381).
    val r = JiraTransform.transformIssue(RawIssue(None, None))
    assert(r.empty)
    assert(PyJson.serialize(r) == "{}")
    assert(JiraTransform.validationErrors(r).nonEmpty)
  }
}

package graft.etl

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}
import scala.util.{Failure, Success, Try}

import graft.functions.{CleanText, Derive}

/** Raw Jira page files -> cleaned corpus records.
  *
  * Re-expresses the reference's transform stage (`transformer.py:225-428`)
  * Spark-first:
  *
  *  - each page file (a pretty-printed JSON ARRAY of issues,
  *    `extract.py:39-51`) is read whole (`wholetext`) and parsed with
  *    `from_json(ArrayType(raw))` + `posexplode`, so we keep BOTH the
  *    source file name and the in-array position — the reference's output
  *    order is (lexicographic file name, array position)
  *    (`transformer.py:325, 360-397`; SURVEY.md §7.4 item 3);
  *  - a file whose content fails to parse yields a null array: the whole
  *    file is skipped and counted, matching `json.JSONDecodeError` handling
  *    (`transformer.py:409-411`);
  *  - the per-issue clean/derive/validate core is a typed map over
  *    `Dataset[RawIssue]` — a narrow, shuffle-free transformation that
  *    scales linearly with input splits; any per-record exception degrades
  *    to the reduced error record (`transformer.py:303-314`).
  *
  * Scale note: one task per page file; at 100 TB the raw zone is millions
  * of page objects, so the scan parallelizes across the cluster while the
  * per-record work stays embarrassingly parallel. Nothing here shuffles —
  * the only wide operation in the whole pipeline is the optional
  * golden-parity global sort in [[JsonlSink]].
  */
object JiraTransform {

  /** Positioned raw issue: where it came from + where in the page. */
  case class Sourced(file: String, pos: Int, issue: RawIssue)
  case class SourcedRecord(project: String, file: String, pos: Int,
                           record: IssueRecord)

  val rawIssueSchema: StructType = Encoders.product[RawIssue].schema

  /** Read raw page files (each a JSON array of issues) keeping provenance.
    * `pathGlob` e.g. `"data/raw/" + "*.json"`.
    *
    * TWO-STAGE parse: the file parses to an array of RAW element
    * strings first (whole-file skip on malformed JSON, unchanged),
    * then each element parses to the typed issue INDEPENDENTLY. A
    * single-stage from_json(array<struct>) nulled the WHOLE array on
    * any one structurally-bad element — silently dropping every good
    * issue in the page, where the reference's per-issue loop
    * (`transformer.py:303-314`) emits the good ones and reduces the
    * bad one to an error record. An element that fails even the
    * per-element parse (a bare scalar where an object should be)
    * lands as the empty-parity record — the same altitude limit as
    * the `{}` note in [[transformIssue]]; the reference itself dies
    * on that shape (its except block calls .get on the raw element).
    */
  def readRawPages(spark: SparkSession, pathGlob: String): Dataset[Sourced] = {
    import spark.implicits._
    val parsed = spark.read
      .option("wholetext", "true")
      .text(pathGlob)
      .select(input_file_name().as("file"),
        from_json($"value", ArrayType(org.apache.spark.sql.types.StringType)).as("raws"))
    // Whole-file skip on malformed JSON: from_json -> null array.
    parsed
      .where($"raws".isNotNull)
      .select($"file", posexplode($"raws").as(Seq("pos", "raw")))
      .select($"file", $"pos",
        from_json($"raw", rawIssueSchema).as("issue"))
      .as[Sourced]
  }

  /** `transform_issue` (`transformer.py:225-314`), exception channel
    * included. Pure; unit-tested without a session.
    */
  def transformIssue(raw: RawIssue): IssueRecord = {
    // `if not raw_issue: return {}` (`transformer.py:238-240`) — an
    // issue parsed as `{}` yields the empty record, which serializes as
    // the literal `{}` line and still counts as a validation error in
    // [[stats]] (the reference validates it too, `transformer.py:381`).
    // Known altitude limit: the typed parse cannot tell `{}` from the
    // pathological `{"key": null, "fields": null}` (the reference's
    // truthiness test would pass the latter through and emit id null);
    // distinguishing them would require carrying raw JSON per issue.
    if (raw.key.isEmpty && raw.fields.isEmpty) return IssueRecord.emptyParity
    val issueKey = raw.key.getOrElse("UNKNOWN")
    Try {
      val fields = raw.fields.getOrElse(
        JFields(None, None, None, None, None, None, None, None, None,
          None, None, None))
      val comments =
        fields.comment.flatMap(_.comments).getOrElse(Nil).filter(_ != null)

      val title = CleanText(fields.summary.orNull)
      val description = CleanText(fields.description.orNull)

      // status: "Unknown" only when the status object itself is absent/null
      // (`transformer.py:253`); a present object with a null name stays null.
      val status = fields.status match {
        case None    => Some("Unknown")
        case Some(s) => s.name
      }

      val cleanedComments = comments.map { c =>
        CommentRecord(
          author = c.author match {
            case None    => Some("Unknown")
            case Some(a) => a.displayName
          },
          body = CleanText(c.body.orNull),
          created = c.created)
      }

      val classifications = Derive.classifyIssue(
        fields.summary, fields.labels.getOrElse(Nil),
        fields.issuetype.flatMap(_.name))
      val issueSummary = Derive.generateSummary(title, description)
      val qaPairs =
        Derive.extractQaPairs(description, cleanedComments.map(_.body))

      IssueRecord(
        id = issueKey,
        title = title,
        description = description,
        status = status,
        priority = fields.priority.flatMap(_.name),
        reporter = fields.reporter.flatMap(_.displayName),
        assignee = fields.assignee.flatMap(_.displayName),
        created = fields.created,
        updated = fields.updated,
        labels = fields.labels.getOrElse(Nil),
        components = fields.components.getOrElse(Nil)
          .map(c => if (c == null) null else c.name.orNull),
        comments = cleanedComments,
        derived_tasks =
          DerivedTasks(issueSummary, classifications, qaPairs))
    } match {
      case Success(r) => r
      case Failure(e) =>
        IssueRecord(
          id = issueKey,
          title = raw.fields.flatMap(_.summary)
            .getOrElse("Error during transformation"),
          description = "", status = None, priority = None, reporter = None,
          assignee = None, created = None, updated = None, labels = Nil,
          components = Nil, comments = Nil,
          derived_tasks = DerivedTasks("Error during transformation",
            Seq("error"), Nil),
          error = Some(String.valueOf(e.getMessage)))
    }
  }

  /** `validate_issue` over a transformed record (V1). */
  def validationErrors(r: IssueRecord): Seq[String] =
    Derive.validateIssue(Option(r.id), Option(r.title), r.created, r.updated,
      r.comments.map(_.body))

  /** Full transform with provenance, ready for the ordered sink. Project
    * affiliation comes from the page file name (`{PROJ}_{startAt}.json`,
    * `transformer.py:324-325`).
    */
  def transform(raw: Dataset[Sourced]): Dataset[SourcedRecord] = {
    import raw.sparkSession.implicits._
    raw.map { s =>
      val name = s.file.substring(s.file.lastIndexOf('/') + 1)
      val project = {
        val i = name.lastIndexOf('_')
        if (i > 0) name.substring(0, i) else name
      }
      // a null issue is an element the per-element parse rejected
      // outright (see readRawPages) — the empty-parity record, like {}
      val issue =
        if (s.issue == null) RawIssue(None, None) else s.issue
      SourcedRecord(project, name, s.pos, transformIssue(issue))
    }
  }

  /** Per-project stats matching the reference's reporting (A2/A3). */
  def stats(records: Dataset[SourcedRecord]): DataFrame = {
    import records.sparkSession.implicits._
    records
      .map(r => (r.project, r.record.error.isDefined,
        validationErrors(r.record).nonEmpty))
      .toDF("project", "is_error", "is_invalid")
      .groupBy($"project")
      .agg(count(lit(1)).as("records"),
        sum(when($"is_error", 1L).otherwise(0L)).as("errors"),
        sum(when($"is_invalid", 1L).otherwise(0L)).as("validation_errors"))
  }
}

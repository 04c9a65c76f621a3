package graft.etl

import graft.functions.Derive.QaPair

/** Typed views of the raw Jira issue document and the processed record.
  *
  * Raw schema: only the ~15 fields the transform consumes are declared
  * (FIXTURES.md §A1); Spark's nested-schema pruning means the other ~100
  * `customfield_*` columns are never parsed. All fields are Options —
  * the reference navigates with `.get(..., default)` everywhere
  * (`transformer.py:245-257`) and the JSON is nullable throughout.
  *
  * Timestamps stay STRINGS end-to-end: the reference never parses them
  * (`SURVEY.md §1.2`), and output fidelity requires the original
  * `...+0000` text verbatim.
  */
case class JUser(displayName: Option[String])
case class JNamed(name: Option[String])
case class JComponent(name: Option[String])
case class JComment(author: Option[JUser], body: Option[String],
                    created: Option[String])
case class JCommentBlock(comments: Option[Seq[JComment]])
case class JFields(
    summary: Option[String],
    description: Option[String],
    created: Option[String],
    updated: Option[String],
    status: Option[JNamed],
    priority: Option[JNamed],
    issuetype: Option[JNamed],
    reporter: Option[JUser],
    assignee: Option[JUser],
    labels: Option[Seq[String]],
    components: Option[Seq[JComponent]],
    comment: Option[JCommentBlock])
case class RawIssue(key: Option[String], fields: Option[JFields])

/** Output record (`transformer.py:276-294`, README.md:116-177). */
case class CommentRecord(author: Option[String], body: String,
                         created: Option[String])
case class DerivedTasks(summary: String, classifications: Seq[String],
                        qa_pairs: Seq[QaPair])
case class IssueRecord(
    id: String,
    title: String,
    description: String,
    status: Option[String],
    priority: Option[String],
    reporter: Option[String],
    assignee: Option[String],
    created: Option[String],
    updated: Option[String],
    labels: Seq[String],
    components: Seq[String],
    comments: Seq[CommentRecord],
    derived_tasks: DerivedTasks,
    /** Error-path channel (`transformer.py:303-314`): set when the
      * transform failed; such records serialize in the reduced shape
      * `{id, error, title, derived_tasks}` like the reference. */
    error: Option[String] = None,
    /** Empty-issue channel (`transformer.py:238-240`):
      * `transform_issue({})` returns `{}` and the reference writes the
      * literal `{}` line (`transformer.py:395`); a true flag makes
      * [[PyJson.serialize]] do the same. */
    empty: Boolean = false)

object IssueRecord {
  /** The `{}` record `transform_issue` returns for an empty issue. */
  val emptyParity: IssueRecord = IssueRecord(
    id = null, title = null, description = null, status = None,
    priority = None, reporter = None, assignee = None, created = None,
    updated = None, labels = Nil, components = Nil, comments = Nil,
    derived_tasks = DerivedTasks(null, Nil, Nil), empty = true)
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.etl.JiraTransform

/** The reference pipeline's own surface (SURVEY.md §2.2/2.3/2.8 — the
  * transform stage over the raw Jira page zone), exposed through the
  * driver contract so the correctness harness exercises it end-to-end.
  *
  * These run over the reference's shipped raw fixtures (9 page files, 364
  * issues) — the same corpus the golden-parity suite diffs byte-for-byte
  * against the shipped processed JSONL (GoldenParitySpec). The per-record
  * clean/derive/validate core is not SQL-expressible (cleanText is a
  * cross-line state machine, `transformer.py:30-90`), but the reference's
  * SHIPPED OUTPUT is queryable — so each entry's DuckDB oracle aggregates
  * the processed `*_issues.jsonl` corpus (via `read_json`) restricted to
  * the ids present in the raw zone's page files — the processed corpus
  * carries 414 records while the raw snapshot ships 364; the semijoin on
  * the raw `key` set aligns the domains exactly. The driver's
  * hash-compare then proves our transform of the raw zone reproduces the
  * reference's own output, column by column — a driver-run version of the
  * golden-parity suite. `classifications` order is the reference's only
  * nondeterminism (SURVEY.md §7.4), so the oracled columns use it only
  * set-wise (histogram counts, lengths), never as an ordered list.
  *
  * Scale shape: everything below is scan -> narrow typed map ->
  * (optionally) one aggregation; the transform itself never shuffles
  * (SURVEY.md §4.3).
  */
object JiraEtl extends QueryPack {

  /** Shipped raw fixtures (read-only reference snapshot). */
  private val RawGlob = "/root/reference/data/raw/*.json"

  private def records(s: SparkSession): DataFrame =
    JiraTransform.transform(JiraTransform.readRawPages(s, RawGlob)).toDF()

  // -- etl_records: full transform, flattened record inventory ---------------
  // (file/pos provenance is asserted by the golden suite's order check;
  // the oracle compares the jsonl-visible columns, keyed by unique id)
  private def etlRecords(s: SparkSession, dir: String): DataFrame =
    records(s)
      .select(col("project"),
        col("record.id").as("id"),
        col("record.title").as("title"),
        col("record.status").as("status"),
        col("record.priority").as("priority"),
        size(col("record.comments")).cast("long").as("n_comments"),
        size(col("record.derived_tasks.classifications")).cast("long")
          .as("n_classifications"),
        size(col("record.derived_tasks.qa_pairs")).cast("long")
          .as("n_qa_pairs"),
        col("record.error").isNotNull.as("has_error"))
      .orderBy(col("id"))

  // -- etl_classify_hist: derived-label histogram (F4 over the corpus) -------
  private def etlClassifyHist(s: SparkSession, dir: String): DataFrame =
    records(s)
      .select(explode(col("record.derived_tasks.classifications"))
        .as("classification"))
      .groupBy(col("classification"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("classification"))

  // -- etl_qa_pairs: extracted QA pairs (F2 over the corpus) -----------------
  private def etlQaPairs(s: SparkSession, dir: String): DataFrame =
    records(s)
      .select(col("record.id").as("id"),
        posexplode(col("record.derived_tasks.qa_pairs"))
          .as(Seq("qa_idx", "qa")))
      .select(col("id"), col("qa_idx").cast("long").as("qa_idx"),
        col("qa.question").as("question"), col("qa.answer").as("answer"))
      .orderBy(col("id"), col("qa_idx"))

  // -- etl_validation: per-project record/error/validation counters (A2/A3) --
  private def etlValidation(s: SparkSession, dir: String): DataFrame =
    JiraTransform
      .stats(JiraTransform.transform(JiraTransform.readRawPages(s, RawGlob)))
      .orderBy(col("project"))

  // -- etl_clean_docs: cleanText as a codegen'd Column expression ------------
  // The at-scale column-pipeline form of F1 (graft_clean_text — see
  // graft.functions.CleanTextExpression) applied to the corpus-scale
  // documents table: no typed-map encoder round-trip, runs inside
  // whole-stage codegen. Hash-verified since round 7: the DuckDB oracle
  // restates the cross-line state machine as a list_reduce struct fold
  // (see cleanDocsSql below).
  private def etlCleanDocs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.CleanTextExpression.ensureRegistered(s)
    graft.Engine.table(s, dir, "documents")
      .selectExpr("doc_id",
        "graft_clean_text(text) AS cleaned",
        "cast(length(text) as bigint) AS raw_len",
        "cast(length(graft_clean_text(text)) as bigint) AS clean_len")
      .orderBy(col("doc_id"))
  }

  /** DuckDB restatement of the CleanText state machine
    * (`transformer.py:30-90`; `functions/CleanText.scala`): the
    * cross-line error-block fold runs as a list_reduce over split
    * lines with a struct accumulator (l = current line slot, a =
    * joined output, e = in-error-block, w = wrote-anything), then the
    * four post-passes (tab->space, multi-space collapse, Jira-markup
    * strip, CI-URL token). Regex classes are stated as explicit ASCII
    * sets ([0-9A-Za-z_], [\t\n\x0B\f\r ]) — RE2's \w/\s are ASCII
    * while the Java side compiles UNICODE_CHARACTER_CLASS, so the
    * oracle is exact for ASCII corpora (both the fixtures and the
    * synthetic documents table; CleanTextSpec owns the Unicode edges).
    */
  private val cleanDocsSql: String = {
    val ws = "' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)"
    def strip(e: String) = s"trim($e, $ws)"
    val sp = "[\\t\\n\\x0B\\f\\r ]" // Java \s (ASCII range)
    val wc = "0-9A-Za-z_" // Java \w (ASCII range)
    // [\w.]+ admits a leading dot — mirror Java exactly
    val errStart = s"^(\\[ERROR\\]|Exception|at$sp+[$wc.]+|" +
      s"$sp+at$sp+[$wc.]+|Caused by:|$sp+\\.\\.\\.$sp+[0-9]+$sp+more|" +
      "java\\.|»)"
    val errClass = s"^$sp*[$wc]+(\\.[$wc]+)+(Exception|Error):"
    // one fold step: y.l is the incoming line, x carries state
    val cl = strip("replace(y.l, chr(13), '')")
    val inErr2 = s"CASE WHEN x.e AND ${strip("y.l")} <> ''" +
      " AND NOT starts_with(y.l, ' ') THEN false ELSE x.e END"
    val fold =
      s"""list_reduce(list_prepend(
         |  struct_pack(l := '', a := '', e := false, w := false),
         |  list_transform(string_split(text, chr(10)),
         |    s -> struct_pack(l := s, a := '', e := false, w := false))),
         | (x, y) -> CASE
         |   WHEN regexp_matches(y.l, '$errStart')
         |     OR regexp_matches(y.l, '$errClass')
         |     THEN struct_pack(l := '', a := x.a, e := true, w := x.w)
         |   WHEN ($inErr2)
         |     THEN struct_pack(l := '', a := x.a, e := true, w := x.w)
         |   WHEN $cl = ''
         |     THEN struct_pack(l := '', a := x.a, e := false, w := x.w)
         |   ELSE struct_pack(l := '',
         |     a := CASE WHEN x.w THEN x.a || ' ' || $cl ELSE $cl END,
         |     e := false, w := true)
         | END)""".stripMargin
    val post = strip(
      "regexp_replace(regexp_replace(regexp_replace(" +
        "replace(folded.a, chr(9), ' '), " +
        "' {2,}', ' ', 'g'), " +
        "'\\{code.*?\\}|\\{noformat\\}', '', 'g'), " +
        s"'https?://ci-hadoop\\.apache\\.org/job/[^\\t\\n\\x0B\\f\\r ]+'," +
        " '[CI_URL]', 'g')")
    s"""SELECT doc_id, $post AS cleaned,
       |  length(text) AS raw_len, length($post) AS clean_len
       |FROM (SELECT doc_id, text, $fold AS folded FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  // -- etl_comments: restructured comments (P3) at comment granularity -------
  // Hash-verifies the cleaned comment BODIES and Unknown-author fallback
  // against the reference's shipped output — the per-comment form of the
  // n_comments count etl_records checks.
  private def etlComments(s: SparkSession, dir: String): DataFrame =
    records(s)
      .select(col("record.id").as("id"),
        posexplode(col("record.comments")).as(Seq("c_idx", "c")))
      .select(col("id"), col("c_idx").cast("long").as("c_idx"),
        col("c.author").as("author"), col("c.body").as("body"),
        col("c.created").as("created"))
      .orderBy(col("id"), col("c_idx"))

  // -- etl_summaries: generated summaries (F3) with the 150-char contract ----
  private def etlSummaries(s: SparkSession, dir: String): DataFrame =
    records(s)
      .select(col("record.id").as("id"),
        col("record.derived_tasks.summary").as("summary"),
        length(col("record.derived_tasks.summary")).cast("long")
          .as("summary_len"))
      .orderBy(col("id"))

  override val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(
      "etl_records" -> etlRecords _,
      "etl_classify_hist" -> etlClassifyHist _,
      "etl_qa_pairs" -> etlQaPairs _,
      "etl_comments" -> etlComments _,
      "etl_validation" -> etlValidation _,
      "etl_summaries" -> etlSummaries _,
      "etl_clean_docs" -> etlCleanDocs _
    )

  /** Oracles over the reference's shipped output (see class Scaladoc):
    * golden jsonl semijoined to the raw zone's key set. `etl_clean_docs`
    * instead compares against the list_reduce restatement of the state
    * machine (cleanDocsSql) over the documents table.
    */
  private val Golden =
    "read_json('/root/reference/data/processed/*_issues.jsonl'," +
      " format='newline_delimited')"
  private val Raw =
    "read_json('/root/reference/data/raw/*.json', format='array'," +
      " union_by_name=true)"
  private val Corpus =
    s"WITH corpus AS (SELECT * FROM $Golden WHERE id IN (SELECT key FROM $Raw))"

  /** Prefix match of the reference's date shape (`transformer.py:205`,
    * `re.match` = anchored-at-start search).
    */
  private val DateRe = """'^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}'"""

  override val oracles: Map[String, String] = Map(
    "etl_records" -> (Corpus + """
      |SELECT split_part(id, '-', 1) AS project, id, title, status, priority,
      |  CAST(len(coalesce(comments, [])) AS BIGINT) AS n_comments,
      |  CAST(len(derived_tasks.classifications) AS BIGINT)
      |    AS n_classifications,
      |  CAST(len(derived_tasks.qa_pairs) AS BIGINT) AS n_qa_pairs,
      |  FALSE AS has_error
      |FROM corpus ORDER BY id""".stripMargin),
    "etl_classify_hist" -> (Corpus + """
      |SELECT classification, COUNT(*) AS n FROM (
      |  SELECT unnest(derived_tasks.classifications) AS classification
      |  FROM corpus)
      |GROUP BY classification ORDER BY classification""".stripMargin),
    "etl_qa_pairs" -> (Corpus + """
      |SELECT id, CAST(u.i - 1 AS BIGINT) AS qa_idx,
      |  derived_tasks.qa_pairs[u.i].question AS question,
      |  derived_tasks.qa_pairs[u.i].answer AS answer
      |FROM corpus, (SELECT unnest(range(1, 1 + (SELECT
      |    max(len(derived_tasks.qa_pairs)) FROM corpus))) AS i) u
      |WHERE u.i <= len(derived_tasks.qa_pairs)
      |ORDER BY id, qa_idx""".stripMargin),
    "etl_comments" -> (Corpus + """
      |SELECT id, CAST(u.i - 1 AS BIGINT) AS c_idx,
      |  comments[u.i].author AS author,
      |  comments[u.i].body AS body,
      |  comments[u.i].created AS created
      |FROM corpus, (SELECT unnest(range(1, 1 + (SELECT
      |    max(len(coalesce(comments, []))) FROM corpus))) AS i) u
      |WHERE u.i <= len(coalesce(comments, []))
      |ORDER BY id, c_idx""".stripMargin),
    "etl_summaries" -> (Corpus + """
      |SELECT id, derived_tasks.summary AS summary,
      |  CAST(length(derived_tasks.summary) AS BIGINT) AS summary_len
      |FROM corpus ORDER BY id""".stripMargin),
    "etl_clean_docs" -> cleanDocsSql,
    "etl_validation" -> (Corpus + s"""
      |SELECT split_part(id, '-', 1) AS project,
      |  COUNT(*) AS records,
      |  CAST(0 AS BIGINT) AS errors,
      |  CAST(SUM(CASE WHEN id IS NULL OR id = ''
      |    OR title IS NULL OR title = ''
      |    OR (created IS NOT NULL AND created <> ''
      |        AND NOT regexp_matches(created, $DateRe))
      |    OR (updated IS NOT NULL AND updated <> ''
      |        AND NOT regexp_matches(updated, $DateRe))
      |    OR len(list_filter(coalesce(comments, []),
      |        c -> c.body IS NULL OR c.body = '')) > 0
      |  THEN 1 ELSE 0 END) AS BIGINT) AS validation_errors
      |FROM corpus GROUP BY 1 ORDER BY project""".stripMargin)
  )
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.etl.JiraTransform

/** The reference pipeline's own surface (SURVEY.md §2.2/2.3/2.8 — the
  * transform stage over the raw Jira page zone), exposed through the
  * driver contract so the correctness harness exercises it end-to-end.
  *
  * These run over the reference's shipped raw fixtures (9 page files, 414
  * issues) — the same corpus the golden-parity suite diffs byte-for-byte
  * against the shipped processed JSONL (GoldenParitySpec). The per-record
  * clean/derive/validate core is not SQL-expressible (cleanText is a
  * cross-line state machine, `transformer.py:30-90`), so these entries
  * carry no DuckDB oracle and take the driver's rows-only check; the
  * golden suite is their exactness oracle.
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
  private def etlRecords(s: SparkSession, dir: String): DataFrame =
    records(s)
      .select(col("project"), col("file"), col("pos"),
        col("record.id").as("id"),
        col("record.title").as("title"),
        col("record.status").as("status"),
        col("record.priority").as("priority"),
        size(col("record.comments")).as("n_comments"),
        size(col("record.derived_tasks.classifications"))
          .as("n_classifications"),
        size(col("record.derived_tasks.qa_pairs")).as("n_qa_pairs"),
        col("record.error").isNotNull.as("has_error"))
      .orderBy(col("project"), col("file"), col("pos"))

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
      .select(col("id"), col("qa_idx"),
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
  // whole-stage codegen. Rows-only (the state machine isn't SQL).
  private def etlCleanDocs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.CleanTextExpression.ensureRegistered(s)
    graft.Engine.table(s, dir, "documents")
      .selectExpr("doc_id",
        "graft_clean_text(text) AS cleaned",
        "length(text) AS raw_len",
        "length(graft_clean_text(text)) AS clean_len")
      .orderBy(col("doc_id"))
  }

  // -- etl_summaries: generated summaries (F3) with the 150-char contract ----
  private def etlSummaries(s: SparkSession, dir: String): DataFrame =
    records(s)
      .select(col("record.id").as("id"),
        col("record.derived_tasks.summary").as("summary"),
        length(col("record.derived_tasks.summary")).as("summary_len"))
      .orderBy(col("id"))

  override val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(
      "etl_records" -> etlRecords _,
      "etl_classify_hist" -> etlClassifyHist _,
      "etl_qa_pairs" -> etlQaPairs _,
      "etl_validation" -> etlValidation _,
      "etl_summaries" -> etlSummaries _,
      "etl_clean_docs" -> etlCleanDocs _
    )

  /** Rows-only: the transform core is not SQL-expressible (see Scaladoc);
    * exactness is covered by the golden-parity suite instead.
    */
  override val oracles: Map[String, String] = Map.empty
}

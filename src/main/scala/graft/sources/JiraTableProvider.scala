package graft.sources

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 "jira" format — the idiomatic Spark surface over the
  * reference's paginated REST scan (SURVEY.md §2.1 S1/S2):
  *
  * {{{
  * spark.read.format("jira")
  *   .option("projects", "HADOOP,SPARK")
  *   .option("maxResults", "50")
  *   .option("since", "2025-01-01")       // JQL `updated >=` pushdown
  *   .load()                               // project, start_at, page_json
  * }}}
  *
  * One InputPartition per project: Jira's `startAt` cursor is inherently
  * serial within a project, so projects are the parallel axis (at real
  * scale the option `slices` would add per-month JQL windows as further
  * partitions — same mechanism). Each partition reader runs the SAME
  * retry state machine as the driver-side path
  * ([[JiraSource.getWithRetries]]) on its executor, yielding one row per
  * page; downstream `from_json` + the transform pipeline take over, so
  * page payloads never concentrate on the driver — unlike the
  * reference's single process, this scan streams 1000 projects through
  * 1000 executors.
  *
  * Incremental pushdown is the `since` option (v1 per SURVEY.md §4.1 —
  * the `updated` predicate lives at page granularity, not row, so a
  * row-level `SupportsPushDownFilters` would be a lie).
  */
class JiraTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "jira"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    JiraTableProvider.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new JiraTable(properties.asScala.toMap)
}

object JiraTableProvider {
  val schema: StructType = StructType(Seq(
    StructField("project", StringType, nullable = false),
    StructField("start_at", IntegerType, nullable = false),
    StructField("page_json", StringType, nullable = false)))

  /** Test seam: scripted HTTP keyed by the `httpStub` option (local-mode
    * executors share the JVM, so tests can exercise the full DSv2 path
    * without a network).
    */
  val httpStubs = new ConcurrentHashMap[String, JiraHttp]()
}

private[sources] class JiraTable(props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = "jira"
  override def schema(): StructType = JiraTableProvider.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = {
    val merged = props ++ options.asScala
    // Column pruning pushdown (SURVEY.md §4.1): Catalyst hands the scan
    // the columns a projecting query actually reads; when `page_json` is
    // not among them the partition reader narrows the REST `fields=`
    // parameter to `id` instead of `*all` — the server stops serializing
    // ~130 issue fields per row for a query that only wants the cursor
    // columns (and the emitted InternalRows carry only the pruned
    // schema). With `page_json` kept, `fields` stays `*all` unless the
    // user narrows it via the `fields` option.
    new ScanBuilder with Scan with Batch
        with SupportsPushDownRequiredColumns {
      private var required: StructType = JiraTableProvider.schema
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan = this
      override def readSchema(): StructType = required
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        val projects = merged.getOrElse("projects", "HADOOP,SPARK,KAFKA")
          .split(",").map(_.trim).filter(_.nonEmpty)
        projects.map(p =>
          JiraInputPartition(p, merged, required.fieldNames.toSeq)
            .asInstanceOf[InputPartition]).toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new JiraReaderFactory()
    }
  }
}

private[sources] case class JiraInputPartition(
    project: String, options: Map[String, String],
    columns: Seq[String]) extends InputPartition

private[sources] class JiraReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[JiraInputPartition]
    new JiraPartitionReader(p.project, p.options, p.columns)
  }
}

/** Pulls pages lazily: one `next()` = one HTTP page through the shared
  * retry machine; stops on empty page or `startAt >= total`
  * (`extract.py:275-280, 368-370`).
  */
private[sources] class JiraPartitionReader(
    project: String, options: Map[String, String],
    columns: Seq[String])
    extends PartitionReader[InternalRow] {

  private val cfg = JiraConfig(
    baseUrl = options.getOrElse("baseurl",
      "https://issues.apache.org/jira/rest/api/latest/search"),
    maxResults = options.getOrElse("maxresults", "50").toInt,
    politeDelaySeconds = options.getOrElse("politedelayseconds", "2").toDouble,
    rateLimitSleepSeconds =
      options.getOrElse("ratelimitsleepseconds", "30").toDouble,
    retryBackoffBase = options.getOrElse("retrybackoffbase", "2").toDouble,
    maxRetries = options.getOrElse("maxretries", "5").toInt,
    // default true — explicit opt-out only (see JiraConfig.verifySsl)
    verifySsl = options.getOrElse("verifyssl", "true").toBoolean,
    timeoutMillis = options.getOrElse("timeoutmillis", "15000").toInt)

  private val http: JiraHttp = options.get("httpstub")
    .flatMap(id => Option(JiraTableProvider.httpStubs.get(id)))
    .getOrElse(new JdkJiraHttp(cfg.timeoutMillis, cfg.verifySsl))

  private val jql = options.get("since") match {
    case Some(d) => s"project=$project AND updated >= '$d'"
    case None    => s"project=$project"
  }

  private val needsJson = columns.contains("page_json")

  /** The pruned `fields=` REST parameter: a query not reading `page_json`
    * needs only the pagination skeleton, so ask the server for `id`
    * alone (the issues array must stay non-empty for the cursor to
    * advance); otherwise the user's `fields` option or the reference's
    * `*all` (`extract.py:205`).
    */
  private val restFields =
    if (needsJson) options.getOrElse("fields", "*all") else "id"

  private var startAt = options.getOrElse("startat", "0").toInt
  private var total: Option[Int] = None
  private var current: InternalRow = _
  private var done = false
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private var firstPage = true

  override def next(): Boolean = {
    if (done) return false
    // the reference sleeps the polite delay after EVERY page
    // (extract.py:365-366) — equivalently before every page but the
    // first, which spares the common one-page scan the trailing sleep;
    // without this the DSv2 reader hammered the public API back-to-back
    // per partition while the option parsed into cfg unused
    if (firstPage) firstPage = false
    else if (cfg.politeDelaySeconds > 0)
      Thread.sleep((cfg.politeDelaySeconds * 1000).toLong)
    val data = JiraSource.getWithRetries(http,
      JiraSource.pageUrl(cfg, jql, startAt, restFields), cfg,
      s => Thread.sleep((s * 1000).toLong))
    val issues = Option(data.get("issues"))
      .filter(n => !n.isNull && n.size() > 0)
    total = Option(data.get("total")).filter(!_.isNull)
      .map(_.asInt).orElse(total)
    issues match {
      case None => done = true; false
      case Some(arr) =>
        val values: Seq[Any] = columns.map {
          case "project"   => UTF8String.fromString(project)
          case "start_at"  => startAt
          case "page_json" =>
            UTF8String.fromString(mapper.writeValueAsString(arr))
        }
        current = InternalRow(values: _*)
        startAt += arr.size()
        if (total.exists(startAt >= _)) done = true // last page emitted
        true
    }
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}

package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Logical node: keep the top `k` rows per `key`, ranked by `order`
  * descending with ties broken by `tie` ascending (all three must be
  * bigint-valued expressions over the child's output).
  *
  * This is the whole-operator extension path (SURVEY.md §7.3 option c /
  * the build brief's custom-operator ladder): Spark's built-in shape for
  * "top-n per group" is `row_number().over(Window...)` + filter, which
  * SORTS every partition fully (O(n log n) per key, all rows
  * materialized through the sort) before discarding everything past n.
  * This operator instead keeps a bounded k-heap per key inside one pass
  * (O(n log k), no sort buffer) after the key-clustered exchange that
  * [[TopKPerKeyExec.requiredChildDistribution]] requests from the
  * planner — the same contract a built-in aggregate declares, so
  * EnsureRequirements inserts exactly one hash exchange.
  */
case class TopKPerKey(k: Int, key: Expression, order: Expression,
                      tie: Expression, child: LogicalPlan,
                      tieNullsFirst: Boolean = false)
    extends UnaryNode {
  // fail at PLAN time with the actual problem named: k <= 0 used to
  // surface as an executor-side NoSuchElementException from an empty
  // heap's head, nowhere near the mistake
  require(k >= 1, s"TopKPerKey wants k >= 1, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : TopKPerKey = copy(child = newChild)
}

/** Planner strategy mapping the logical node to its physical operator. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(k, key, order, tie, child, tnf) =>
      TopKPerKeyExec(k, key, order, tie, planLater(child), tnf) :: Nil
    case _ => Nil
  }
}

/** Heap entry: rank components with explicit nullness + the owned row. */
private[plans] case class TopKEntry(onull: Boolean, ov: Long,
                                    tnull: Boolean, tv: Long,
                                    row: InternalRow)

/** Physical bounded-heap top-k per key. One pass per partition; memory
  * is O(distinct keys in partition x k rows), not O(partition) — the
  * win over the sort-based Window when groups are large (few keys,
  * many rows each). The inverse regime is the operator's ENVELOPE: the
  * per-key heaps live in an in-memory map with no spill path, so at
  * EXTREME per-partition key cardinality the native (spillable) Window
  * is the safer plan. Rather than an opaque executor OOM, the exec
  * refuses past [[TopKPerKeyExec.MaxKeysKey]] distinct keys per
  * partition (default 8M — at k=3 and ~100 B rows that is ~2.4 GB of
  * heap, the edge of sane) with a message naming the knob and the
  * rewrite toggle ([[WindowTopKRewrite]]'s `graft.window.topk.rewrite`).
  *
  * Null handling matches the `row_number().over(Window)` formulation it
  * replaces: a NULL key is its own group (SQL GROUP BY / Window
  * partitioning semantics), a NULL order value ranks weakest (`desc`
  * defaults to NULLS LAST in Spark), and a NULL tie follows
  * `tieNullsFirst` — false = ASC NULLS LAST (the operator's original
  * contract), true = ASC NULLS FIRST (Spark's default for a plain
  * `asc`, which [[WindowTopKRewrite]] must honor when it rewrites a
  * user-written window).
  */
object TopKPerKeyExec {
  /** Per-partition distinct-key refusal threshold (see the class doc). */
  val MaxKeysKey = "graft.topk.maxKeysPerPartition"
}

case class TopKPerKeyExec(k: Int, key: Expression, order: Expression,
                          tie: Expression, child: SparkPlan,
                          tieNullsFirst: Boolean = false)
    extends UnaryExecNode {

  import org.apache.spark.sql.execution.metric.SQLMetrics

  override def output: Seq[Attribute] = child.output

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"),
    "numInputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of input rows"),
    "numHeaps" -> SQLMetrics.createMetric(sparkContext,
      "bounded heaps held (distinct keys)"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(key)) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val tnfLocal = tieNullsFirst
    val maxKeysLocal = conf
      .getConfString(TopKPerKeyExec.MaxKeysKey, "8000000").toLong
    val keyB = BindReferences.bindReference(key, child.output)
    val orderB = BindReferences.bindReference(order, child.output)
    val tieB = BindReferences.bindReference(tie, child.output)
    val inRows = longMetric("numInputRows")
    val outRows = longMetric("numOutputRows")
    val numHeaps = longMetric("numHeaps")
    child.execute().mapPartitions { iter =>
      // per key: the heap's head is the WEAKEST of the current top-k,
      // evicted first. Nullness is carried EXPLICITLY (not as MinValue/
      // MaxValue sentinels, which would collide with legitimate extreme
      // values and mis-rank them against NULL): weakest = null order,
      // then smallest order; ties: null tie, then largest tie — i.e.
      // `order desc nulls last, tie asc nulls last`.
      implicit val heapOrd: Ordering[TopKEntry] =
        new Ordering[TopKEntry] {
          override def compare(a: TopKEntry, b: TopKEntry): Int = {
            val c1 =
              if (a.onull && b.onull) 0
              else if (a.onull) 1
              else if (b.onull) -1
              else java.lang.Long.compare(b.ov, a.ov)
            if (c1 != 0) c1
            else if (a.tnull && b.tnull) 0
            else if (a.tnull) { if (tnfLocal) -1 else 1 }
            else if (b.tnull) { if (tnfLocal) 1 else -1 }
            else java.lang.Long.compare(a.tv, b.tv)
          }
        }
      val heaps =
        mutable.HashMap.empty[Long, mutable.PriorityQueue[TopKEntry]]
      // NULL keys cluster to one partition (hash of null), own group
      var nullHeap: mutable.PriorityQueue[TopKEntry] = null
      val copier = UnsafeProjection.create(child.output, child.output)
      iter.foreach { row =>
        inRows += 1
        val kvRaw = keyB.eval(row)
        val oRaw = orderB.eval(row)
        val tRaw = tieB.eval(row)
        val entry = TopKEntry(
          oRaw == null, if (oRaw == null) 0L else oRaw.asInstanceOf[Long],
          tRaw == null, if (tRaw == null) 0L else tRaw.asInstanceOf[Long],
          null)
        val heap = kvRaw match {
          case null =>
            if (nullHeap == null) {
              nullHeap = mutable.PriorityQueue.empty[TopKEntry]
            }
            nullHeap
          case kv: Long =>
            val h = heaps.getOrElseUpdate(kv,
              mutable.PriorityQueue.empty[TopKEntry])
            // refuse LOUDLY past the key-cardinality envelope instead
            // of an opaque executor OOM (the heap map has no spill
            // path; the sort-based Window does)
            if (heaps.size > maxKeysLocal)
              throw new IllegalStateException(
                s"TopKPerKey exceeded ${TopKPerKeyExec.MaxKeysKey}=" +
                  s"$maxKeysLocal distinct keys in one partition — " +
                  "raise the cap, add partitions, or disable the " +
                  "rewrite (graft.window.topk.rewrite=false) to use " +
                  "the spillable Window")
            h
        }
        if (heap.size < kLocal) {
          heap.enqueue(entry.copy(row = copier(row).copy()))
        } else if (heapOrd.compare(entry, heap.head) < 0) {
          // strictly stronger than the current weakest
          heap.dequeue()
          heap.enqueue(entry.copy(row = copier(row).copy()))
        }
      }
      numHeaps += heaps.size + (if (nullHeap == null) 0 else 1)
      val all =
        if (nullHeap == null) heaps.valuesIterator
        else heaps.valuesIterator ++ Iterator.single(nullHeap)
      all.flatMap { h =>
        h.dequeueAll.iterator.map { (t: TopKEntry) =>
          outRows += 1
          t.row
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
      : TopKPerKeyExec = copy(child = newChild)
}

/** User-facing surface: registers the strategy on the session (public
  * `experimental.extraStrategies` — no extensions hook needed) and wraps
  * the logical node back into a DataFrame via the sql-package shim.
  */
object TopKPerKeyOps {

  /** Idempotent strategy attach — ONE implementation for this API and
    * [[WindowTopKRewriteOps.ensureRegistered]] (the check-then-append
    * idiom existed in two verbatim copies before r20).
    */
  private[plans] def ensureStrategy(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy

  /** All three are bigint COLUMNS of `df` — pre-compute derived measures
    * with `withColumn` (and drop them after) rather than passing
    * expression strings, so no analyzer round-trip is needed.
    */
  def topKPerKey(df: DataFrame, k: Int, keyCol: String, orderCol: String,
                 tieCol: String): DataFrame = {
    val spark = df.sparkSession
    ensureStrategy(spark)
    val plan = df.queryExecution.analyzed
    // resolve with the session's resolver (case-insensitive by
    // default, like Spark's own analysis) and validate the operator's
    // bigint contract HERE — a wrong-typed column used to plan fine
    // and then die mid-stage as an executor-side MatchError
    val resolver = spark.sessionState.conf.resolver
    def resolve(name: String): Expression = {
      val attr = plan.output.find(a => resolver(a.name, name))
        .getOrElse(sys.error(s"column $name not found in " +
          s"[${plan.output.map(_.name).mkString(", ")}]"))
      require(attr.dataType ==
        org.apache.spark.sql.types.LongType,
        s"topKPerKey wants bigint columns; $name is ${attr.dataType}")
      attr
    }
    org.apache.spark.sql.GraftRegistry.dataFrame(spark,
      TopKPerKey(k, resolve(keyCol), resolve(orderCol), resolve(tieCol),
        plan))
  }
}

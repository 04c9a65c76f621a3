package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite the standard window top-k idiom
  *
  * {{{ ... row_number() OVER (PARTITION BY key ORDER BY ord DESC [, tie])
  *     ... WHERE rn <= k }}}
  *
  * into the bounded-heap [[TopKPerKey]] operator, so a user writing the
  * plain SQL/DataFrame formulation gets the O(n log k) single-pass
  * physical plan without calling the operator API. This is the last rung
  * of the extension ladder — `Expression` kernels, a `LogicalPlan` +
  * `SparkStrategy` (TopKPerKey), and now a `Rule[LogicalPlan]` that
  * retargets existing query shapes onto it — injected together by
  * [[graft.GraftExtensions]].
  *
  * The rule fires only where the operator's contract provably matches
  * the window it replaces:
  *  - exactly one window expression, and it is `row_number()`;
  *  - one partition key, bigint-typed (the exec clusters on a long key);
  *  - ORDER BY is `ord DESC [NULLS LAST]` with an optional bigint tie
  *    `tie ASC` — Spark's default null orderings (DESC=NULLS LAST,
  *    ASC=NULLS FIRST) are both honored via the exec's `tieNullsFirst`;
  *    a missing tie becomes the constant 0 (same arbitrary-among-equals
  *    semantics as row_number itself);
  *  - the filter bounds the rank from above with an integer literal
  *    (`<=`, `<`, `=1`, or the mirrored forms). Other conjuncts are kept
  *    in a residual Filter.
  *
  * The rewritten subtree keeps the original Window node on TOP of
  * TopKPerKey (same alias, same exprId, so downstream references to the
  * rank column stay valid): the heap reduces each key group to at most k
  * rows, and the re-window ranks only those — a per-key sort of k rows
  * instead of the whole group. The rank-limit conjuncts are dropped
  * because the re-windowed rank is <= k by construction.
  *
  * Relation to Spark's own InferWindowGroupLimit (3.5+): the native rule
  * prunes rows around the full sort-based Window; this one replaces the
  * sort with a heap. They compose — if the native rule has already
  * inserted a WindowGroupLimit below the Window, the rewrite still
  * applies on top of it.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** k such that the conjunct means `rank <= k`, if it does. */
  private def rankLimit(e: Expression, rank: Attribute): Option[Int] =
    e match {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k))
          if a.semanticEquals(rank) => Some(k)
      case LessThan(a: Attribute, IntegerLiteral(k))
          if a.semanticEquals(rank) => Some(k - 1)
      case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute)
          if a.semanticEquals(rank) => Some(k)
      case GreaterThan(IntegerLiteral(k), a: Attribute)
          if a.semanticEquals(rank) => Some(k - 1)
      case EqualTo(a: Attribute, IntegerLiteral(1))
          if a.semanticEquals(rank) => Some(1)
      case EqualTo(IntegerLiteral(1), a: Attribute)
          if a.semanticEquals(rank) => Some(1)
      case _ => None
    }

  /** (rank attr, key, order, tie, tieNullsFirst) when the window is one
    * the operator can implement exactly.
    */
  private def eligible(w: Window)
      : Option[(Attribute, Expression, Expression, Expression, Boolean)] =
    w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(_: RowNumber,
          WindowSpecDefinition(Seq(key), orderSpec, _)), _))
          if key.dataType == LongType =>
        orderSpec match {
          case Seq(o)
              if o.direction == Descending &&
                o.nullOrdering == NullsLast &&
                o.child.dataType == LongType =>
            Some((a.toAttribute, key, o.child, Literal(0L), false))
          case Seq(o, t)
              if o.direction == Descending &&
                o.nullOrdering == NullsLast &&
                o.child.dataType == LongType &&
                t.direction == Ascending &&
                t.child.dataType == LongType =>
            Some((a.toAttribute, key, o.child, t.child,
              t.nullOrdering == NullsFirst))
          case _ => None
        }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // opt-out for the operator's inverse regime (extreme per-partition
    // key cardinality, where the spillable native Window is safer —
    // see TopKPerKeyExec's envelope note)
    if (!conf.getConfString("graft.window.topk.rewrite", "true")
        .toBoolean)
      return plan
    plan.transform {
    case f @ Filter(cond, w: Window)
        if !w.child.isInstanceOf[TopKPerKey] =>
      eligible(w) match {
        case Some((rank, key, ord, tie, tnf)) =>
          val conjuncts = splitConjunctivePredicates(cond)
          val ks = conjuncts.flatMap(c => rankLimit(c, rank))
          if (ks.isEmpty || ks.min < 1) f
          else {
            val rest =
              conjuncts.filter(c => rankLimit(c, rank).isEmpty)
            val newW =
              w.copy(child = TopKPerKey(ks.min, key, ord, tie, w.child, tnf))
            if (rest.isEmpty) newW else Filter(rest.reduce(And), newW)
          }
        case None => f
      }
    }
  }
}

/** Runtime attach for sessions the library did not build (mirrors
  * [[TopKPerKeyOps]]'s strategy registration): adds both the strategy
  * and the rewrite to the session's experimental hooks.
  */
object WindowTopKRewriteOps {
  def ensureRegistered(spark: SparkSession): Unit = {
    TopKPerKeyOps.ensureStrategy(spark)
    if (!spark.experimental.extraOptimizations.contains(WindowTopKRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ WindowTopKRewrite
  }
}

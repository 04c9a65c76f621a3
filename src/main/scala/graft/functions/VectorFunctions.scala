package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Codegen'd dot product of two `array<float>` columns, in DOUBLE.
  *
  * The similarity/dedup operators fold embedding pairs millions of times
  * per query (e.g. `dd_embed_cosine` at sf0.1: 12.5 M pairs x 64 dims);
  * the equivalent higher-order-function pipeline
  * (`aggregate(zip_with(...))`) is interpreted per element — this
  * expression compiles to a tight Java loop inside whole-stage codegen
  * instead (~20x less per-pair overhead).
  *
  * Semantics are EXACTLY the HOF fold it replaces (and the DuckDB
  * oracle's `list_reduce`): cast each float to double, multiply, add
  * left-to-right from 0.0 — bit-identical IEEE sequence, so swapping it
  * in changes nothing in the correctness gate.
  *
  * Nulls: null if either array is null; arrays are assumed element-
  * complete (embeddings are dense); length mismatch folds the common
  * prefix, matching `zip_with`'s null-padding + `+` null-absorption is
  * NOT mirrored — keep inputs equal-length (they are: fixed-dim vectors).
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<float>, array<float>), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd intersection count of two SORTED DISTINCT `array<bigint>`
  * columns — the hot inner loop of pairwise set-similarity (Jaccard).
  *
  * A two-pointer merge: O(|a|+|b|), zero allocation, inside whole-stage
  * codegen. Equals `len(list_intersect(a, b))` in DuckDB (count of common
  * distinct elements) as long as both inputs are sorted ascending with no
  * duplicates — which the call sites guarantee via
  * `array_sort(array_distinct(...))`. Exact integer result, so there is
  * no cross-engine float concern at all.
  */
case class SortedArrayIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_isect expects (array<bigint>, array<bigint>), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_isect"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedArrayIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Registration of graft's native expressions on an arbitrary session
  * (including one the harness created), via the catalyst registry shim.
  */
object VectorFunctions {
  /** Idempotent: makes graft's native expressions resolvable in SQL. */
  def ensureRegistered(spark: SparkSession): Unit = {
    org.apache.spark.sql.GraftRegistry.register(spark, "graft_dot",
      (children: Seq[Expression]) =>
        FloatDotProduct(children(0), children(1)))
    org.apache.spark.sql.GraftRegistry.register(spark, "graft_isect",
      (children: Seq[Expression]) =>
        SortedArrayIntersectCount(children(0), children(1)))
    org.apache.spark.sql.GraftRegistry.register(spark, "graft_minhash16",
      (children: Seq[Expression]) => MinhashSignatures(children(0)))
    org.apache.spark.sql.GraftRegistry.register(spark, "graft_rh_buckets",
      (children: Seq[Expression]) => RhLshBuckets(children(0)))
    org.apache.spark.sql.GraftRegistry.register(spark, "graft_simhash16",
      (children: Seq[Expression]) => Simhash16(children(0)))
    org.apache.spark.sql.GraftRegistry.register(spark, "graft_simhash64",
      (children: Seq[Expression]) => Simhash64(children(0), children(1)))
    org.apache.spark.sql.GraftRegistry.register(spark, "graft_bloom_contains",
      (children: Seq[Expression]) => BloomContains(children(0), children(1)))
    org.apache.spark.sql.GraftRegistry.register(spark, "graft_h16",
      (children: Seq[Expression]) => Md5PrefixHash(children(0), 4))
    org.apache.spark.sql.GraftRegistry.register(spark, "graft_h32",
      (children: Seq[Expression]) => Md5PrefixHash(children(0), 8))
    org.apache.spark.sql.GraftRegistry.register(spark, "graft_h64",
      (children: Seq[Expression]) => Md5PrefixHash(children(0), 15))
    org.apache.spark.sql.GraftRegistry.register(spark, "graft_h16a",
      (children: Seq[Expression]) => Md5SegmentHashArray(children(0), 1, 4))
    org.apache.spark.sql.GraftRegistry.register(spark, "graft_h32a",
      (children: Seq[Expression]) => Md5SegmentHashArray(children(0), 1, 8))
    org.apache.spark.sql.GraftRegistry.register(spark, "graft_h32b",
      (children: Seq[Expression]) => Md5SegmentHashArray(children(0), 9, 8))
    org.apache.spark.sql.GraftRegistry.register(spark, "graft_h64sd",
      (children: Seq[Expression]) =>
        Md5PrefixSortedDistinct(children(0), 15))
    org.apache.spark.sql.GraftRegistry.register(spark, "graft_cdc_ends",
      (children: Seq[Expression]) => CdcEnds(children(0)))
    org.apache.spark.sql.GraftRegistry.register(spark, "graft_char3grams",
      (children: Seq[Expression]) => CharNgrams(children(0), 3))
    org.apache.spark.sql.GraftRegistry.register(spark, "graft_char5grams",
      (children: Seq[Expression]) => CharNgrams(children(0), 5))
  }
}

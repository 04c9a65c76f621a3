package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Bloom-filter runtime join pruning — the distributed pattern behind
  * Spark's own `InjectRuntimeFilter`, expressed as a reusable UDAF +
  * native expression pair so any query can build a filter over the
  * small join side and prune the big side's scan BEFORE the shuffle:
  *
  * {{{
  *   WITH bloom AS (SELECT graft_bloom_agg(key) AS bits FROM small_dims)
  *   SELECT ... FROM big b JOIN small_dims d ON b.key = d.key
  *   WHERE graft_bloom_contains((SELECT bits FROM bloom), b.key)
  * }}}
  *
  * The scalar subquery executes once; the contains check is a codegen'd
  * per-row probe on the scan side, so only rows that can possibly join
  * reach the exchange. False positives are re-checked by the join
  * itself — the construct never changes query semantics, which is why
  * its oracle is the PLAIN join SQL.
  *
  * Sizing: 2048 words = 128 Kibit. With k = 6 hashes that holds ~6 k
  * keys at ~2e-4 false-positive rate and ~30 k keys at ~2 %; at 100 TB
  * size `NumWords` from an `approx_count_distinct` pre-pass the same
  * way Spark's adaptive runtime filter does (the filter itself is a
  * 16 KiB broadcast either way — far below any broadcast threshold).
  *
  * Hashing is splitmix64 double-hashing (Kirsch-Mitzenmacher): bit_j =
  * (h1 + j*h2) mod m with h2 forced odd — 2 mixes per key total, not k.
  */
object BloomFns {
  val NumWords = 2048
  val NumBits: Int = NumWords * 64
  val K = 6

  /** splitmix64 finalizer — a full-avalanche mix of a 64-bit key. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def bitIndex(h1: Long, h2: Long, j: Int): Int =
    (((h1 + j.toLong * h2) & Long.MaxValue) % NumBits).toInt

  def add(bits: Array[Long], key: Long): Unit = {
    val h1 = mix(key)
    val h2 = mix(key ^ 0x5851F42D4C957F2DL) | 1L
    var j = 0
    while (j < K) {
      val idx = bitIndex(h1, h2, j)
      bits(idx >>> 6) |= 1L << (idx & 63)
      j += 1
    }
  }

  def contains(bits: Array[Long], key: Long): Boolean = {
    val h1 = mix(key)
    val h2 = mix(key ^ 0x5851F42D4C957F2DL) | 1L
    var j = 0
    while (j < K) {
      val idx = bitIndex(h1, h2, j)
      if ((bits(idx >>> 6) & (1L << (idx & 63))) == 0L) return false
      j += 1
    }
    true
  }

  /** ArrayData entry point for generated code (static forwarder).
    * Reads words in place — no per-row toLongArray() copy of the 16 KiB
    * filter on the scan-side probe path.
    */
  def containsArrayData(bits: ArrayData, key: Long): Boolean = {
    val h1 = mix(key)
    val h2 = mix(key ^ 0x5851F42D4C957F2DL) | 1L
    var j = 0
    while (j < K) {
      val idx = bitIndex(h1, h2, j)
      if ((bits.getLong(idx >>> 6) & (1L << (idx & 63))) == 0L) return false
      j += 1
    }
    true
  }
}

/** `graft_bloom_agg(key)` — build the filter over a key column. The
  * partial/final split is safe because merge is a bitwise OR. Null keys
  * are rejected up front (a Bloom filter can't represent "unknown");
  * filter nulls out or coalesce before aggregating.
  */
object BloomAgg extends Aggregator[java.lang.Long, Array[Long], Array[Long]] {
  override def zero: Array[Long] = new Array[Long](BloomFns.NumWords)

  override def reduce(b: Array[Long], key: java.lang.Long): Array[Long] = {
    require(key != null,
      "graft_bloom_agg: null key (filter nulls before aggregating)")
    BloomFns.add(b, key)
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

/** `graft_bloom_contains(bits, key)` — codegen'd membership probe.
  * Null-safe: a null key (or null filter) yields null like any binary
  * expression, so rows with null keys are filtered out — matching inner
  * join semantics, where a null key never joins anyway.
  */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains expects (array<bigint>, bigint), " +
          s"got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_bloom_contains"

  override protected def nullSafeEval(bits: Any, key: Any): Any =
    BloomFns.containsArrayData(bits.asInstanceOf[ArrayData],
      key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (bits, key) =>
      s"graft.functions.BloomFns.containsArrayData($bits, $key)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}

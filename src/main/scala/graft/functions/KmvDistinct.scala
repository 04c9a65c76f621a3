package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded KMV state: up to [[KmvDistinct.K]] smallest DISTINCT hashes,
  * kept sorted ascending.
  */
case class KmvBuffer(hs: Seq[Long])

/** K-minimum-values distinct-count sketch as a typed Aggregator — the
  * bounded-memory cardinality estimate a 100 TB pipeline uses where
  * `COUNT(DISTINCT)` would shuffle every distinct value: the buffer is a
  * fixed 64 longs per group regardless of input size, merges are
  * order-independent set-merges (safe under Spark's partial/final
  * split), and the estimate is the classic (K-1)/h_K over the hash
  * space.
  *
  * Cross-engine determinism: the caller feeds 60-bit md5-prefix hashes
  * (the Dedup pack's `sparkH64` construction), so DuckDB can state the
  * identical result with `list_sort(list_distinct(list(h)))[K]` — same
  * hashes, same k-th order statistic, and the estimate is one exact
  * double multiply (63 * 2^60 — both factors and the product are exact
  * doubles) and one correctly-rounded division, finished HALF_UP to 6
  * like the oracle's `round(..., 6)`. Fewer than K distinct hashes means
  * the buffer IS the distinct set and the exact count is returned.
  */
object KmvDistinct extends Aggregator[Long, KmvBuffer, Double] {

  val K = 64
  private val Space = 1152921504606846976.0 // 2^60, exact in double

  override def zero: KmvBuffer = KmvBuffer(Vector.empty)

  private def insert(b: KmvBuffer, h: Long): KmvBuffer = {
    val hs = b.hs
    if (hs.length == K && h >= hs.last) b
    else if (hs.contains(h)) b
    else KmvBuffer(((hs :+ h).sorted).take(K))
  }

  override def reduce(b: KmvBuffer, h: Long): KmvBuffer = insert(b, h)

  override def merge(a: KmvBuffer, b: KmvBuffer): KmvBuffer =
    b.hs.foldLeft(a)(insert)

  override def finish(b: KmvBuffer): Double =
    if (b.hs.length < K) b.hs.length.toDouble
    else {
      val est = (K - 1).toDouble * Space / b.hs.last.toDouble
      JBigDecimal.valueOf(est).setScale(6, RoundingMode.HALF_UP).doubleValue()
    }

  override def bufferEncoder: Encoder[KmvBuffer] = Encoders.product[KmvBuffer]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

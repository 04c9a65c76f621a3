package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Accumulated scaled sums: Σ m4(price*qty) and Σ m4(qty) (1e-4 units). */
case class WmBuffer(sumPQ: Long, sumQ: Long)

/** Custom typed UDAF (SURVEY.md §2.5/§2.10): quantity-weighted mean via
  * `Aggregator[IN, BUF, OUT]`, the Dataset-native aggregation extension
  * point. Registered per query with `functions.udaf(...)`.
  *
  * Cross-engine determinism follows the Engine.m4 discipline: per-row
  * measures are quantized with `floor(x * 1e4 + 0.5)` (pure IEEE ops),
  * buffered as exact bigint sums (order-independent merge — the partial/
  * final split Spark applies automatically is safe), and finalized with
  * one double division and a HALF_UP round to 6 digits — the identical
  * arithmetic the oracle SQL states.
  */
object WeightedMean extends Aggregator[(Double, Double), WmBuffer, Double] {

  private def m4(x: Double): Long = math.floor(x * 10000.0 + 0.5).toLong

  override def zero: WmBuffer = WmBuffer(0L, 0L)

  override def reduce(b: WmBuffer, in: (Double, Double)): WmBuffer = {
    val (price, qty) = in
    WmBuffer(b.sumPQ + m4(price * qty), b.sumQ + m4(qty))
  }

  override def merge(a: WmBuffer, b: WmBuffer): WmBuffer =
    WmBuffer(a.sumPQ + b.sumPQ, a.sumQ + b.sumQ)

  override def finish(b: WmBuffer): Double = {
    // zero total weight (an empty group, or quantities that all
    // quantize to 0): 0/0 is NaN and x/0 Infinity, and
    // BigDecimal.valueOf on either THROWS — return NaN directly, the
    // IEEE answer, instead of failing the whole query on a degenerate
    // group
    if (b.sumQ == 0L) return Double.NaN
    val ratio = (b.sumPQ.toDouble / 10000.0) / (b.sumQ.toDouble / 10000.0)
    // same semantics as Spark's round(double, 6) / DuckDB round
    JBigDecimal.valueOf(ratio).setScale(6, RoundingMode.HALF_UP).doubleValue()
  }

  override def bufferEncoder: Encoder[WmBuffer] = Encoders.product[WmBuffer]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

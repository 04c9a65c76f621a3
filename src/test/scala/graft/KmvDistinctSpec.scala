package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.KmvDistinct

/** Algebraic contract of the KMV distinct-count sketch: exact below K,
  * duplicate-insensitive, merge-order-independent (required for Spark's
  * partial/final aggregation split), and usefully accurate above K.
  */
class KmvDistinctSpec extends AnyFunSuite {

  /** splitmix64-style mix truncated to the 60-bit space — KMV's estimate
    * assumes UNIFORM hashes (q30 feeds md5 prefixes; an unmixed LCG here
    * concentrates at the bottom of the space and breaks the estimator).
    */
  private def hash(i: Long): Long = {
    var z = i + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    (z ^ (z >>> 31)) & ((1L << 60) - 1)
  }

  private def sketch(hs: Seq[Long]) =
    hs.foldLeft(KmvDistinct.zero)(KmvDistinct.reduce)

  test("fewer than K distinct hashes returns the exact count") {
    val b = sketch((1L to 10L).map(hash))
    assert(KmvDistinct.finish(b) == 10.0)
    // duplicates never inflate the count
    assert(KmvDistinct.finish(KmvDistinct.reduce(b, hash(5))) == 10.0)
  }

  test("merge of split halves equals sequential reduction") {
    val xs = (1L to 500L).map(hash)
    val (l, r) = xs.splitAt(250)
    val merged = KmvDistinct.merge(sketch(l), sketch(r))
    assert(KmvDistinct.finish(merged) == KmvDistinct.finish(sketch(xs)))
    // and in the other merge order (commutativity)
    val swapped = KmvDistinct.merge(sketch(r), sketch(l))
    assert(KmvDistinct.finish(swapped) == KmvDistinct.finish(sketch(xs)))
  }

  test("estimate lands near the true cardinality above K") {
    val est = KmvDistinct.finish(sketch((1L to 500L).map(hash)))
    assert(math.abs(est - 500.0) / 500.0 < 0.3, est)
  }
}

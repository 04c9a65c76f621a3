package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Pins `Dedup.simhash64Candidates` — the tunable Manku-style block
  * scheme behind the fixed 4x16 SimHash banding — in both directions:
  *
  *   - GUARANTEE: the candidate set at (blocks, k) contains EVERY pair
  *     at Hamming distance <= k (pigeonhole over untouched blocks),
  *     verified against a brute-force scan, including planted
  *     adversarial flips that straddle block boundaries.
  *   - NOISE SHRINK: on random signatures the 6-block scheme (20
  *     tables keyed on ~33 bits) produces orders of magnitude fewer
  *     background candidates than the 4-block scheme (4 tables keyed
  *     on 16 bits) — the knob that keeps SimHash candidate volume
  *     from going quadratic once the corpus outgrows the 16-bit key
  *     space.
  */
class SimhashScalingSpec extends AnyFunSuite {

  private val spark = SparkSessionHelper.spark

  /** Seeded signature set with planted near-duplicates: base sigs are
    * uniform random longs; each planted dup flips exactly `k` distinct
    * bits of its base (the worst case for the pigeonhole).
    */
  private def sigSet(seed: Long, n: Int, planted: Int, k: Int)
      : IndexedSeq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    val base = (0 until n).map(i => (i.toLong, rnd.nextLong()))
    val dups = (0 until planted).map { i =>
      val (_, sig) = base(rnd.nextInt(n))
      var s = sig
      // flip k DISTINCT bit positions
      val bits = rnd.shuffle((0 until 64).toList).take(k)
      bits.foreach(b => s ^= (1L << b))
      ((n + i).toLong, s)
    }
    base ++ dups
  }

  test("6-block candidates contain exactly the brute-force Hamming<=3 " +
       "closure's pairs (guarantee, both schemes)") {
    val spark0 = spark
    import spark0.implicits._
    val rows = sigSet(seed = 7, n = 1500, planted = 60, k = 3)
    val sigs = rows.toDF("doc_id", "sig")
    // brute force reference: every pair at Hamming <= 3
    val want = (for {
      i <- rows.indices.iterator
      j <- (i + 1) until rows.size
      if java.lang.Long.bitCount(rows(i)._2 ^ rows(j)._2) <= 3
    } yield {
      val (a, b) = (rows(i)._1, rows(j)._1)
      (math.min(a, b), math.max(a, b))
    }).toSet
    assert(want.size >= 60, s"fixture too sparse: ${want.size}")
    Seq((4, 3), (6, 3)).foreach { case (blocks, k) =>
      val cands = Dedup.simhash64Candidates(sigs, blocks, k)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val missed = want -- cands
      assert(missed.isEmpty,
        s"($blocks, $k) missed ${missed.size}: ${missed.take(3)}")
    }
  }

  test("the 6-block scheme cuts random-signature candidates by orders " +
       "of magnitude vs the 4x16 banding") {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new scala.util.Random(11)
    val sigs = (0 until 20000).map(i => (i.toLong, rnd.nextLong()))
      .toDF("doc_id", "sig")
    val narrow = Dedup.simhash64Candidates(sigs, 4, 3).count()
    val wide = Dedup.simhash64Candidates(sigs, 6, 3).count()
    // expectations on pure noise: 4 tables x C(20000,2)/2^16 ~ 12k
    // vs 20 tables x C(20000,2)/2^33 ~ 0.5
    assert(narrow > 1000L, s"narrow=$narrow")
    assert(wide < narrow / 100L, s"wide=$wide narrow=$narrow")
  }
}

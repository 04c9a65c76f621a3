package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Pins the RH-LSH banding's corpus-scale tuning knob
  * (`Dedup.embedLshCandidates` / `graft_rh_buckets_n`) in both
  * directions of the trade:
  *
  *   - NOISE SHRINK: on unrelated vectors, candidate volume falls
  *     ~2^(rows delta) as bucket width grows — the knob that keeps
  *     background collisions from going quadratic in corpus size
  *     (the fixed 12x5 family has only 32 buckets per band, so its
  *     noise candidates are `12 * n^2 / 64` at ANY n; a deployment
  *     sizes rows ~ log2(n / bands)).
  *   - RECALL: planted near-duplicates (tiny perturbations, cos
  *     ~0.99+) still collide in at least one band at the wider width,
  *     because `bands` grows alongside `rows` per the
  *     `1 - (1 - a^rows)^bands` recall formula.
  */
class LshScalingSpec extends AnyFunSuite {

  private val spark = SparkSessionHelper.spark
  private val dir = "/root/testdata/sf0.01"

  test("wider bands cut noise candidates by orders of magnitude") {
    val emb = Engine.table(spark, dir, "embeddings")
      .selectExpr("vec_id", "embedding")
    val narrow = Dedup.embedLshCandidates(emb, bands = 12, rows = 5).count()
    val wide = Dedup.embedLshCandidates(emb, bands = 24, rows = 12).count()
    // For PURE noise the per-pair collision probability drops from
    // 1-(1-2^-5)^12 ~ 0.32 to 1-(1-2^-12)^24 ~ 0.006 (~54x). The
    // fixture is not pure noise — its genuinely-correlated pairs (the
    // ones dedup is FOR) keep colliding at the wider width, which is
    // the recall half of the trade — so the measured sf0.01 reduction
    // is ~7x (28671 -> 4158, n=500). Assert the direction with margin:
    // >=80% of narrow-band candidates are width-5 noise that the wider
    // banding no longer pays to re-score.
    assert(narrow > 0, "fixture produced no narrow-band candidates")
    assert(wide.toDouble < 0.2 * narrow.toDouble,
      s"wide=$wide narrow=$narrow")
  }

  test("planted near-duplicates survive the wider banding") {
    val spark0 = spark
    import spark0.implicits._
    val base = Engine.table(spark, dir, "embeddings")
      .selectExpr("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    // plant one near-dup per base vector: clone + deterministic tiny
    // perturbation (~1% relative), cos >= 0.99 -> per-plane sign
    // agreement a ~ 0.97; recall at 24x12 is 1-(1-0.97^12)^24 ~ 1-5e-5
    val planted = base.flatMap { case (id, v) =>
      val rnd = new scala.util.Random(id)
      val dup = v.map(x => x + (rnd.nextFloat() - 0.5f) * 0.02f *
        math.max(1e-3f, math.abs(x)))
      Seq((id, v), (id + 1000000L, dup))
    }
    val emb = planted.toSeq.toDF("vec_id", "embedding")
    val cands = Dedup.embedLshCandidates(emb, bands = 24, rows = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = base.map(_._1)
      .filterNot(id => cands.contains((id, id + 1000000L)))
    assert(missed.isEmpty,
      s"${missed.length} planted near-dups missed: ${missed.take(5).toSeq}")
  }
}

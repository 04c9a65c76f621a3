package graft

import org.scalatest.funsuite.AnyFunSuite

/** Measures what the sim_ivfpq_refine stage buys. The serve path has
  * two recall limiters: the coarse probe (which cells are searched at
  * all) and ADC quantization noise (how candidates are ordered). The
  * refine stage can only fix the second, so the gate is differential:
  * refine's output must EQUAL the exact re-rank of the independently
  * recomputed ADC top-R pool (set equality, not a threshold), the
  * ADC-only top-3 must actually differ from that exact ordering
  * (re-ranking changes the answer), and globally refine can never
  * trail ADC (its top-3 are the exact-best of a superset of ADC's).
  *
  * A global-recall bar against the banded-LSH baseline
  * (sim_ann_recall ~0.72 recall@5 on this fixture) is NOT asserted,
  * deliberately: at the pack's spec-scale constants — K=4 coarse cells
  * probed 2-wide and 4-entry sub-codebooks over near-uniform noise
  * vectors — PQ codes carry almost no ordering information (measured
  * in-pool recall@3 of the ADC stage here: ~0.17), so the two-stage
  * serve bottoms out at probe coverage regardless of how well refine
  * re-ranks. That is a property of the toy constants (production
  * indexes carry thousands of cells and 256-entry codebooks), not of
  * the operator shape this spec pins.
  */
class IvfPqRefineSpec extends AnyFunSuite {

  private val spark = SparkSessionHelper.spark
  private val dir = "/root/testdata/sf0.001"
  /** The similarity pack's query split (vec_id >= IvfQ are queries). */
  private val IvfQ = 492

  test("refine output is exactly the exact re-rank of the ADC top-R pool") {
    val x4 = "transform(embedding, x ->" +
      " cast(floor(cast(x as double) * 10000.0 + 0.5) as bigint))"
    spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", s"$x4 AS x4").createOrReplaceTempView("rf_e")
    val distExpr =
      "aggregate(zip_with(q.x4, c.x4, (a, b) -> (a - b) * (a - b))," +
        " cast(0 as bigint), (acc, d) -> acc + d)"

    // the ADC top-R pool, recomputed independently of the refine query
    graft.operators.Similarity.ivfpqAdcTopR(spark, dir)
      .select("query_id", "neighbor_id")
      .createOrReplaceTempView("rf_pool")
    // exact top-3 within that pool = what a correct refine must emit
    val poolTruth = spark.sql(
      s"""SELECT query_id, neighbor_id FROM (
         |  SELECT p.query_id, p.neighbor_id,
         |    row_number() OVER (PARTITION BY p.query_id
         |      ORDER BY $distExpr, p.neighbor_id) AS rnk
         |  FROM rf_pool p
         |  JOIN rf_e q ON q.vec_id = p.query_id
         |  JOIN rf_e c ON c.vec_id = p.neighbor_id)
         |WHERE rnk <= 3""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    def top3(name: String): Set[(Long, Long)] =
      SparkEntry.queries(name)(spark, dir)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val adc = top3("sim_ivfpq_pretrained")
    val refine = top3("sim_ivfpq_refine")

    assert(refine == poolTruth,
      s"refine != exact re-rank of pool: only-refine=" +
        s"${refine.diff(poolTruth)}, only-truth=${poolTruth.diff(refine)}")
    assert(adc != poolTruth,
      "ADC-only top-3 already equals the exact ordering — the refine " +
        "stage would be a no-op on this fixture")

    // global truth: refine can never trail ADC
    val globalTruth = spark.sql(
      s"""SELECT query_id, neighbor_id FROM (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY $distExpr, c.vec_id) AS rnk
         |  FROM rf_e q JOIN rf_e c
         |    ON q.vec_id >= $IvfQ AND c.vec_id < $IvfQ)
         |WHERE rnk <= 3""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(got: Set[(Long, Long)]): Double =
      got.intersect(globalTruth).size.toDouble / globalTruth.size
    assert(recall(refine) >= recall(adc))
  }
}

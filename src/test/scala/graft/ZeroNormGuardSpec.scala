package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** The zero-norm band-side guard on the embed-LSH path (the
  * embedding-space twin of ShortDocGuardSpec's empty-shingle guard).
  *
  * A zero vector's hyperplane dots are all 0, so graft_rh_buckets
  * assigns it the CONSTANT sign-bucket in every band — all zero-norm
  * vectors share one bucket, a quadratic candidate bomb at corpus
  * scale — while its cosine to anything is 0/0 = NaN, which the
  * NaN-is-greatest comparison semantics of BOTH engines would pass
  * through the >= 0.4 verify as a bogus edge. The guard keeps
  * zero-norm vectors off the band side entirely; this spec pins that
  * they generate no pairs, no cluster edges, and still surface as
  * singleton clusters, with the real vectors' results unchanged.
  */
class ZeroNormGuardSpec extends AnyFunSuite {

  private val spark = SparkSessionHelper.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val doctoredDir: String = {
    val d = java.nio.file.Files
      .createTempDirectory("graft_zeronorm").toString
    val real = spark.read.parquet(s"$dir/embeddings.parquet")
    val dim = real.selectExpr("size(embedding)").head.getInt(0)
    val zeros = spark
      .createDataFrame(Seq(
        (20000L, Seq.fill(dim)(0.0f), 0),
        (20001L, Seq.fill(dim)(0.0f), 0)))
      .toDF("vec_id", "embedding", "label")
    real.unionByName(zeros)
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private val zeroIds = Set(20000L, 20001L)

  test("dd_embed_cosine_lsh: zero vectors pair with nothing (not even " +
      "each other), real-vector pairs unchanged") {
    val doctored = SparkEntry.queries("dd_embed_cosine_lsh")(
        spark, doctoredDir)
      .select("vec_a", "vec_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(doctored.forall { case (a, b) =>
      !zeroIds.contains(a) && !zeroIds.contains(b)
    }, "zero-norm vector leaked into the banded pair output")
    val original = SparkEntry.queries("dd_embed_cosine_lsh")(spark, dir)
      .select("vec_a", "vec_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(doctored == original,
      "guard changed the real vectors' pair set")
  }

  test("dd_embed_cluster: zero vectors are singletons, real clustering " +
      "unchanged") {
    val doctored = SparkEntry.queries("dd_embed_cluster")(
        spark, doctoredDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    zeroIds.foreach { id =>
      assert(doctored.get(id).contains(id),
        s"zero vector $id must be its own singleton cluster")
    }
    val original = SparkEntry.queries("dd_embed_cluster")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(doctored.filterKeys(!zeroIds.contains(_)).toMap == original,
      "guard changed the clustering of the real vectors")
  }

  test("embedLshCandidates (tunable banding): zero vectors generate " +
      "zero candidates") {
    val emb = spark.read.parquet(s"$doctoredDir/embeddings.parquet")
    val cand = Dedup.embedLshCandidates(emb, bands = 6, rows = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cand.forall { case (a, b) =>
      !zeroIds.contains(a) && !zeroIds.contains(b)
    }, "zero-norm vector leaked into the tunable candidate generator")
  }
}

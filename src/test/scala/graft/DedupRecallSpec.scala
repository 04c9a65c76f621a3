package graft

import org.scalatest.funsuite.AnyFunSuite

/** The contract between the exact embedding-near-dup spec and its LSH
  * approximation (Dedup.scala, dd_embed_cosine vs dd_embed_cosine_lsh):
  * the banded variant may MISS threshold pairs (probabilistic recall,
  * documented at the operator) but must never invent one, and every pair
  * it keeps must carry the identical exact re-scored cosine.
  */
class DedupRecallSpec extends AnyFunSuite {

  private val spark = SparkSessionHelper.spark
  private val dir = "/root/testdata/sf0.001"

  private def pairs(name: String): Map[(Long, Long), Double] =
    SparkEntry.queries(name)(spark, dir).collect().map { r =>
      (r.getLong(0), r.getLong(1)) -> r.getDouble(2)
    }.toMap

  test("dd_embed_cosine_lsh is a subset of the exact spec, scores equal") {
    val exact = pairs("dd_embed_cosine")
    val lsh = pairs("dd_embed_cosine_lsh")
    assert(exact.nonEmpty, "exact spec found no pairs at sf0.001")
    val invented = lsh.keySet -- exact.keySet
    assert(invented.isEmpty, s"LSH invented non-threshold pairs: $invented")
    lsh.foreach { case (k, sim) =>
      assert(exact(k) == sim, s"re-scored cosine diverges on $k")
    }
  }

  private def clusters(name: String): Map[Long, Long] =
    SparkEntry.queries(name)(spark, dir).collect().map { r =>
      r.getLong(0) -> r.getLong(1)
    }.toMap

  // Banded edges ⊆ exact edges  ⟺  the banded partition REFINES the
  // exact partition: two vectors the banded path clusters together must
  // be together in the exact clustering too (an edge the banding kept is
  // a real threshold edge), while exact clusters may merge several
  // banded ones (missed edges only split, never mix). This gates
  // candidate recall on the CLUSTER path against the exact spec — the
  // direction a hash-compare over the shared banded candidate set
  // cannot see.
  // Adversarial size-skew fixture: a tiny doc that is a verbatim prefix
  // of a huge doc. Containment = 1.0 (every tiny bigram appears in the
  // huge doc) but Jaccard ≈ 11/311 — far below anything the 8x2
  // Jaccard-tuned MinHash banding reliably collides on. The prefix-
  // filter scheme must find it by construction (guaranteed recall).
  test("dd_containment_smallside finds tiny-doc-in-huge-doc pairs") {
    import spark.implicits._
    val tiny = (1 to 12).map(i => s"t$i").mkString(" ")
    val huge = tiny + " " + (1 to 300).map(i => s"f$i").mkString(" ")
    val fixDir =
      java.nio.file.Files.createTempDirectory("graft_contp").toString
    Seq((1L, tiny), (2L, huge)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$fixDir/documents.parquet")
    val got = SparkEntry.queries("dd_containment_smallside")(spark, fixDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 2L, 1.0)),
      s"expected the contained pair with containment 1.0, got ${got.toSeq}")
  }

  // Boilerplate-skew fixture: 40 docs share a 60-token boilerplate
  // block (hot shingles, df = 40) and differ only in a 40-token unique
  // tail; one genuine containment pair (rare tiny doc + its host) is
  // planted. Recall is guaranteed for ANY probe prefix (pigeonhole), so
  // both orders must find exactly the planted pair — the difference
  // rarest-first buys is CANDIDATE FAN-OUT: a naive smallest-hash
  // prefix probes with boilerplate hashes and candidates explode toward
  // all-pairs (~C(40,2)), while df-ascending probes stay on the df-1
  // tail shingles and produce candidates ~= the true pair alone.
  test("rarest-first probes prune boilerplate fan-out, recall stays 100%") {
    import spark.implicits._
    val bp = (1 to 60).map(i => s"bp$i").mkString(" ")
    val hosts = (1 to 40).map { d =>
      (d.toLong, bp + " " + (1 to 40).map(i => s"u${d}x$i").mkString(" "))
    }
    val tiny = (1 to 12).map(i => s"r$i").mkString(" ")
    val all = hosts :+
      (100L, tiny) :+
      (101L, tiny + " " + (1 to 300).map(i => s"g$i").mkString(" "))
    val fixDir =
      java.nio.file.Files.createTempDirectory("graft_bpskew").toString
    all.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$fixDir/documents.parquet")
    // independent all-pairs ground truth over distinct word bigrams
    def shingles(t: String): Set[String] =
      t.split(" ").sliding(2).map(_.mkString(" ")).toSet
    val sets = all.map { case (id, t) => id -> shingles(t) }.toMap
    val ids = all.map(_._1)
    val truth = (for {
      a <- ids; b <- ids if a < b
      c = (sets(a) & sets(b)).size.toDouble /
        math.min(sets(a).size, sets(b).size)
      if c >= 0.8
    } yield (a, b)).toSet
    assert(truth == Set((100L, 101L)), s"fixture sanity: $truth")
    val got = SparkEntry.queries("dd_containment_smallside")(spark, fixDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == truth, s"recall/precision break: got $got")
    val rarest = graft.operators.Dedup
      .containmentCandidates(spark, fixDir, rarestFirst = true).count()
    val naive = graft.operators.Dedup
      .containmentCandidates(spark, fixDir, rarestFirst = false).count()
    assert(rarest <= 10, s"rarest-first candidate count blew up: $rarest")
    assert(naive >= 100 && naive >= 20 * rarest,
      s"expected naive prefix fan-out >> rarest-first: " +
        s"naive=$naive rarest=$rarest")
  }

  // Randomized recall property for the multi-hit prefix filter: a
  // 60-doc corpus drawn from a 25-token vocabulary (heavy shingle
  // collisions, many equal-size docs — the regime where the k-hit
  // HAVING bound and the equal-size single-direction probe could
  // plausibly drop a qualifying pair), checked against an exact
  // all-pairs containment walk in plain Scala. Fixed seed: the gate
  // must be reproducible, the point is corpus SHAPE, not fresh
  // randomness per run.
  test("smallside candidates keep 100% recall on a collision-heavy corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(1313)
    val vocab = (1 to 25).map(i => s"w$i")
    // sizes cluster at a few values so equal-size pairs are common;
    // a handful of docs are prefixes of others (true containment)
    val base = (1L to 50L).map { id =>
      val n = Seq(12, 12, 20, 20, 28)(rnd.nextInt(5))
      id -> (1 to n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val planted = (51L to 60L).map { id =>
      val host = base((id % 50).toInt)._2
      id -> host.split(" ").take(10 + rnd.nextInt(5)).mkString(" ")
    }
    val all = base ++ planted
    val fixDir =
      java.nio.file.Files.createTempDirectory("graft_rndcont").toString
    all.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$fixDir/documents.parquet")
    // exact all-pairs truth over distinct word bigrams (the operator's
    // gram width on the documents schema)
    def shingles(t: String): Set[String] =
      t.split(" ").sliding(2).map(_.mkString(" ")).toSet
    val sets = all.map { case (id, t) => id -> shingles(t) }.toMap
    val ids = all.map(_._1)
    val truth = (for {
      a <- ids; b <- ids if a < b
      c = (sets(a) & sets(b)).size.toDouble /
        math.min(sets(a).size, sets(b).size)
      if c >= 0.8
    } yield (a, b)).toSet
    assert(truth.nonEmpty, "fixture sanity: no containment pairs planted")
    val got = SparkEntry.queries("dd_containment_smallside")(spark, fixDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == truth,
      s"missed=${truth.diff(got)} invented=${got.diff(truth)}")
  }

  // dd_span semantics on a hand-built corpus: two 8-token blocks S1, S2
  // shared between docs 1 and 2. In doc 1 they are back-to-back, so the
  // two dup gram windows [1..8] and [9..16] TOUCH (start diff = 8) and
  // must merge into one maximal span; in doc 2 ten unique tokens sit
  // between them (start diff = 18), so the spans must stay separate.
  // Straddling windows (across a block boundary) occur in one doc only
  // and must not count; doc 3 shares nothing and must be absent.
  test("dd_span merges touching windows and splits gapped ones") {
    import spark.implicits._
    val s1 = (1 to 8).map(i => s"a$i").mkString(" ")
    val s2 = (1 to 8).map(i => s"b$i").mkString(" ")
    val mid = (1 to 10).map(i => s"m$i").mkString(" ")
    val fixDir =
      java.nio.file.Files.createTempDirectory("graft_span").toString
    Seq(
      (1L, s"$s1 $s2 c1 c2 c3 c4"),
      (2L, s"$s1 $mid $s2"),
      (3L, (1 to 10).map(i => s"d$i").mkString(" "))
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$fixDir/documents.parquet")
    val got = SparkEntry.queries("dd_span")(spark, fixDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == Seq((1L, 1L, 16L, 2L), (2L, 1L, 8L, 1L),
      (2L, 19L, 26L, 1L)), s"got $got")
  }

  // The case the oracle alone can't isolate: an increment whose new
  // docs MERGE two existing clusters. The fixture is built in the
  // j-regime the operator comment claims (asserted below from an
  // independent shingle computation): X and Y overlap at j ~ 0.43
  // (below threshold -> two prior clusters) while Z = X ++ Y covers
  // both at j ~ 0.69 (>= threshold to each). The contracted LP must
  // fold clusters {1,2} and {3,4} into one via bridge doc 20,
  // assign near-dup 22 into it, and keep the unrelated docs
  // singletons — and the whole assignment must be bit-identical to
  // batch dd_cluster on the same corpus (the operator's core claim).
  test("dd_cluster_incremental merges prior clusters through a new " +
       "bridge doc, bit-identical to batch re-clustering") {
    import spark.implicits._
    val s13 = (1 to 13).map(i => s"s$i")
    val x = s13 ++ (1 to 8).map(i => s"xa$i")
    val y = s13 ++ (1 to 8).map(i => s"yb$i")
    val z = x ++ y
    def shingles(toks: Seq[String]): Set[String] =
      toks.sliding(2).map(_.mkString(" ")).toSet
    def j(a: Seq[String], b: Seq[String]): Double = {
      val (sa, sb) = (shingles(a), shingles(b))
      (sa & sb).size.toDouble / (sa | sb).size
    }
    assert(j(x, y) < 0.6, s"fixture drift: j(X,Y)=${j(x, y)}")
    assert(j(z, x) >= 0.6 && j(z, y) >= 0.6,
      s"fixture drift: j(Z,X)=${j(z, x)} j(Z,Y)=${j(z, y)}")
    val unrelatedOld = (1 to 30).map(i => s"uo$i")
    val unrelatedNew = (1 to 30).map(i => s"un$i")
    val docs = Seq(
      (1L, x.mkString(" "), "src0"),
      (2L, x.mkString(" "), "src1"),
      (3L, y.mkString(" "), "src2"),
      (4L, y.mkString(" "), "src3"),
      (5L, unrelatedOld.mkString(" "), "src4"),
      (20L, z.mkString(" "), "src10"),
      (21L, unrelatedNew.mkString(" "), "src11"),
      (22L, y.mkString(" "), "src12"))
    val fixDir =
      java.nio.file.Files.createTempDirectory("graft_cinc").toString
    docs.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$fixDir/documents.parquet")
    val inc = SparkEntry.queries("dd_cluster_incremental")(spark, fixDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L,
      20L -> 1L, 21L -> 21L, 22L -> 1L), s"got $inc")
    val batch = SparkEntry.queries("dd_cluster")(spark, fixDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == batch, "incremental diverged from batch re-clustering")
  }

  test("dd_cluster_incremental equals dd_cluster on the sf0.001 corpus") {
    assert(clusters("dd_cluster_incremental") == clusters("dd_cluster"))
  }

  test("dd_embed_cluster_incremental equals dd_embed_cluster on the " +
       "sf0.001 corpus") {
    assert(clusters("dd_embed_cluster_incremental")
      == clusters("dd_embed_cluster"))
  }

  test("dd_embed_cluster refines dd_embed_cluster_exact") {
    val exact = clusters("dd_embed_cluster_exact")
    val banded = clusters("dd_embed_cluster")
    assert(exact.keySet == banded.keySet, "node sets differ")
    banded.groupBy(_._2).values.foreach { members =>
      val exactLabels = members.keys.map(exact).toSet
      assert(exactLabels.size == 1,
        s"banded cluster spans exact clusters $exactLabels " +
          s"(members ${members.keys.toList.sorted})")
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Multimodal, TextAnalysis}

/** Differential tests for the round-7 pipeline operators: each query's
  * result is recomputed with an INDEPENDENT driver-side reference
  * implementation over the same sf0.001 fixtures (the DuckDB oracle is
  * the cross-engine check; this is the cross-formulation one — e.g. the
  * banded phash pair join vs literal all-pairs).
  */
class PipelineOpsSpec extends AnyFunSuite {
  private val spark = SparkSessionHelper.spark
  private val dir = "/root/testdata/sf0.001"

  private def docs: Seq[(Long, String)] =
    spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Reference aHash: 64 probes at 1 + i*(n/64), bit i iff 64*p_i > Σp. */
  private def refPhash(text: String): Long = {
    val stride = text.length / 64
    val probes = (0 until 64).map(i => text.charAt(i * stride).toInt)
    val s = probes.sum
    probes.zipWithIndex.foldLeft(0L) { case (acc, (p, i)) =>
      if (64 * p > s) acc | (1L << i) else acc
    }
  }

  test("mm_phash matches a driver-side aHash re-implementation") {
    val got = Multimodal.queries("mm_phash")(spark, dir)
      .selectExpr("doc_id", "phash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exp = docs.map { case (id, t) => id -> refPhash(t) }.toMap
    assert(got == exp)
  }

  test("mm_phash_pairs banded join equals literal all-pairs at hamming <= 3") {
    val sigs = docs.map { case (id, t) => id -> refPhash(t) }
    val exp = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h)).toSet
    val got = Multimodal.queries("mm_phash_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == exp)
  }

  test("mm_phash_cluster matches a driver-side union-find over all pairs") {
    val sigs = docs.map { case (id, t) => id -> refPhash(t) }
    val parent = scala.collection.mutable.Map(sigs.map(s => s._1 -> s._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    for {
      (a, sa) <- sigs; (b, sb) <- sigs
      if a < b && java.lang.Long.bitCount(sa ^ sb) <= 3
    } {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val exp = sigs.map { case (id, _) => id -> find(id) }.toMap
    val got = Multimodal.queries("mm_phash_cluster")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exp)
  }

  /** Reference redaction: token-level term scrub, then the PII regexes
    * (same patterns the query uses — Java regex on both sides here; the
    * RE2 half of the equivalence is the DuckDB oracle's job).
    */
  private def refRedact(text: String): String = {
    val t1 = text.split(" ", -1)
      .map(t => if (t == "customer") "[TERM]" else t).mkString(" ")
    t1.replaceAll("[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}", "[EMAIL]")
      .replaceAll("[0-9]{1,3}([.][0-9]{1,3}){3}", "[IP]")
  }

  test("txt_redact digest matches driver-side reference on every doc") {
    val res = TextAnalysis.queries("txt_redact")(spark, dir)
      .selectExpr("doc_id", "redacted_hash", "n_terms").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val byId = docs.toMap
    assert(res.nonEmpty)
    res.foreach { case (id, hash, nTerms) =>
      val expText = refRedact(byId(id))
      assert(hash == md5hex(expText), s"doc $id")
      assert(nTerms ==
        byId(id).split(" ", -1).count(_ == "customer").toLong, s"doc $id")
    }
  }

  test("txt_redact scrubs adjacent denylist terms completely") {
    // the token-level formulation can't half-miss adjacent occurrences
    // the way a space-delimited regex replace does
    assert(refRedact("customer customer customer")
      == "[TERM] [TERM] [TERM]")
  }

  test("txt_bigram_score matches a driver-side bigram model") {
    val streams = docs.map { case (id, t) =>
      val toks = t.split(" ", -1).toSeq
      id -> toks.zip(toks.drop(1))
    }.filter(_._2.nonEmpty)
    val all = streams.flatMap(_._2)
    val c12 = all.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c1 = all.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val exp = streams.map { case (id, bgs) =>
      val ps = bgs.map(b => c12(b) * 1000000L / c1(b._1))
      id -> ((bgs.size.toLong, ps.sum))
    }.toMap
    val got = TextAnalysis.queries("txt_bigram_score")(spark, dir)
      .selectExpr("doc_id", "n_bigrams", "sum_p").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == exp)
  }

  /** Reference shingle set: distinct word-bigram 60-bit md5 prefixes. */
  private def refShingles(text: String): Set[Long] = {
    val toks = text.split(" ", -1)
    toks.zip(toks.drop(1)).map { case (a, b) =>
      val h = md5hex(a + " " + b).take(15)
      java.lang.Long.parseLong(h, 16)
    }.toSet
  }

  test("dd_containment banded join equals literal all-pairs at c >= 0.8") {
    val sets = docs.map { case (id, t) => id -> refShingles(t) }
    val exp = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      isect = (sa & sb).size
      c = BigDecimal(isect.toDouble / math.min(sa.size, sb.size))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble if c >= 0.8
    } yield (a, b, c)).toSet
    val got = graft.operators.Dedup.queries("dd_containment")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == exp)
  }

  test("dd_containment recall precondition holds at the gate's sf0.01") {
    // TRIPWIRE for fixture drift: the banded candidate generator only
    // guarantees recall for containment pairs that ALSO sit in the
    // Jaccard banding's regime (j >= 0.6). This corpus has zero
    // containment>=0.8 pairs below that regime; if regenerated fixtures
    // ever introduce a subset-style pair (tiny doc inside huge doc),
    // this test fails loudly BEFORE the driver's oracle gate does,
    // pointing at the documented contract in Dedup.ddContainment.
    val d01 = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val sets = d01.map { case (id, t) => id -> refShingles(t) }
    val escapes = for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      isect = (sa & sb).size
      c = isect.toDouble / math.min(sa.size, sb.size) if c >= 0.8
      j = isect.toDouble / (sa.size + sb.size - isect) if j < 0.6
    } yield (a, b, c, j)
    assert(escapes.isEmpty,
      s"containment pairs outside the banding regime: $escapes")
  }

  test("txt_tfidf matches a driver-side tf-idf model") {
    val n = docs.size.toLong
    val tf = docs.flatMap { case (id, t) =>
      t.split(" ", -1).groupBy(identity).map {
        case (tok, occ) => (id, tok, occ.length.toLong)
      }
    }
    val df = docs.flatMap { case (_, t) => t.split(" ", -1).distinct }
      .groupBy(identity).map { case (tok, v) => tok -> v.size.toLong }
    val exp = tf.groupBy(_._1).flatMap { case (id, rows) =>
      rows.map { case (_, tok, f) =>
        (id, tok, f, df(tok), f * ((n * 1000000L) / df(tok)))
      }.sortBy { case (_, tok, _, _, score) => (-score, tok) }
        .take(3).zipWithIndex
        .map { case ((i, tok, f, d, sc), r) => (i, r + 1L, tok, f, d, sc) }
    }.toSet
    val got = graft.operators.TextAnalysis.queries("txt_tfidf")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got == exp)
  }

  test("st_funnel matches a driver-side ordered-step walk") {
    val evs = Engine.table(spark, dir, "events")
      .selectExpr("user_id", "event_type", "ts div 1000 AS us").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val byUser = evs.groupBy(_._1)
    def firstAfter(u: Seq[(Long, String, Long)], typ: String,
                   after: Long): Option[Long] = {
      val c = u.filter(e => e._2 == typ && e._3 > after).map(_._3)
      if (c.isEmpty) None else Some(c.min)
    }
    var n1, n2, n3 = 0L
    byUser.values.foreach { u =>
      firstAfter(u, "view", Long.MinValue).foreach { t1 =>
        n1 += 1
        firstAfter(u, "click", t1).foreach { t2 =>
          n2 += 1
          firstAfter(u, "purchase", t2).foreach { _ => n3 += 1 }
        }
      }
    }
    val got = graft.operators.EventWindows.queries("st_funnel")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("step1_view" -> n1, "step2_click" -> n2,
      "step3_purchase" -> n3))
  }

  test("sim_pq matches a driver-side fixed-point product quantizer") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 10000.0 + 0.5)
          .toLong).toArray)
      .sortBy(_._1)
    def dist(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (p, q) => (p - q) * (p - q) }.sum
    def assignTo(cents: Seq[(Long, Array[Long])],
                 v: Array[Long]): (Long, Long) =
      cents.map { case (cell, c) => (dist(v, c), cell) }.min.swap
    val exp = scala.collection.mutable.Map[Long, (Array[Long], Long)]()
    for (m <- 0 until 4) {
      val sub = vecs.map { case (id, x) => id -> x.slice(16 * m, 16 * m + 16) }
      val c0 = sub.filter(_._1 < 4).map { case (id, v) => (id, v) }.toSeq
      val a1 = sub.map { case (id, v) => (id, assignTo(c0, v)._1, v) }
      val c1 = a1.groupBy(_._2).map { case (cell, rows) =>
        val n = rows.length
        cell -> (0 until 16).map { i =>
          val s = rows.map(_._3(i)).sum
          s / n // JVM integer division truncates like Spark's div
        }.toArray
      }.toSeq
      sub.foreach { case (id, v) =>
        val (cell, d) = assignTo(c1, v)
        val (codes, err) = exp.getOrElse(id, (Array.fill(4)(0L), 0L))
        codes(m) = cell
        exp(id) = (codes, err + d)
      }
    }
    val got = graft.operators.Similarity.queries("sim_pq")(spark, dir)
      .collect().map(r => (r.getLong(0),
        Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)),
        r.getLong(5)))
    assert(got.length == vecs.length)
    got.foreach { case (id, codes, qErr) =>
      val (eCodes, eErr) = exp(id)
      assert(codes == eCodes.toSeq && qErr == eErr, s"vec $id")
    }
  }

  test("st_retention matches a driver-side cohort walk") {
    val dayNs = 86400000000000L
    val ud = Engine.table(spark, dir, "events")
      .selectExpr("user_id", s"ts div $dayNs AS day").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cohort = ud.groupBy(_._1).map { case (u, ds) => u -> ds.map(_._2).min }
    val exp = ud.toSeq.map { case (u, d) => (cohort(u), d - cohort(u)) }
      .filter(_._2 <= 7)
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = graft.operators.EventWindows.queries("st_retention")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == exp)
    // day-0 retention is the cohort size by definition
    got.collect { case ((c, 0L), n) => (c, n) }.foreach { case (c, n) =>
      assert(n == cohort.values.count(_ == c).toLong, s"cohort $c")
    }
  }

  test("txt_bigram_score probabilities are bounded by 1 (micro units)") {
    val bad = TextAnalysis.queries("txt_bigram_score")(spark, dir)
      .where("sum_p > 1000000 * n_bigrams OR sum_p < 0").count()
    assert(bad == 0L)
  }
}

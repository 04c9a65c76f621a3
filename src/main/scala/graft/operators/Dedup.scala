package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine._
import graft.QueryPack
import graft.functions.VectorFunctions

/** Deduplication operators over the `documents` / `embeddings` tables:
  * exact (hash group-by), n-gram Jaccard (inverted-index join), MinHash +
  * LSH banding, SimHash, and embedding-cosine near-dup.
  *
  * Every variant is expressed so the exact same arithmetic runs in DuckDB
  * (the driver's oracle): token hashes come from `md5` hex prefixes (not
  * engine-native `hash()`, which differs between engines), min-hashing
  * uses fixed `(a*h + b) mod p` families with literal constants, and all
  * similarity ratios are single IEEE divisions rounded to 6 digits.
  *
  * Scale design (100 TB):
  *  - exact dedup is one hash-aggregate on a derived key — group on
  *    `md5(text)` so the shuffle carries a 32-byte key, not the document;
  *  - Jaccard generates candidates with a banded-MinHash equi-join and
  *    re-checks only candidates exactly (graft_isect merge) — shuffle is
  *    8 band keys per document, never a pair cross product, and the
  *    banded result is verified identical to the all-pairs spec on every
  *    test scale;
  *  - MinHash signatures are computed per-document in one narrow pass
  *    (HOF `aggregate` over the shingle array — no explode/shuffle), and
  *    only band keys (4 x 16 bytes/doc) are shuffled for candidate
  *    generation;
  *  - SimHash is likewise a narrow per-document fold; the 16-bit variant
  *    here keeps the oracle tractable, widen the mask set for 64-bit.
  */
object Dedup extends QueryPack {

  private val P = 2147483647L // 2^31 - 1
  private val K = 16          // minhash signature length
  private val Bands = 4       // LSH bands (4 rows each)
  private def A(j: Int): Long = (1103515245L * (j + 1)) % 65521L
  private def B(j: Int): Long = (12345L * (j + 17)) % 65521L

  /** Word-bigram shingles, identical construction in both dialects.
    * Guarded for single-token docs: Spark's `sequence(1, 0)` descends to
    * `[1, 0]` (and `element_at(toks, 0)` throws), while DuckDB's
    * `range(1, 1)` is empty — the CASE makes both yield `[]`.
    */
  // graft_bigrams is the fused codegen form of the original HOF head
  //   array_distinct(transform(sequence(1, size(toks) - 1),
  //     i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))))
  // (KernelDifferentialSpec pins exact equality, incl. first-occurrence
  // order); the CASE keeps the legacy null-toks parity — size(null) is
  // null, so a null token array still yields [] rather than null.
  private val sparkGrams =
    "CASE WHEN size(toks) >= 2 THEN graft_bigrams(toks)" +
      " ELSE cast(array() as array<string>) END"
  private val duckGrams =
    "list_distinct(list_transform(range(1, len(toks))," +
      " i -> toks[i] || ' ' || toks[i + 1]))"

  /** 32-bit shingle hash from the md5 hex prefix — the fused
    * [[graft.functions.Md5PrefixHash]] kernel (digest -> long, no hex
    * string round-trip); value-identical to the unfused DuckDB form.
    */
  private def sparkH(v: String) = s"graft_h32($v)"
  private def duckH(v: String) =
    s"CAST('0x' || substr(md5($v), 1, 8) AS BIGINT)"

  // -- dd_exact: exact duplicate groups --------------------------------------
  private def ddExact(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents")
      .groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_id"))
      .orderBy(col("h"))

  private val ddExactSql =
    """SELECT md5(text) AS h, COUNT(*) AS n_copies, MIN(doc_id) AS keep_id
      |FROM documents GROUP BY md5(text) ORDER BY h""".stripMargin

  // -- dd_jaccard: banded-MinHash candidates + exact Jaccard re-check ---------
  // The 100 TB shape: candidate pairs come from an LSH band EQUI-join over
  // the 16-perm MinHash signatures (8 bands x 2 rows — so the shuffle
  // carries 8 small keys per document, never a pair cross product), and
  // only candidates pay the exact re-check: a codegen'd two-pointer merge
  // (graft_isect) over the per-doc sorted 60-bit shingle-hash arrays.
  //
  // RECALL CONTRACT (probabilistic, stated explicitly): the exact
  // re-check removes every false candidate, so precision is 1.0; recall
  // against the all-pairs spec is bounded by the banding — a true pair
  // with Jaccard j collides in some band with prob 1-(1-j^2)^8, which is
  // 0.972 at EXACTLY the j = 0.6 threshold, 0.995 at j = 0.7, 0.9998 at
  // this corpus's weakest true pair (j = 0.818), ~1-1e-12 at its median
  // (j = 0.92). Near-dup corpora are bimodal (true pairs far above the
  // threshold, noise far below), so the boundary regime is empty in
  // practice; callers needing a harder floor raise K/bands (recall
  // 1-(1-j^2)^b), trading b shuffle keys per document.
  //
  // The DuckDB oracle is the INDEPENDENT all-pairs formulation, NOT the
  // banding — the driver's hash-compare therefore verifies the banded
  // result against the exact spec on real data every round (identical at
  // sf0.001/0.01/0.1, while scanning 61x fewer pairs at sf0.1: 203 k
  // candidates vs 12.5 M ordered pairs).
  private def sparkH64(v: String) = s"graft_h64($v)"
  private def duckH64(v: String) =
    s"CAST('0x' || substr(md5($v), 1, 15) AS BIGINT)"

  /** 2-row band key over the K=16 signature columns (8 bands). */
  private val JacBands = 8
  private def jacBandKeySpark(b: Int): String =
    s"md5(concat_ws(',', cast(sig_${2 * b} as string)," +
      s" cast(sig_${2 * b + 1} as string)))"

  /** Band-side skew guard for every JACCARD-VERIFIED banding site. A
    * doc whose shingle set is empty (text shorter than one word-bigram)
    * minhashes to Long.MaxValue in EVERY signature — minhash16's fold
    * identity with nothing to fold — so all such docs share one
    * identical (band, bk) key in all 8 bands. On a web-scale corpus
    * that single bucket generates |empty|²/2 candidate pairs per band:
    * a quadratic bucket bomb, every pair of which the exact verify
    * then rejects anyway (Jaccard against an empty hash set is
    * 0/len = 0 or 0/0 = NULL in both engines, never >= 0.6 — pinned
    * by ShortDocGuardSpec). Dropping empty-sig docs from the BAND
    * side before candidate generation is therefore semantics-free for
    * this family — they still flow through every node list and exact
    * path, surfacing as singletons — and turns the bomb into a linear
    * skip. NOT applied to the signature-similarity family
    * (dd_minhash_lsh est_sim, dd_simhash* hamming), where two empty
    * docs have identical signatures and legitimately pair.
    */
  private val jacBandGuard = s" WHERE sig_0 <> ${Long.MaxValue}L"

  /** Scale-adaptive partition count for a checkpointed group/rep-scale
    * frame that is scanned many times inside one edge job (the band
    * selects): ~256k rows per partition — prepLpEdges' sizing rule —
    * capped at the session's shuffle parallelism (the corpus-scale
    * setting a deployment tunes) and floored at 1. Replaces the
    * literal `coalesce(4)`s (r22): right at sf0.1 where the rep set is
    * a few thousand rows, wrong on a corpus whose signatures are
    * mostly unique (reps ≈ corpus → billions of rows through 4
    * partitions). `rows` is a cheap count over an already-checkpointed
    * frame.
    */
  private[graft] def repPartitions(s: SparkSession, rows: Long): Int =
    math.max(1L, math.min(
      s.conf.get("spark.sql.shuffle.partitions").toLong,
      rows / 262144L + 1L)).toInt

  /** Scoped AQE-off, the edge-checkpoint discipline (measured note at
    * [[ddClusterIncremental]]): one definition for every site so the
    * save/set/restore dance cannot drift or leak. Works only when the
    * body forces planning INSIDE the scope (a localCheckpoint or an
    * executedPlan access) — a lazily-returned DataFrame plans after
    * the finally has already restored the conf.
    */
  private[graft] def withAqeOff[T](s: SparkSession)(body: => T): T = {
    val k = "spark.sql.adaptive.enabled"
    val was = s.conf.getOption(k)
    s.conf.set(k, "false")
    try body finally was match {
      case Some(v) => s.conf.set(k, v)
      case None    => s.conf.unset(k)
    }
  }

  /** Per-call-unique temp view name for the shared-frame BUILDERS'
    * CHECKPOINT-BACKED intermediates. They run OUTSIDE the registry
    * lock (FrameRegistry's documented choice: two corpora may build
    * concurrently on one SparkSession), so a fixed view name is a
    * shared mutable binding a concurrent builder could rebind between
    * registration and SQL analysis — one corpus's verify silently
    * reading the other corpus's relation. Unique names make
    * interleaved builds safe by construction. Every uview MUST be
    * dropped via [[dropUviews]] once the last s.sql() that names it
    * has been ANALYZED (Dataset creation is eagerly analyzed, so view
    * resolution has already inlined the plan and the returned lazy
    * frames keep working): the catalog holds the analyzed plan —
    * for a checkpointed frame, its LogicalRDD — so an undropped
    * unique view pins the checkpoint's executor blocks FOREVER
    * (ddLpEdges rebuilds a corpus-sized frame per call; before r19
    * each rebuild leaked its blocks past every registry
    * invalidation, unbounded). Dropping is safe precisely because
    * these views are checkpoint-backed, never .cache()'d:
    * dropTempView only uncaches a MATCHING cache entry, and there is
    * none. Cached relations use [[cview]] instead.
    */
  private val viewSeq = new java.util.concurrent.atomic.AtomicLong
  private[graft] def uview(prefix: String): String =
    prefix + "_u" + viewSeq.incrementAndGet()

  /** Drop builder temp views whose consuming SQL is already analyzed
    * (see [[uview]]'s contract). dropTempView also uncaches a cache
    * entry matching the view's plan — call this only on
    * checkpoint-backed views.
    */
  private[graft] def dropUviews(s: SparkSession, names: String*): Unit =
    names.foreach(s.catalog.dropTempView(_))

  /** Deterministic per-(prefix, session-shared corpus) name for the
    * CACHED builder relations (the sig/embedding scans behind the
    * band sides). These views must OUTLIVE the builder — dropping
    * them would unpersist the shared cache entry the lazy verify
    * frames and sibling families still scan — so, unlike [[uview]],
    * the name must not grow per build: keying on the corpus dir keeps
    * one binding per (prefix, corpus) for the session's lifetime.
    * Concurrency: different corpora get different names (the race
    * [[uview]] closes); two concurrent builds of the SAME corpus
    * rebind the name to PLAN-EQUIVALENT relations, so an interleaved
    * analysis resolves to an equivalent plan — benign by
    * construction. The cached blocks themselves are released by
    * [[invalidateLpEdges]] (the registry's staleness hook) through
    * [[trackCached]].
    */
  private[graft] def cview(prefix: String, dir: String): String =
    prefix + "_c" + StoreFiles.md5Hex(dir, 12)

  /** Cached builder relations per (session, corpus), so the
    * registry's staleness hook can unpersist them: before r19 an
    * invalidation dropped the derived frames but left the cached
    * corpus scans — a corpus rewritten in place could keep serving
    * stale cached blocks to the rebuild (the cache manager matches
    * canonical plans, not file contents). LRU-BOUNDED like the frame
    * registries (same [[LpEdgeCacheMax]] cap, read at put time —
    * object-init order makes it 0 here): a long-lived multi-session
    * context otherwise pins every discarded session's corpus-scan
    * plans forever, since a dropped SESSION (live context) has no
    * liveness signal to sweep on. Evicted entries' blocks are
    * unpersisted; consumers recompute on demand.
    */
  private val cachedRels =
    new java.util.LinkedHashMap[(SparkSession, String), List[DataFrame]](
        16, 0.75f, /*accessOrder=*/ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), List[DataFrame]])
          : Boolean = {
        val evict = size() > LpEdgeCacheMax
        if (evict && !e.getKey._1.sparkContext.isStopped)
          e.getValue.foreach(_.unpersist(blocking = false))
        evict
      }
    }

  private[graft] def trackCached(s: SparkSession, dir: String,
                          df: DataFrame): Unit =
    cachedRels.synchronized {
      val k = (s, dir)
      val cur = Option(cachedRels.get(k)).getOrElse(Nil)
      // a re-run builder re-tracks a plan-EQUIVALENT frame whose
      // .cache() was a no-op: appending it again would grow the list
      // without bound under ddLpEdges' documented per-call rebuild.
      // One tracked frame per distinct plan suffices — unpersisting
      // any plan-equivalent frame drops the one shared cache entry.
      if (!cur.exists(_.queryExecution.analyzed
          .sameResult(df.queryExecution.analyzed)))
        cachedRels.put(k, df :: cur)
    }

  private def unpersistTracked(s: SparkSession, dir: String): Unit = {
    val dead = cachedRels.synchronized {
      val it = cachedRels.keySet().iterator()
      while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
      Option(cachedRels.remove((s, dir))).getOrElse(Nil)
    }
    dead.foreach(_.unpersist(blocking = false))
  }

  private def unpersistAllTracked(): Unit = {
    val all = cachedRels.synchronized {
      import scala.jdk.CollectionConverters._
      val vs = cachedRels.values().asScala.flatten.toList
      cachedRels.clear()
      vs
    }
    all.filterNot(_.sparkSession.sparkContext.isStopped)
      .foreach(_.unpersist(blocking = false))
  }

  /** Shared (doc_id, hs, sig_0..15) relation behind dd_jaccard and
    * dd_containment: registered under `view`, CACHED because it feeds
    * all 8 band sides and both exact-re-check join-backs (the md5
    * chains must materialize once). Returns the band-side UNION ALL
    * over `view` so both operators keep the identical 8x2 banding by
    * construction.
    */
  private def bandedSigRelation(s: SparkSession, dir: String,
                                view: String): String = {
    VectorFunctions.ensureRegistered(s)
    val sigs = table(s, dir, "documents")
      .selectExpr("doc_id", "split(text, ' ') AS toks")
      .selectExpr("doc_id", s"$sparkGrams AS grams")
      .selectExpr("doc_id",
        "graft_h32a(grams) AS ghs",
        "graft_h64sd(grams) AS hs")
      .selectExpr("doc_id", "hs", "graft_minhash16(ghs) AS sigarr")
      .selectExpr(Seq("doc_id", "hs") ++ sparkSigCols: _*)
      .cache()
    sigs.createOrReplaceTempView(view)
    trackCached(s, dir, sigs)
    (0 until JacBands)
      .map(b => s"SELECT doc_id, $b AS band, ${jacBandKeySpark(b)} AS bk" +
        s" FROM $view$jacBandGuard")
      .mkString(" UNION ALL ")
  }

  /** Test hook (ShortDocGuardSpec): the guarded band-side relation of
    * the jaccard family, as a frame — so the spec can assert the
    * [[jacBandGuard]] actually keeps empty-shingle docs out of the
    * probe index rather than trusting the SQL string.
    */
  private[graft] def jaccardBandRowsForTest(s: SparkSession,
                                            dir: String): DataFrame = {
    val bandSelects = bandedSigRelation(s, dir, cview("sdg_sigs", dir))
    s.sql(s"SELECT doc_id, band, bk FROM ($bandSelects)")
  }

  /** The jaccard family's REP-level verified pairs (rep_a, rep_b,
    * jaccard) plus the collapse membership registered as `jac_grp` —
    * the duplicate-bomb guard ([[ddClusterEdges]]' collapse) applied
    * to the pair table itself: identical shingle sets collapse to
    * their min-doc_id representative, only reps are banded, and the
    * verify runs ONCE per group pair. [[ddJaccardPairs]] expands the
    * result back to member pairs — on a bombed corpus the quadratic
    * part is the ANSWER (all k²/2 pairs really are duplicates), and
    * this split confines it to join fan-out: candidate generation and
    * the graft_isect merges stay O(groups²-candidates).
    */
  private[graft] def ddJaccardRepPairs(s: SparkSession,
                                       dir: String): DataFrame =
    jacRelations(s, dir).repVer

  /** The jaccard family's shared collapse relations, materialized once
    * per (session, corpus) through the registry ([[FrameRegistry]]'s
    * contract — the embed_lsh edge share's argument applied to the
    * pair families: five consumers, one banded corpus pass).
    */
  private def jacRelations(s: SparkSession, dir: String): PairRelations = {
    jacRelCache.getOrBuild(s, s"jac_pairs|$dir") {
      val (grp, ver) = jacRepVerifyFrame(s, dir)
      PairRelations(ver.truncated(), grp)
    }
  }

  /** The shingle-set collapse membership (doc_id, rep) over a
    * registered sig view: identical shingle sets group under their
    * min-doc_id representative, empty-shingle docs carved out (their
    * pairwise score is 0/0 in every family — never a pair, so never a
    * group). Eagerly checkpointed (the dc_grp discipline — the frame
    * is scanned several times inside one pair-materialization job).
    * Shared by the jaccard AND containment families: the collapse key
    * is the shingle set itself, which both score functions are
    * constant on.
    */
  private def shingleGrpFrame(s: SparkSession, view: String): DataFrame =
    s.sql(
      s"""SELECT k.doc_id, g.rep FROM
         |  (SELECT doc_id, md5(cast(hs as string)) AS hkey
         |   FROM $view WHERE sig_0 <> ${Long.MaxValue}L) k
         |JOIN
         |  (SELECT md5(cast(hs as string)) AS hkey, min(doc_id) AS rep
         |   FROM $view WHERE sig_0 <> ${Long.MaxValue}L
         |   GROUP BY 1) g
         |ON k.hkey = g.hkey""".stripMargin)
      .truncated()

  /** [[shingleGrpFrame]]'s EMBED-keyed twin (md5 of the vector bytes,
    * zero-norm carve-out — a zero vector's cosine is NaN, never an
    * edge): ONE definition for the four embed collapse sites
    * (cosRepVerifyFrame, embedClusterEdges, embedStoreBuild,
    * embedStoreFoldInto), which carried byte-identical inline copies
    * before r20.
    */
  private def embedGrpFrame(s: SparkSession, view: String): DataFrame =
    s.sql(
      s"""SELECT k.vec_id, g.rep FROM
         |  (SELECT vec_id, md5(cast(embedding as string)) AS vk
         |   FROM $view WHERE n2 > 0) k
         |JOIN
         |  (SELECT md5(cast(embedding as string)) AS vk,
         |          min(vec_id) AS rep
         |   FROM $view WHERE n2 > 0 GROUP BY 1) g
         |ON k.vk = g.vk""".stripMargin)
      .truncated()

  /** Member-level expansion of a rep-level verified pair table — the
    * shared consumer half of every pair-family collapse. Built with
    * DataFrame joins DIRECTLY on the registry's cached frames (no
    * temp views): the registry makes the frames thread-shareable
    * across sessions-on-one-SparkSession, and a view-based expansion
    * would re-introduce a shared mutable name binding two threads on
    * different corpora could interleave on (one corpus's rep pairs
    * silently expanding through the other's membership). Cross-group
    * rows carry the verified rep-pair score (a member's collapse key
    * equals its rep's, so the score is every member pair's score
    * exactly); within-group pairs score 1 by construction (identical
    * non-empty keys — the builders' carve-out keeps 0/0 twins out).
    * Output is row-for-row the uncollapsed banded pair table.
    */
  private[graft] def expandMemberPairs(rel: PairRelations, memberCol: String,
                                scoreCol: String,
                                outA: String, outB: String,
                                withinScore: Column = lit(1.0d)): DataFrame = {
    val ga = rel.grp.select(col("rep").as("rep_a"),
      col(memberCol).as("__ma"))
    val gb = rel.grp.select(col("rep").as("rep_b"),
      col(memberCol).as("__mb"))
    val cross = rel.repVer
      .join(ga, "rep_a").join(gb, "rep_b")
      .select(least(col("__ma"), col("__mb")).as(outA),
        greatest(col("__ma"), col("__mb")).as(outB), col(scoreCol))
    val within = rel.grp.select(col("rep"), col(memberCol).as("__ma"))
      .join(rel.grp.select(col("rep"), col(memberCol).as("__mb")), "rep")
      .where(col("__ma") < col("__mb"))
      .select(col("__ma").as(outA), col("__mb").as(outB),
        withinScore.as(scoreCol))
    cross.unionAll(within)
  }

  /** The collapse membership (eager) and the rep-level banded-verify
    * frame LAZY — split out so PlanSpec can pin the verify's physical
    * shape (banded equi-joins, the graft_isect arithmetic) without
    * running it; [[jacRelations]] is the only production caller and
    * owns checkpointing the verify into the registry.
    */
  private[graft] def jacRepVerifyFrame(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val sv = cview("jac_sigs", dir); val gv = uview("jac_grp")
    val rv = uview("jac_repsigs")
    bandedSigRelation(s, dir, sv)
    val grp = shingleGrpFrame(s, sv)
    grp.createOrReplaceTempView(gv)
    s.sql(
      s"""SELECT s.doc_id, ${(0 until 2 * JacBands)
           .map("s.sig_" + _).mkString(", ")}
         |FROM $sv s
         |JOIN (SELECT DISTINCT rep FROM $gv) r ON s.doc_id = r.rep"""
        .stripMargin)
      // grp.count() bounds the rep count from above (one row per
      // member ≥ one per group) — a one-job overestimate that keeps
      // the coalesce scale-adaptive instead of the old literal 4
      .coalesce(repPartitions(s, grp.count())).truncated()
      .createOrReplaceTempView(rv)
    val bandSelects = (0 until JacBands)
      .map(b => s"SELECT doc_id, $b AS band, ${jacBandKeySpark(b)} AS bk" +
        s" FROM $rv$jacBandGuard")
      .mkString(" UNION ALL ")
    // length-ratio conjunct: j >= 0.6 implies min(sz)/max(sz) >= 0.6
    // (exact integers, pure prune — same rows out). The caller
    // checkpoints this frame into the registry, so cache hits serve
    // materialized rows with no view dependencies.
    val ver = s.sql(
      s"""WITH bands AS ($bandSelects),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.bk = y.bk AND x.doc_id < y.doc_id)
         |SELECT doc_a AS rep_a, doc_b AS rep_b, jaccard FROM (
         |  SELECT doc_a, doc_b,
         |    round(cast(graft_isect(a.hs, b.hs) as double)
         |      / (size(a.hs) + size(b.hs) - graft_isect(a.hs, b.hs)), 6)
         |      AS jaccard
         |  FROM cand JOIN $sv a ON a.doc_id = doc_a
         |            JOIN $sv b ON b.doc_id = doc_b
         |  WHERE least(size(a.hs), size(b.hs)) * 10
         |        >= greatest(size(a.hs), size(b.hs)) * 6)
         |WHERE jaccard >= 0.6""".stripMargin)
    dropUviews(s, gv, rv)
    (grp, ver)
  }

  /** Unordered banded pairs — the composition form. Consumers that feed
    * the pairs onward (decontamination, overlap, the sweep) use this so
    * no range-partition sort (whose sampling pass re-executes the
    * pipeline) sits inside their edge lineage. Member-level: the
    * rep-level verified pairs expand through `jac_grp` on both sides
    * (a member's hs equals its rep's, so the verified jaccard is
    * every member pair's jaccard, exactly), and within-group pairs
    * are jaccard 1 by construction (identical non-empty shingle sets;
    * the carve-out keeps empty-set twins out, whose true jaccard is
    * 0/0, never a pair). Output is row-for-row the uncollapsed banded
    * pair table — DupBombGuardSpec leans on that equality. The
    * expansion is [[expandMemberPairs]] — DataFrame joins on the
    * cached frames, no temp views (see its thread-safety note).
    */
  private def ddJaccardPairs(s: SparkSession, dir: String): DataFrame =
    expandMemberPairs(jacRelations(s, dir), "doc_id", "jaccard",
      "doc_a", "doc_b")

  private def ddJaccard(s: SparkSession, dir: String): DataFrame =
    ddJaccardPairs(s, dir).orderBy(col("doc_a"), col("doc_b"))

  /** The all-pairs docs CTE + scored-pairs subquery shared by the
    * jaccard-family oracles (ddJaccardSql, ddSourceOverlapSql) — ONE
    * definition so a tuning change (threshold, hash width, grams)
    * cannot desynchronize the gates that all feed from
    * [[ddJaccardPairs]] on the Spark side.
    */
  private val duckJacDocsCte =
    s"""docs AS (
       |  SELECT doc_id,
       |    list_sort(list_distinct(list_transform(grams,
       |      g -> ${duckH64("g")}))) AS hs
       |  FROM (
       |    SELECT doc_id, $duckGrams AS grams FROM (
       |      SELECT doc_id, string_split(text, ' ') AS toks FROM documents)))"""
      .stripMargin

  private val duckJacScoredPairs =
    """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    round(CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)
      |      / (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))), 6)
      |      AS jaccard
      |  FROM docs a JOIN docs b ON a.doc_id < b.doc_id
      |  WHERE least(len(a.hs), len(b.hs)) * 10
      |        >= greatest(len(a.hs), len(b.hs)) * 6""".stripMargin

  /** The independent all-pairs spec (no banding): hash-comparing the
    * banded Spark result against it makes the driver's gate verify the
    * banding's recall on real data, not just replay a shared shortcut.
    */
  private val ddJaccardSql =
    s"""WITH $duckJacDocsCte
       |SELECT doc_a, doc_b, jaccard FROM (
       |  $duckJacScoredPairs)
       |WHERE jaccard >= 0.6
       |ORDER BY doc_a, doc_b""".stripMargin

  // -- dd_decontaminate: FUZZY eval-set decontamination -----------------------
  // The near-dup companion to txt_decontaminate's exact 8-gram gate
  // (the procedure pretraining reports pair with exact overlap: a
  // corpus document is contaminated when it is a near-duplicate of ANY
  // held-out eval document, not only when it shares a verbatim gram).
  // Eval set = the deterministic doc_id % 50 == 0 slice, the same
  // stand-in txt_decontaminate uses. Composed ENTIRELY from the banded
  // jaccard machinery — the pair table is [[ddJaccardPairs]] (one
  // banded self-join + exact verify, sig relation cached once), sliced
  // to corpus-eval pairs and folded to per-doc flags — so at 100 TB
  // the cost is the dedup pass the pipeline already runs, and the
  // (small) eval side rides the same band index rather than a second
  // scan. The oracle is the INDEPENDENT all-pairs spec restricted the
  // same way, so the hash-compare gates the banding's recall on the
  // contamination question itself.
  private def ddDecontaminate(s: SparkSession, dir: String): DataFrame = {
    // single pass over the pair table: a symmetric union of two
    // orientation projections embeds the banded-join + verify subtree
    // twice in the plan (exchange reuse reclaims only the shuffles) —
    // a crossing pair instead selects its corpus side directly
    val hits = ddJaccardPairs(s, dir)
      .where("(doc_a % 50 = 0) <> (doc_b % 50 = 0)")
      .selectExpr("CASE WHEN doc_a % 50 = 0 THEN doc_b ELSE doc_a END AS d")
      .groupBy(col("d"))
      .agg(count(lit(1)).as("n_eval_matches"))
    table(s, dir, "documents").where("doc_id % 50 <> 0")
      .select(col("doc_id"))
      .join(hits, col("doc_id") === col("d"), "left")
      .selectExpr("doc_id",
        "cast(coalesce(n_eval_matches, 0) as bigint) AS n_eval_matches",
        "coalesce(n_eval_matches, 0) > 0 AS contaminated")
      .orderBy(col("doc_id"))
  }

  private val ddDecontaminateSql =
    s"""WITH $duckJacDocsCte,
       |p AS (
       |  SELECT doc_a, doc_b FROM (
       |    $duckJacScoredPairs)
       |  WHERE jaccard >= 0.6),
       |h AS (
       |  SELECT d, CAST(COUNT(*) AS BIGINT) AS n_eval_matches FROM (
       |    SELECT doc_a AS d, doc_b AS e FROM p
       |    UNION ALL SELECT doc_b AS d, doc_a AS e FROM p)
       |  WHERE d % 50 <> 0 AND e % 50 = 0 GROUP BY d)
       |SELECT doc_id,
       |  CAST(COALESCE(n_eval_matches, 0) AS BIGINT) AS n_eval_matches,
       |  COALESCE(n_eval_matches, 0) > 0 AS contaminated
       |FROM documents LEFT JOIN h ON doc_id = h.d
       |WHERE doc_id % 50 <> 0
       |ORDER BY doc_id""".stripMargin

  // -- dd_decontaminate_semantic: embedding-space eval decontamination --------
  // The SEMANTIC companion to dd_decontaminate (lexical leakage escapes
  // paraphrase; embedding similarity does not): a corpus vector is
  // flagged when it cosine-matches (>= 0.4) any held-out eval vector
  // (vec_id % 50 == 0, the family's eval stand-in). Composed from the
  // banded RH-LSH pair table ([[ddEmbedLshPairs]], cached bucketed
  // relation shared with the cosine family), so at corpus scale the
  // flags cost one slice of the semantic-dedup pass. Per the repo's
  // banded-query convention the oracle is the BANDED restatement
  // (banding recall on this noise fixture is ~49% by design — see
  // dd_embed_cluster — so an all-pairs oracle would differ by
  // construction; recall itself is gated by the exact anchors).
  private def ddDecontaminateSemantic(s: SparkSession,
                                      dir: String): DataFrame = {
    // single pass over the pair table (see ddDecontaminate)
    val hits = ddEmbedLshPairs(s, dir)
      .where("(vec_a % 50 = 0) <> (vec_b % 50 = 0)")
      .selectExpr("CASE WHEN vec_a % 50 = 0 THEN vec_b ELSE vec_a END AS d")
      .groupBy(col("d"))
      .agg(count(lit(1)).as("n_eval_matches"))
    table(s, dir, "embeddings").where("vec_id % 50 <> 0")
      .select(col("vec_id"))
      .join(hits, col("vec_id") === col("d"), "left")
      .selectExpr("vec_id",
        "cast(coalesce(n_eval_matches, 0) as bigint) AS n_eval_matches",
        "coalesce(n_eval_matches, 0) > 0 AS contaminated")
      .orderBy(col("vec_id"))
  }

  // lazy: the embed-oracle building blocks (plane dots, band selects)
  // are declared further down the object; a strict val here would read
  // them mid-initialization and silently render empty SQL
  private lazy val ddDecontaminateSemanticSql =
    s"""WITH ${duckEmbedECte()},
       |bands AS ($duckEmbedBandSelects),
       |cand AS (
       |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bkt = y.bkt AND x.vec_id < y.vec_id),
       |p AS (
       |  SELECT vec_a, vec_b FROM (
       |    SELECT vec_a, vec_b, ${duckEmbedCos("a", "b")} AS cos_sim
       |    FROM cand JOIN e a ON a.vec_id = vec_a
       |              JOIN e b ON b.vec_id = vec_b)
       |  WHERE cos_sim >= 0.4),
       |h AS (
       |  SELECT d, CAST(COUNT(*) AS BIGINT) AS n_eval_matches FROM (
       |    SELECT vec_a AS d, vec_b AS e FROM p
       |    UNION ALL SELECT vec_b AS d, vec_a AS e FROM p)
       |  WHERE d % 50 <> 0 AND e % 50 = 0 GROUP BY d)
       |SELECT vec_id,
       |  CAST(COALESCE(n_eval_matches, 0) AS BIGINT) AS n_eval_matches,
       |  COALESCE(n_eval_matches, 0) > 0 AS contaminated
       |FROM embeddings LEFT JOIN h ON vec_id = h.d
       |WHERE vec_id % 50 <> 0
       |ORDER BY vec_id""".stripMargin

  // -- dd_source_overlap: cross-source duplicate leakage matrix ---------------
  // The curation report behind dedup prioritization: how much near-dup
  // content each PAIR of sources shares (CCNet/mC4-style cross-dump
  // overlap — a dump that mostly duplicates another gets deduped
  // against it first, or dropped). Composes the banded Jaccard pairs
  // with the tiny (doc_id, source) projection and counts pairs per
  // unordered source pair.
  //
  // Scale shape: the two source lookups are doc_id equi-joins of the
  // pair list (|pairs| << |docs|, narrow columns only) against a
  // two-column projection of the corpus scan; the final aggregate is
  // |sources|^2-bounded. No new shuffle class beyond dd_jaccard itself.
  private def ddSourceOverlap(s: SparkSession, dir: String): DataFrame = {
    val pairs = ddJaccardPairs(s, dir)
    val src = table(s, dir, "documents").select("doc_id", "source")
    pairs
      .join(src.toDF("doc_a", "src_a"), "doc_a")
      .join(src.toDF("doc_b", "src_b"), "doc_b")
      .selectExpr("least(src_a, src_b) AS source_a",
        "greatest(src_a, src_b) AS source_b")
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("source_a", "source_b")
  }

  // Independent all-pairs restatement (no banding), same unordered
  // source-pair canonicalization — recall of the banded pair source
  // feeds straight into this gate too.
  private val ddSourceOverlapSql =
    s"""WITH $duckJacDocsCte,
       |pairs AS (
       |  SELECT doc_a, doc_b FROM (
       |    $duckJacScoredPairs)
       |  WHERE jaccard >= 0.6)
       |SELECT least(sa.source, sb.source) AS source_a,
       |  greatest(sa.source, sb.source) AS source_b,
       |  CAST(COUNT(*) AS BIGINT) AS n_pairs
       |FROM pairs
       |JOIN documents sa ON sa.doc_id = doc_a
       |JOIN documents sb ON sb.doc_id = doc_b
       |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin

  // -- dd_containment: asymmetric substring-style dedup -----------------------
  // Jaccard misses the quote/superset case: a doc wholly contained in a
  // bigger one has high containment c(A,B) = |A∩B|/min(|A|,|B|) but can
  // have low Jaccard. This operator reports pairs with max-direction
  // containment >= 0.8 — the shingle-level form of the "exact substring
  // dedup" family (Lee et al.'s dedup of quoted/boilerplate spans).
  //
  // Candidates come from the SAME 8x2 MinHash banding as dd_jaccard
  // (one band-key shuffle, no cross product), WITHOUT the length-ratio
  // prune (containment explicitly allows size mismatch). RECALL
  // CONTRACT: MinHash banding collides with probability driven by
  // JACCARD, so a subset pair with low Jaccard (tiny doc inside huge
  // doc) can be missed; measured on this corpus every containment>=0.8
  // pair also has j >= 0.6 (0 low-jaccard escapes at sf0.01 and sf0.1,
  // verified against the all-pairs oracle below each round). Corpora
  // with extreme size skew need the small-side candidate scheme —
  // implemented below as dd_containment_smallside (deterministic
  // prefix filtering, guaranteed recall; DedupRecallSpec drives it
  // over an adversarial tiny-doc-in-huge-doc fixture this banding
  // would miss).
  //
  // DUPLICATE-BOMB GUARD (r18): identical docs have containment 1.0,
  // so a k-copy bomb detonates this family exactly like jaccard's —
  // k²/2 banded candidates, all paying the graft_isect merge. The
  // same rep-collapse applies because containment, like jaccard, is a
  // function of the two shingle SETS only: identical sets collapse to
  // their min-doc_id rep ([[shingleGrpFrame]] — same key, same
  // empty-set carve-out, whose containment is 0/0 and never a pair),
  // only reps band, the verify runs once per group pair, and
  // [[expandMemberPairs]] recovers member pairs (a member's set
  // equals its rep's, so the verified containment is every member
  // pair's containment exactly; within-group pairs are 1.0 by
  // construction). Output is row-for-row the uncollapsed pair table —
  // banded-candidate recall depends only on the group's signature, so
  // collapsing cannot drop a pair the uncollapsed join would find.

  /** The containment family's REP-level verified pairs — exposed for
    * DupBombGuardSpec's O(groups) linearity gate.
    */
  private[graft] def ddContainmentRepPairs(s: SparkSession,
                                           dir: String): DataFrame =
    contRelations(s, dir).repVer

  private def contRelations(s: SparkSession, dir: String): PairRelations =
    contRelCache.getOrBuild(s, s"cont_pairs|$dir") {
      val (grp, ver) = contRepVerifyFrame(s, dir)
      PairRelations(ver.truncated(), grp)
    }

  /** Membership (eager) + the rep-level banded containment verify
    * LAZY — the [[jacRepVerifyFrame]] split (PlanSpec pins the
    * verify's physical shape without running it). Same 8x2 banding as
    * the jaccard family, WITHOUT the length-ratio prune (containment
    * explicitly allows size mismatch).
    */
  private[graft] def contRepVerifyFrame(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val sv = cview("cont_sigs", dir); val gv = uview("cont_grp")
    val rv = uview("cont_repsigs")
    bandedSigRelation(s, dir, sv)
    val grp = shingleGrpFrame(s, sv)
    grp.createOrReplaceTempView(gv)
    s.sql(
      s"""SELECT s.doc_id, ${(0 until 2 * JacBands)
           .map("s.sig_" + _).mkString(", ")}
         |FROM $sv s
         |JOIN (SELECT DISTINCT rep FROM $gv) r ON s.doc_id = r.rep"""
        .stripMargin)
      // count-derived width, not the old literal 4 — see repPartitions
      .coalesce(repPartitions(s, grp.count())).truncated()
      .createOrReplaceTempView(rv)
    val bandSelects = (0 until JacBands)
      .map(b => s"SELECT doc_id, $b AS band, ${jacBandKeySpark(b)} AS bk" +
        s" FROM $rv$jacBandGuard")
      .mkString(" UNION ALL ")
    val ver = s.sql(
      s"""WITH bands AS ($bandSelects),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.bk = y.bk AND x.doc_id < y.doc_id)
         |SELECT doc_a AS rep_a, doc_b AS rep_b, containment FROM (
         |  SELECT doc_a, doc_b,
         |    round(cast(graft_isect(a.hs, b.hs) as double)
         |      / least(size(a.hs), size(b.hs)), 6) AS containment
         |  FROM cand JOIN $sv a ON a.doc_id = doc_a
         |            JOIN $sv b ON b.doc_id = doc_b)
         |WHERE containment >= 0.8""".stripMargin)
    dropUviews(s, gv, rv)
    (grp, ver)
  }

  private def ddContainment(s: SparkSession, dir: String): DataFrame =
    expandMemberPairs(contRelations(s, dir), "doc_id", "containment",
      "doc_a", "doc_b")
      .orderBy(col("doc_a"), col("doc_b"))

  /** Independent all-pairs spec — catches any subset pair the
    * Jaccard-tuned banding would drop (see recall contract above).
    */
  private val ddContainmentSql =
    s"""WITH $duckJacDocsCte
       |SELECT doc_a, doc_b, containment FROM (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    round(CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)
       |      / least(len(a.hs), len(b.hs)), 6) AS containment
       |  FROM docs a JOIN docs b ON a.doc_id < b.doc_id)
       |WHERE containment >= 0.8
       |ORDER BY doc_a, doc_b""".stripMargin

  // -- dd_containment_smallside: skew-proof containment candidates ------------
  // The candidate scheme the dd_containment recall contract calls for on
  // size-skewed corpora: small-side PREFIX FILTERING (the SSJoin/PPJoin
  // family, Chaudhuri et al. ICDE'06 / Xiao et al. WWW'08) instead of
  // Jaccard-tuned MinHash banding. Each doc PROBES with floor(|d|/5)+1
  // of its shingle hashes and is INDEXED by its full hash set; a
  // qualifying pair (A,B), |A| <= |B|, has at most floor(0.2*|A|) of
  // A's shingles outside B, so by pigeonhole at least one probe hash
  // hits B's index — recall is GUARANTEED for ANY choice of probe
  // subset, which is why this query's all-pairs oracle gates candidate
  // recall exactly.
  //
  // The probe subset is the RAREST-FIRST prefix (order by corpus
  // document frequency, hash as tiebreak — deterministic in both
  // engines): probing with a doc's rarest shingles keeps hot
  // boilerplate shingles off the probe side, bounding join fan-out per
  // probe key by the df of RARE hashes. On real web text with heavy
  // boilerplate the hot keys carry most of the fan-out and
  // rarest-first is the standard fix (Xiao et al.'s df-ascending
  // canonical order); the ordering costs one df aggregation + one
  // per-doc window, both linear.
  //
  // MULTI-HIT PRUNING: probing with ⌊0.2|A|⌋+1 hashes guarantees ≥1
  // index hit for a qualifying pair; the standard generalization
  // (Xiao et al.'s l-prefix) probes ⌊0.2|A|⌋+k and requires ≥k hits —
  // a qualifying pair has at most ⌊0.2|A|⌋ probe misses total, so by
  // pigeonhole ≥k of the k+⌊0.2|A|⌋ probes hit, for ANY k ≥ 1 and any
  // probe subset. Each +1 of slack costs one more probe row per doc
  // but multiplies away chance collisions: on this corpus (931
  // distinct shingle hashes — heavily collided by construction, so a
  // random pair already shares ~3 hashes) k=3 cuts the re-check input
  // from 5.11M candidate pairs to 0.63M for 256 true matches, which
  // halved the query's measured CPU at sf0.1. The per-pair HAVING
  // bound uses the probing (smaller) doc's ACTUAL prefix length
  // (least(sz, sz div 5 + k)), so short docs — whose whole hash set
  // is the prefix — keep the exact pigeonhole requirement. Equal-size
  // pairs probe in ONE direction only (the lower doc_id probes), so
  // the per-pair count stays a single-direction hit count and the
  // >= k requirement is never diluted by summing both directions.
  //
  // Scale shape: one df aggregation + one per-doc window to rank probe
  // hashes, then an inverted-index equi-join feeding one pair-keyed
  // count — all linear in corpus shingles, never a cross product; AQE
  // skew-join covers what residual index-side heat remains. The exact
  // per-pair re-check (graft_isect >= 0.8 * min size) is unchanged
  // from dd_containment and now runs over a pruned candidate set.
  private val ContPrefixSlack = 3

  /** The smallside candidate CTE chain. `probeOrder` picks the probe
    * prefix: `"df.df, i.h"` is the production rarest-first order;
    * `"i.h"` is the naive smallest-hash prefix DedupRecallSpec measures
    * it against (recall is guaranteed for EITHER — the pigeonhole
    * argument holds for any probe subset — the order only controls
    * candidate fan-out on boilerplate-skewed corpora). `slack` is the
    * extra prefix length k: probe ⌊sz/5⌋+k hashes, require ≥k hits
    * (capped to the doc's own size for short docs).
    *
    * `probeParts` pins the probe side of the cand join to an explicit
    * REPARTITION(n, h): the probe relation's MAP output is tiny (a
    * prefix of each doc's hashes) so AQE's coalescer folds the join
    * down to ~2 partitions, but the join's OUTPUT explodes (the
    * inverted-index fan-out — 0.63 M pairs / 55 MB / ~6 CPU-s at
    * sf0.1), and coalescing by INPUT size serializes exactly the
    * stage all the CPU lives in (r16 ProfileOne: 2 tasks, 5.7 CPU-s,
    * the query's wall cap). A user-numbered repartition is exempt
    * from AQE coalescing, and the join must read both sides at the
    * same partitioning, so the explosive stage keeps full
    * parallelism; AQE skew handling stays on for everything else. At
    * real scale the inputs are no longer tiny and the hint is simply
    * the partitioning the join would pick anyway.
    */
  private def contSmallsideCandSql(view: String, probeOrder: String,
                                   slack: Int = ContPrefixSlack,
                                   probeParts: Int = 0): String = {
    val probeHint =
      if (probeParts > 0) s"/*+ REPARTITION($probeParts, h) */ " else ""
    s"""idx AS (
       |  SELECT doc_id, size(hs) AS sz, h
       |  FROM $view LATERAL VIEW explode(hs) t AS h),
       |df AS (SELECT h, count(*) AS df FROM idx GROUP BY h),
       |probe AS (
       |  SELECT $probeHint doc_id, sz, h FROM (
       |    SELECT i.doc_id, i.sz, i.h,
       |      row_number() OVER (PARTITION BY i.doc_id
       |        ORDER BY $probeOrder) AS rn
       |    FROM idx i JOIN df ON i.h = df.h)
       |  WHERE rn <= (sz div 5) + $slack),
       |cand AS (
       |  SELECT least(p.doc_id, i.doc_id) AS doc_a,
       |         greatest(p.doc_id, i.doc_id) AS doc_b
       |  FROM probe p JOIN idx i
       |    ON p.h = i.h
       |   AND (p.sz < i.sz OR (p.sz = i.sz AND p.doc_id < i.doc_id))
       |  GROUP BY least(p.doc_id, i.doc_id), greatest(p.doc_id, i.doc_id)
       |  HAVING count(*) >=
       |    least(min(p.sz), min(p.sz) div 5 + $slack) - min(p.sz) div 5)"""
      .stripMargin
  }

  /** Candidate pairs alone, with either probe order — exposed so
    * DedupRecallSpec can gate the rarest-first fan-out advantage (and
    * 100% recall) on a boilerplate-skewed fixture.
    */
  private[graft] def containmentCandidates(s: SparkSession, dir: String,
                                           rarestFirst: Boolean): DataFrame = {
    bandedSigRelation(s, dir, "contp_sigs")
    val ord = if (rarestFirst) "df.df, i.h" else "i.h"
    s.sql(s"""WITH ${contSmallsideCandSql("contp_sigs", ord)}
             |SELECT doc_a, doc_b FROM cand""".stripMargin)
  }

  // DUPLICATE-BOMB GUARD (r18): same rep-collapse as [[ddContainment]],
  // applied BEFORE prefix selection — both the probe AND the inverted
  // index hold representatives only, so a k-copy bomb contributes ONE
  // probe prefix and ONE index row set instead of k of each (the
  // uncollapsed index paid k² candidate rows AND k-fold hotter df on
  // every bomb shingle, polluting the rarest-first ranking). The
  // recall pigeonhole is per-PAIR and each rep is a real document, so
  // it holds unchanged on the rep corpus; df computed over reps is
  // the better rarity signal (duplicates no longer masquerade as
  // boilerplate). Member pairs recover through [[expandMemberPairs]]
  // with the same exactness argument.

  /** Smallside rep-level verified pairs — DupBombGuardSpec's hook. */
  private[graft] def ddContainmentSmallsideRepPairs(s: SparkSession,
                                                    dir: String): DataFrame =
    contpRelations(s, dir).repVer

  private def contpRelations(s: SparkSession, dir: String): PairRelations =
    contRelCache.getOrBuild(s, s"contp_pairs|$dir") {
      val (grp, ver) = contpRepVerifyFrame(s, dir)
      PairRelations(ver.truncated(), grp)
    }

  /** Membership (eager) + the rep-level prefix-probe verify LAZY —
    * [[contSmallsideCandSql]] over the rep view, REPARTITION hint
    * kept on the probe side (the AQE-coalescer exemption PlanSpec
    * pins survives the collapse unchanged).
    */
  private[graft] def contpRepVerifyFrame(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val sv = cview("contp_sigs", dir); val gv = uview("contp_grp")
    val rv = uview("contp_repsigs")
    bandedSigRelation(s, dir, sv)
    val grp = shingleGrpFrame(s, sv)
    grp.createOrReplaceTempView(gv)
    s.sql(
      s"""SELECT s.doc_id, s.hs FROM $sv s
         |JOIN (SELECT DISTINCT rep FROM $gv) r ON s.doc_id = r.rep"""
        .stripMargin)
      // count-derived width, not the old literal 4 — see repPartitions
      .coalesce(repPartitions(s, grp.count())).truncated()
      .createOrReplaceTempView(rv)
    val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
    val ver = s.sql(
      s"""WITH ${contSmallsideCandSql(rv, "df.df, i.h",
                                      probeParts = parts)}
         |SELECT doc_a AS rep_a, doc_b AS rep_b, containment FROM (
         |  SELECT doc_a, doc_b,
         |    round(cast(graft_isect(a.hs, b.hs) as double)
         |      / least(size(a.hs), size(b.hs)), 6) AS containment
         |  FROM cand JOIN $rv a ON a.doc_id = doc_a
         |            JOIN $rv b ON b.doc_id = doc_b)
         |WHERE containment >= 0.8""".stripMargin)
    dropUviews(s, gv, rv)
    (grp, ver)
  }

  private def ddContainmentSmallside(s: SparkSession, dir: String): DataFrame =
    expandMemberPairs(contpRelations(s, dir), "doc_id", "containment",
      "doc_a", "doc_b")
      .orderBy(col("doc_a"), col("doc_b"))

  // -- dd_threshold_sweep: tune the dedup threshold from ONE candidate pass ---
  // Choosing the Jaccard cutoff is a sweep, not a constant: pipelines
  // re-run dedup at several thresholds and compare removal volume. This
  // answers the whole sweep in one pass over the banded candidates:
  // bucket every pair by floor(j*10) and report, per bucket >= 0.6, the
  // pair count AND the cumulative pairs-removed-at-threshold
  // (cum_at_or_above — the number a run at t = bucket/10 would drop).
  // The cumulative window runs over the <= 5-row bucket table, not the
  // pairs. Contract: buckets below 0.6 are out of scope — that is the
  // banding's recall floor (dd_jaccard's contract); sweeping lower
  // requires re-banding, not re-scanning. Oracle: the independent
  // all-pairs formulation, same buckets.
  private def ddThresholdSweep(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("bucket10").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ddJaccardPairs(s, dir)
      .selectExpr("cast(floor(jaccard * 10) as bigint) AS bucket10")
      .groupBy("bucket10").agg(count(lit(1)).as("n_pairs"))
      // <= 5 aggregate rows: the unpartitioned window is bounded-small
      .withColumn("cum_at_or_above", sum("n_pairs").over(w))
      .orderBy(col("bucket10"))
  }

  private val ddThresholdSweepSql =
    s"""WITH $duckJacDocsCte,
       |pairs AS (
       |  SELECT CAST(floor(jaccard * 10) AS BIGINT) AS bucket10 FROM (
       |    SELECT round(CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)
       |        / (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))),
       |        6) AS jaccard
       |    FROM docs a JOIN docs b ON a.doc_id < b.doc_id)
       |  WHERE jaccard >= 0.6)
       |SELECT bucket10, n_pairs,
       |  CAST(SUM(n_pairs) OVER (ORDER BY bucket10 DESC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS cum_at_or_above
       |FROM (SELECT bucket10, CAST(COUNT(*) AS BIGINT) AS n_pairs
       |      FROM pairs GROUP BY bucket10)
       |ORDER BY bucket10""".stripMargin

  // -- dd_incremental: dedup a NEW batch against an EXISTING corpus -----------
  // The ingestion-time form of dedup: a production corpus is not rebuilt
  // from scratch — each crawl/batch lands against what is already
  // curated, and only the batch side may be dropped. Sources with id
  // >= 10 play the incoming batch here; < 10 the standing corpus. A new
  // document is tagged 'exact_dup' (md5(text) matches an existing doc),
  // else 'near_dup' (Jaccard >= 0.6 against some existing doc), else
  // 'kept'.
  //
  // Scale shape: the exact gate is an equi-join on 32-byte text
  // digests; near-dup candidates come from the same 8x2 MinHash banding
  // as dd_jaccard but only ACROSS the batch boundary (new x existing —
  // the batch side is typically a small fraction of the corpus, so the
  // band join's probe side is small), and only candidates pay the exact
  // graft_isect re-check. Neither text nor shingle arrays shuffle for
  // candidate generation — band keys only. The DuckDB oracle is the
  // INDEPENDENT all-pairs formulation (no banding), so this row also
  // gates banding recall at the 0.6 threshold, like dd_jaccard's.
  private def ddIncremental(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.ensureRegistered(s)
    val incSigs = table(s, dir, "documents")
      .selectExpr("doc_id", "md5(text) AS th",
        "cast(substring(source, 4) as int) >= 10 AS is_new",
        "split(text, ' ') AS toks")
      .selectExpr("doc_id", "th", "is_new", s"$sparkGrams AS grams")
      .selectExpr("doc_id", "th", "is_new",
        "graft_h64sd(grams) AS hs",
        "graft_h32a(grams) AS ghs")
      .selectExpr(Seq("doc_id", "th", "is_new", "hs",
        "graft_minhash16(ghs) AS sigarr"): _*)
      .selectExpr(Seq("doc_id", "th", "is_new", "hs") ++ sparkSigCols: _*)
      .cache()
    trackCached(s, dir, incSigs)
    incSigs.createOrReplaceTempView("inc_sigs")
    val bandSelects = (0 until JacBands)
      .map(b => s"SELECT doc_id, is_new, $b AS band," +
        s" ${jacBandKeySpark(b)} AS bk FROM inc_sigs$jacBandGuard")
      .mkString(" UNION ALL ")
    s.sql(
      s"""WITH bands AS ($bandSelects),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS new_id, y.doc_id AS old_id
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.bk = y.bk
         |   AND x.is_new AND NOT y.is_new),
         |near AS (
         |  SELECT DISTINCT new_id FROM (
         |    SELECT new_id,
         |      round(cast(graft_isect(a.hs, b.hs) as double)
         |        / (size(a.hs) + size(b.hs) - graft_isect(a.hs, b.hs)), 6)
         |        AS j
         |    FROM cand JOIN inc_sigs a ON a.doc_id = new_id
         |              JOIN inc_sigs b ON b.doc_id = old_id)
         |  WHERE j >= 0.6),
         |ex AS (
         |  SELECT DISTINCT n.doc_id FROM inc_sigs n
         |  JOIN inc_sigs o ON n.th = o.th AND n.is_new AND NOT o.is_new)
         |SELECT doc_id,
         |  CASE WHEN doc_id IN (SELECT doc_id FROM ex) THEN 'exact_dup'
         |       WHEN doc_id IN (SELECT new_id FROM near) THEN 'near_dup'
         |       ELSE 'kept' END AS status
         |FROM inc_sigs WHERE is_new ORDER BY doc_id""".stripMargin)
  }

  // -- dd_incremental_bloom: the broadcast-Bloom exact gate -------------------
  // Same contract and SAME ORACLE as dd_incremental; only the exact
  // gate's join strategy changes to the 100 TB-friendly two-tier form:
  // the standing corpus's digest keys fold into ONE 16 KiB Bloom filter
  // (graft_bloom_agg — map-side partial merge, one row out), the
  // incoming batch probes it with the codegen'd graft_bloom_contains,
  // and only the PROBABLE duplicates (true dups + the filter's ~0.1%
  // false positives) reach the exact digest equi-join. A mostly-novel
  // batch therefore never shuffles against the corpus at all on the
  // exact path — the surviving probe set is broadcast-sized — while
  // false positives are removed by the exact join (Bloom has no false
  // negatives, so the result is bit-identical to dd_incremental's).
  // The probe key is the digest's leading 60 bits as a bigint; a key
  // collision only adds a false positive, which the th equality then
  // discards.
  private def ddIncrementalBloom(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.ensureRegistered(s) // graft_bloom_contains et al.
    org.apache.spark.sql.GraftRegistry.registerOnce(s, "graft_bloom_agg") {
      s.udf.register("graft_bloom_agg", udaf(graft.functions.BloomAgg))
      ()
    }
    val incbSigs = table(s, dir, "documents")
      .selectExpr("doc_id", "md5(text) AS th",
        "cast(substring(source, 4) as int) >= 10 AS is_new",
        "split(text, ' ') AS toks")
      .selectExpr("doc_id", "th", "is_new", s"$sparkGrams AS grams")
      .selectExpr("doc_id", "th", "is_new",
        "cast(conv(substring(th, 1, 15), 16, 10) as bigint) AS bk64",
        "graft_h64sd(grams) AS hs",
        "graft_h32a(grams) AS ghs")
      .selectExpr(Seq("doc_id", "th", "is_new", "bk64", "hs",
        "graft_minhash16(ghs) AS sigarr"): _*)
      .selectExpr(Seq("doc_id", "th", "is_new", "bk64", "hs") ++
        sparkSigCols: _*)
      .cache()
    trackCached(s, dir, incbSigs)
    incbSigs.createOrReplaceTempView("incb_sigs")
    val bandSelects = (0 until JacBands)
      .map(b => s"SELECT doc_id, is_new, $b AS band," +
        s" ${jacBandKeySpark(b)} AS bk FROM incb_sigs$jacBandGuard")
      .mkString(" UNION ALL ")
    s.sql(
      s"""WITH bands AS ($bandSelects),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS new_id, y.doc_id AS old_id
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.bk = y.bk
         |   AND x.is_new AND NOT y.is_new),
         |near AS (
         |  SELECT DISTINCT new_id FROM (
         |    SELECT new_id,
         |      round(cast(graft_isect(a.hs, b.hs) as double)
         |        / (size(a.hs) + size(b.hs) - graft_isect(a.hs, b.hs)), 6)
         |        AS j
         |    FROM cand JOIN incb_sigs a ON a.doc_id = new_id
         |              JOIN incb_sigs b ON b.doc_id = old_id)
         |  WHERE j >= 0.6),
         |bloom AS (
         |  SELECT graft_bloom_agg(bk64) AS bits FROM incb_sigs
         |  WHERE NOT is_new),
         |probable AS (
         |  SELECT n.doc_id, n.th FROM incb_sigs n
         |  WHERE n.is_new
         |    AND graft_bloom_contains((SELECT bits FROM bloom), n.bk64)),
         |ex AS (
         |  SELECT DISTINCT p.doc_id FROM probable p
         |  JOIN incb_sigs o ON o.th = p.th AND NOT o.is_new)
         |SELECT doc_id,
         |  CASE WHEN doc_id IN (SELECT doc_id FROM ex) THEN 'exact_dup'
         |       WHEN doc_id IN (SELECT new_id FROM near) THEN 'near_dup'
         |       ELSE 'kept' END AS status
         |FROM incb_sigs WHERE is_new ORDER BY doc_id""".stripMargin)
  }

  private val ddIncrementalSql =
    s"""WITH d AS (
       |  SELECT doc_id, md5(text) AS th,
       |    CAST(substr(source, 4) AS INT) >= 10 AS is_new,
       |    list_sort(list_distinct(list_transform(grams,
       |      g -> ${duckH64("g")}))) AS hs
       |  FROM (
       |    SELECT doc_id, text, source, $duckGrams AS grams FROM (
       |      SELECT doc_id, text, source, string_split(text, ' ') AS toks
       |      FROM documents))),
       |near AS (
       |  SELECT DISTINCT n.doc_id FROM d n JOIN d o
       |    ON n.is_new AND NOT o.is_new
       |  WHERE round(CAST(len(list_intersect(n.hs, o.hs)) AS DOUBLE)
       |      / (len(n.hs) + len(o.hs) - len(list_intersect(n.hs, o.hs))),
       |      6) >= 0.6),
       |ex AS (
       |  SELECT DISTINCT n.doc_id FROM d n
       |  JOIN d o ON n.th = o.th AND n.is_new AND NOT o.is_new)
       |SELECT doc_id,
       |  CASE WHEN doc_id IN (SELECT doc_id FROM ex) THEN 'exact_dup'
       |       WHEN doc_id IN (SELECT doc_id FROM near) THEN 'near_dup'
       |       ELSE 'kept' END AS status
       |FROM d WHERE is_new ORDER BY doc_id""".stripMargin

  // -- dd_span: cross-document repeated-substring spans -----------------------
  // The ExactSubstr pass (Lee et al. 2022, "Deduplicating Training Data
  // Makes Language Models Better"): near-dup pair detection misses the
  // common web-corpus failure where only a PORTION of a document (a
  // licence header, a quoted article, a templated footer) is duplicated
  // across otherwise-distinct pages. This finds, per document, the
  // maximal token spans whose every 8-word window also occurs in at
  // least one OTHER document — the spans a span-level dedup pass would
  // cut. The reference's scraper has no analogue; this is training-data
  // hygiene the engine adds (same rationale as txt_decontaminate,
  // TextAnalysis.scala).
  //
  // Shape, replacing the paper's monolithic suffix array (which needs
  // the whole corpus in one address space) with pure shuffle-parallel
  // relational ops:
  //   1. explode each doc into positioned 8-gram md5 keys — narrow
  //      per-doc pass, the wide toks array is pruned inside the same
  //      codegen stage;
  //   2. keys held by >= 2 distinct docs — tested as min(doc_id) !=
  //      max(doc_id), a plain partial-aggregable min/max pair instead
  //      of a count-distinct (whose two-phase expand shuffles every
  //      (k, doc_id) pair twice for a predicate that only needs "more
  //      than one");
  //   3. LEFT SEMI join positions back onto the surviving keys —
  //      equi-join, map-side-prunable, never a pair product (a gram
  //      shared by n docs costs n index rows, not n^2 pair rows —
  //      the reason this scales where all-pairs span intersection
  //      cannot);
  //   4. gaps-and-islands per doc: windows partitioned BY DOC (fully
  //      parallel, no global sort) merge positions whose 8-token
  //      intervals overlap or touch (gap <= 8) into maximal spans.
  // The final ORDER BY is presentation-only. All arithmetic is integer;
  // the DuckDB oracle restates the identical five stages.
  private val SpanK = 8
  private def ddSpan(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gk = table(s, dir, "documents")
      .selectExpr("doc_id", "split(text, ' ') AS toks")
      .filter(s"size(toks) >= $SpanK")
      .selectExpr("doc_id", "toks",
        s"explode(sequence(1, size(toks) - ${SpanK - 1})) AS pos")
      .selectExpr("doc_id", "cast(pos as bigint) AS pos",
        s"md5(concat_ws(' ', slice(toks, pos, $SpanK))) AS k")
    // The gram table DELIBERATELY computes twice (once under the dup
    // aggregate, once as the probe side): forcing a shared
    // k-exchange to scan documents once was tried and is WORSE at
    // scale — it shuffles the full-width gram table (40 B/position)
    // where this form shuffles only the map-side-combined (k, min,
    // max) triples (duplicate grams collapse before the wire) and
    // leaves the probe side shuffle-free when the dup-key set
    // broadcasts; re-scanning text (~6 B/token) plus a second md5
    // pass is the cheaper side of that trade, and column pruning
    // diverges the two branches anyway, defeating ReuseExchange.
    val dup = gk.groupBy("k")
      .agg(min(col("doc_id")).as("d0"), max(col("doc_id")).as("d1"))
      .filter(col("d0") =!= col("d1")).select("k")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    // (doc_id, pos) is unique in gk by construction (pos is a
    // per-doc sequence) and LEFT SEMI never duplicates rows, so the
    // matched positions feed the window directly — the r19 plan paid
    // a full extra distinct() shuffle of the largest intermediate
    // here (17 MB at sf0.1, the bench's top shuffle key) for rows
    // that were already unique
    gk.join(dup, Seq("k"), "left_semi")
      .select("doc_id", "pos")
      // lag = null on the first row: null <= 8 is null -> otherwise(1),
      // starting a new island, identically three-valued in DuckDB
      .withColumn("flag",
        when(col("pos") - lag("pos", 1).over(w) <= SpanK, lit(0L))
          .otherwise(lit(1L)))
      .withColumn("grp", sum("flag")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "grp")
      .agg(min("pos").as("span_start"),
        (max("pos") + lit(SpanK - 1)).as("span_end"),
        count(lit(1)).as("n_grams"))
      .select("doc_id", "span_start", "span_end", "n_grams")
      .orderBy("doc_id", "span_start")
  }

  private val ddSpanSql =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
       |           FROM documents),
       |g AS (SELECT doc_id, unnest(range(1, len(toks) - ${SpanK - 2}))
       |        AS pos, toks
       |      FROM t WHERE len(toks) >= $SpanK),
       |gk AS (SELECT doc_id, pos,
       |         md5(array_to_string(toks[pos:pos+${SpanK - 1}], ' ')) AS k
       |       FROM g),
       |dup AS (SELECT k FROM gk GROUP BY k
       |        HAVING COUNT(DISTINCT doc_id) >= 2),
       |m AS (SELECT DISTINCT doc_id, pos FROM gk
       |      WHERE k IN (SELECT k FROM dup)),
       |fl AS (SELECT doc_id, pos,
       |         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
       |                ORDER BY pos) <= $SpanK
       |              THEN 0 ELSE 1 END AS flag
       |       FROM m),
       |isl AS (SELECT doc_id, pos,
       |          SUM(flag) OVER (PARTITION BY doc_id ORDER BY pos
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
       |        FROM fl)
       |SELECT doc_id, MIN(pos) AS span_start,
       |       MAX(pos) + ${SpanK - 1} AS span_end,
       |       CAST(COUNT(*) AS BIGINT) AS n_grams
       |FROM isl GROUP BY doc_id, grp ORDER BY doc_id, span_start"""
      .stripMargin

  // -- dd_minhash: per-document MinHash signatures ----------------------------
  // One narrow pass: signature j = min over shingles of (A_j*h + B_j) mod P.
  // The md5 shingle hash is hoisted into a per-doc array FIRST so it runs
  // once per shingle, and all 16 signatures come from ONE compiled pass
  // over it (graft_minhash16 — see GraftHashes.minhash16, which bakes the
  // same A/B/P family as the oracle SQL below; integer-exact, so the
  // unfused DuckDB formulation is unchanged).
  private def sparkSigCols: Seq[String] =
    (0 until K).map(j => s"element_at(sigarr, ${j + 1}) AS sig_$j")

  /** Streaming reuse ([[graft.streaming.Streams.nearDupStream]]): the
    * (band, bkey) expansion of a document frame — IDENTICAL banding to
    * dd_minhash_lsh (same shingles, same 16-perm MinHash, same 4 x 4
    * band keys), so the stream flags exactly the candidates the batch
    * pass would. Input columns: doc_id, ts, text.
    */
  private[graft] def bandRows(docs: DataFrame): DataFrame = {
    VectorFunctions.ensureRegistered(docs.sparkSession)
    val bandCols = (0 until Bands).map(b =>
      s"struct($b AS band, ${bandKeySpark(b)} AS bkey)")
    docs
      .selectExpr("doc_id", "ts", "split(text, ' ') AS toks")
      .selectExpr("doc_id", "ts", s"$sparkGrams AS grams")
      .selectExpr("doc_id", "ts", "graft_h32a(grams) AS ghs")
      .selectExpr("doc_id", "ts", "graft_minhash16(ghs) AS sigarr")
      .selectExpr(Seq("doc_id", "ts") ++ sparkSigCols: _*)
      .selectExpr("doc_id", "ts",
        s"explode(array(${bandCols.mkString(", ")})) AS bb")
      .selectExpr("bb.band AS band", "bb.bkey AS bkey", "doc_id", "ts")
  }

  private def duckSigCols: Seq[String] = (0 until K).map { j =>
    // empty-shingle guard: DuckDB's list_reduce ERRORS on an empty
    // list, while graft_minhash16 returns its fold identity
    // (Long.MaxValue) — a sub-2-token doc must yield the identical
    // identity signature in both engines, not an oracle crash (the
    // fixtures never hit this; ShortDocGuardSpec's doctored corpora
    // are exactly the input class that does)
    s"CASE WHEN len(ghs) = 0 THEN ${Long.MaxValue}" +
      s" ELSE list_reduce(list_transform(ghs," +
      s" h -> (${A(j)} * h + ${B(j)}) % $P)," +
      s" (x, y) -> least(x, y)) END AS sig_$j"
  }

  /** DuckDB restatement of [[bandRows]]'s (doc_id, band, bk) expansion,
    * as two WITH clauses (`nd_sigs`, `nd_bands`) — shared by the
    * streaming replay oracle (st_neardup_replay) so stream and batch
    * banding stay provably identical.
    */
  private[graft] def duckBandRowsSql: String = {
    val bandSelects = (0 until Bands)
      .map(b => s"SELECT doc_id, $b AS band, ${bandKeyDuck(b)} AS bk" +
        " FROM nd_sigs")
      .mkString(" UNION ALL ")
    s"""nd_sigs AS (
       |  SELECT doc_id, ${duckSigCols.mkString(", ")} FROM ($duckSigInput)),
       |nd_bands AS ($bandSelects)""".stripMargin
  }

  /** documents -> (doc_id, ghs: array<bigint>) hashed-shingle pipeline. */
  private def sigInput(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.ensureRegistered(s)
    table(s, dir, "documents")
      .selectExpr("doc_id", "split(text, ' ') AS toks")
      .selectExpr("doc_id", s"$sparkGrams AS grams")
      .selectExpr("doc_id", "graft_h32a(grams) AS ghs")
  }

  private val duckSigInput =
    s"""SELECT doc_id, list_transform(grams, g -> ${duckH("g")}) AS ghs
       |FROM (SELECT doc_id, $duckGrams AS grams FROM (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents))"""
      .stripMargin

  private def ddMinhash(s: SparkSession, dir: String): DataFrame =
    sigInput(s, dir)
      .selectExpr("doc_id", "graft_minhash16(ghs) AS sigarr")
      .selectExpr(Seq("doc_id") ++ sparkSigCols: _*)
      .orderBy(col("doc_id"))

  private val ddMinhashSql =
    s"""SELECT doc_id, ${(0 until K).map("sig_" + _).mkString(", ")} FROM (
       |  SELECT doc_id, ${duckSigCols.mkString(", ")} FROM ($duckSigInput))
       |ORDER BY doc_id""".stripMargin

  // -- dd_minhash_lsh: banded candidate pairs + signature similarity ----------
  // Shuffle carries only (band, 32-byte key) per doc; est_sim >= 0.5 filter.
  private def bandKeySpark(b: Int): String = {
    val cols = (0 until K / Bands).map(r => s"cast(sig_${b * K / Bands + r} as string)")
    s"md5(concat_ws(',', ${cols.mkString(", ")}))"
  }

  private def bandKeyDuck(b: Int): String = {
    val cols = (0 until K / Bands).map(r => s"CAST(sig_${b * K / Bands + r} AS VARCHAR)")
    s"md5(${cols.mkString(" || ',' || ")})"
  }

  private def ddMinhashLsh(s: SparkSession, dir: String): DataFrame = {
    // The signature relation is referenced three times in the plan below
    // (both band sides + the similarity join-back); cache it so the
    // md5/conv signature chain runs once per document, not three times.
    val sigs = sigInput(s, dir)
      .selectExpr("doc_id", "graft_minhash16(ghs) AS sigarr")
      .selectExpr(Seq("doc_id") ++ sparkSigCols: _*)
      .cache()
    trackCached(s, dir, sigs)
    sigs.createOrReplaceTempView("dd_sigs")
    val bandSelects = (0 until Bands)
      .map(b => s"SELECT doc_id, $b AS band, ${bandKeySpark(b)} AS bk FROM dd_sigs")
      .mkString(" UNION ALL ")
    val matches = (0 until K)
      .map(j => s"CASE WHEN a.sig_$j = b.sig_$j THEN 1 ELSE 0 END")
      .mkString(" + ")
    s.sql(
      s"""WITH bands AS ($bandSelects),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.bk = y.bk AND x.doc_id < y.doc_id)
         |SELECT doc_a, doc_b,
         |  round(cast(($matches) as double) / $K, 6) AS est_sim
         |FROM cand JOIN dd_sigs a ON a.doc_id = doc_a
         |          JOIN dd_sigs b ON b.doc_id = doc_b
         |WHERE round(cast(($matches) as double) / $K, 6) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin)
  }

  private val ddMinhashLshSql = {
    val bandSelects = (0 until Bands)
      .map(b => s"SELECT doc_id, $b AS band, ${bandKeyDuck(b)} AS bk FROM sigs")
      .mkString(" UNION ALL ")
    val matches = (0 until K)
      .map(j => s"CASE WHEN a.sig_$j = b.sig_$j THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH sigs AS (
       |  SELECT doc_id, ${duckSigCols.mkString(", ")} FROM ($duckSigInput)),
       |bands AS ($bandSelects),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bk = y.bk AND x.doc_id < y.doc_id)
       |SELECT doc_a, doc_b,
       |  round(CAST(($matches) AS DOUBLE) / $K, 6) AS est_sim
       |FROM cand JOIN sigs a ON a.doc_id = doc_a
       |          JOIN sigs b ON b.doc_id = doc_b
       |WHERE round(CAST(($matches) AS DOUBLE) / $K, 6) >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // -- dd_simhash: 16-bit SimHash per document --------------------------------
  // Token hashes are hoisted into one array (each md5 runs once, not once
  // per bit) and all 16 bit-counters fold in one compiled pass
  // (graft_simhash16); integer addition is order-independent, so the
  // unfused per-bit DuckDB formulation below is value-identical.
  private def simhashCore(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.ensureRegistered(s)
    table(s, dir, "documents")
      .selectExpr("doc_id", "split(text, ' ') AS toks")
      .selectExpr("doc_id", "graft_h16a(toks) AS hts")
      .selectExpr("doc_id", "cast(graft_simhash16(hts) as int) AS simhash")
  }

  private def ddSimhash(s: SparkSession, dir: String): DataFrame =
    simhashCore(s, dir).orderBy(col("doc_id"))

  private def sparkH16(v: String) = s"graft_h16($v)"
  private def duckH16(v: String) =
    s"CAST('0x' || substr(md5($v), 1, 4) AS BIGINT)"

  private val ddSimhashSql = {
    val bits = (0 until 16).map { b =>
      val mask = 1 << b
      s"CASE WHEN list_aggregate(list_transform(toks, t ->" +
        s" CASE WHEN (${duckH16("t")} & $mask) > 0 THEN 1 ELSE -1 END)," +
        s" 'sum') > 0 THEN $mask ELSE 0 END"
    }
    s"""SELECT doc_id, ${bits.mkString(" + ")} AS simhash
       |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  // -- dd_simhash_pairs: Hamming-distance near-dup pairs ----------------------
  private def ddSimhashPairs(s: SparkSession, dir: String): DataFrame = {
    // Hamming-ball EQUI-join instead of an all-pairs loop: every 16-bit
    // signature within distance <= 2 of `x` is `x ^ m` for one of the
    // 1 + 16 + C(16,2) = 137 masks, so exploding side A by the mask set
    // turns near-dup search into `a.simhash ^ m = b.simhash` — a hash
    // join whose shuffle is 137 x N small rows, not N^2 pairs. Each
    // qualifying pair matches exactly one mask (distinct xor patterns),
    // so no dedup is needed. This is the shape that survives corpus
    // scale; the DuckDB oracle keeps the O(N^2) formulation as the
    // independent spec of the same result set.
    val masks = Seq(0) ++
      (0 until 16).map(1 << _) ++
      (for { i <- 0 until 16; j <- i + 1 until 16 }
        yield (1 << i) | (1 << j))
    val sims = simhashCore(s, dir).cache()
    trackCached(s, dir, sims)
    val a = sims
      .select(col("doc_id").as("doc_a"), col("simhash").as("sim_a"))
      .withColumn("variant",
        explode(array(masks.map(m => col("sim_a").bitwiseXOR(lit(m))): _*)))
    val b = sims.select(col("doc_id").as("doc_b"),
      col("simhash").as("sim_b"))
    a.join(b, col("variant") === col("sim_b")
        && col("doc_a") < col("doc_b"))
      .selectExpr("doc_a", "doc_b",
        "cast(bit_count(sim_a ^ sim_b) as int) AS hamming")
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private val ddSimhashPairsSql = {
    val bits = (0 until 16).map { b =>
      val mask = 1 << b
      s"CASE WHEN list_aggregate(list_transform(toks, t ->" +
        s" CASE WHEN (${duckH16("t")} & $mask) > 0 THEN 1 ELSE -1 END)," +
        s" 'sum') > 0 THEN $mask ELSE 0 END"
    }
    s"""WITH sims AS (
       |  SELECT doc_id, ${bits.mkString(" + ")} AS simhash
       |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
       |FROM sims a JOIN sims b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // -- dd_simhash64: 64-bit SimHash + banded Hamming equi-join ----------------
  // The production-width variant (the 16-bit one above keeps the historic
  // oracle but saturates at ~10^5 docs: 65 k possible signatures). Token
  // hashes take all 16 md5 hex chars as two 32-bit halves; the signature
  // is one fused pass (graft_simhash64), and near-dup search uses the
  // PIGEONHOLE banding that generalizes the 137-mask trick: if
  // hamming(a, b) <= 3 then at least one of the four 16-bit bands is
  // IDENTICAL, so an equi-join on (band, band_value) yields a
  // guaranteed superset of the answer — 4 small keys per doc shuffle,
  // never a pair cross product, and the exact bit_count re-check keeps
  // the result EXACT (the DuckDB oracle states the same result as the
  // independent O(N^2) spec). Band extraction (sig >> 16b) & 65535 is
  // two's-complement-safe: the mask keeps only low bits, so arithmetic
  // vs logical shift cannot differ.
  private def ddSimhash64(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.ensureRegistered(s)
    val sims = table(s, dir, "documents")
      .selectExpr("doc_id", "split(text, ' ') AS toks")
      .selectExpr("doc_id",
        "graft_h32a(toks) AS los",
        // hex digits 9..16 of the same md5 — the fused form of
        // conv(substring(md5(t), 9, 8), 16, 10) per element
        "graft_h32b(toks) AS his")
      .selectExpr("doc_id", "graft_simhash64(los, his) AS sig")
      .cache()
    trackCached(s, dir, sims)
    sims.createOrReplaceTempView("sh64_sims")
    val bandSelects = (0 until 4)
      .map(b => s"SELECT doc_id, $b AS band," +
        s" shiftright(sig, ${16 * b}) & 65535 AS bv FROM sh64_sims")
      .mkString(" UNION ALL ")
    s.sql(
      s"""WITH bands AS ($bandSelects),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id)
         |SELECT doc_a, doc_b,
         |  cast(bit_count(a.sig ^ b.sig) as int) AS hamming
         |FROM cand JOIN sh64_sims a ON a.doc_id = doc_a
         |          JOIN sh64_sims b ON b.doc_id = doc_b
         |WHERE bit_count(a.sig ^ b.sig) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin)
  }

  /** Corpus-scale SimHash candidate generator with a TUNABLE block
    * scheme (Manku et al., WWW 2007, generalized): split the 64-bit
    * signature into `blocks` contiguous blocks and key one candidate
    * table on every combination of `blocks - k` of them. If
    * `hamming(a, b) <= k`, the differing bits touch at most `k`
    * blocks, so some untouched combination keys identically — the
    * same pigeonhole guarantee as the fixed 4x16 banding, which is
    * EXACTLY this scheme at (blocks = 4, k = 3): C(4,1) = 4 tables
    * keyed on one 16-bit block each. The scale knob: at corpus size n,
    * 16-bit keys collide quadratically (4 * n^2 / 2^17 background
    * pairs at ANY n); raising `blocks` to 6 keys C(6,3) = 20 tables on
    * ~33 bits each — 20x the tables but 2^17x fewer collisions per
    * table, the right trade as soon as n outgrows the key space.
    * SimhashScalingSpec pins the guarantee (equality with brute-force
    * Hamming <= k, not just a superset) and the noise shrink.
    *
    * Input: (doc_id BIGINT, sig BIGINT). Output: distinct candidate
    * pairs (doc_a < doc_b) — callers re-check `bit_count(xor) <= k`
    * exactly, as dd_simhash64 does over its banding.
    */
  private[graft] def simhash64Candidates(sigs: DataFrame, blocks: Int,
                                         k: Int): DataFrame = {
    require(blocks > k && blocks <= 64,
      s"need k < blocks <= 64, got blocks=$blocks k=$k")
    val widths = (0 until blocks)
      .map(b => 64 / blocks + (if (b < 64 % blocks) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    val tables = (0 until blocks).combinations(blocks - k).toSeq
    val maxKeyBits = tables.map(_.map(widths).sum).max
    require(maxKeyBits <= 63,
      s"combined key would carry $maxKeyBits bits; raise k or blocks")
    val keyStructs = tables.zipWithIndex.map { case (sel, ti) =>
      // shift-accumulate the selected blocks into one BIGINT key
      val key = sel.foldLeft("0L") { (acc, b) =>
        s"(shiftleft($acc, ${widths(b)}) | " +
          s"(shiftright(sig, ${offsets(b)}) & ${(1L << widths(b)) - 1}L))"
      }
      s"struct($ti AS tbl, $key AS bv)"
    }
    val exploded = sigs.selectExpr("doc_id",
        s"explode(array(${keyStructs.mkString(", ")})) AS key")
      .select(col("doc_id"), col("key.tbl"), col("key.bv"))
    exploded.alias("x").join(exploded.alias("y"),
        col("x.tbl") === col("y.tbl") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
  }

  private val ddSimhash64Sql = {
    def lo(t: String) = s"CAST('0x' || substr(md5($t), 1, 8) AS BIGINT)"
    def hi(t: String) = s"CAST('0x' || substr(md5($t), 9, 8) AS BIGINT)"
    val terms = (0 until 64).map { b =>
      val bit =
        if (b < 32) s"(${lo("t")} & ${1L << b})"
        else s"(${hi("t")} & ${1L << (b - 32)})"
      val value =
        if (b < 63) (1L << b).toString else "(-9223372036854775807 - 1)"
      s"CASE WHEN list_aggregate(list_transform(toks, t ->" +
        s" CASE WHEN $bit <> 0 THEN 1 ELSE -1 END), 'sum') > 0" +
        s" THEN $value ELSE 0 END"
    }
    s"""WITH sims AS (
       |  SELECT doc_id, ${terms.mkString(" + ")} AS sig
       |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
       |FROM sims a JOIN sims b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sig, b.sig)) <= 3
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // -- dd_embed_cosine / dd_embed_cosine_lsh: embedding near-dup pairs --------
  // Two variants with an explicit spec relationship:
  //
  //  * dd_embed_cosine — the EXACT spec: every ordered pair scored with
  //    the same IEEE dot-product fold in both engines, threshold
  //    cos >= 0.4. Spark side is an all-pairs join (quadratic — this is
  //    the small-scale exactness oracle, same role as sim_topk_brute for
  //    the ANN paths, NOT the 100 TB path); the DuckDB oracle is an
  //    INDEPENDENT all-pairs formulation, so the hash-compare checks the
  //    arithmetic, not a shared shortcut.
  //
  //  * dd_embed_cosine_lsh — the production 100 TB shape: candidates from
  //    a multi-table random-hyperplane LSH band equi-join (12 bands x 5
  //    sign bits, deterministic integer hyperplanes identical in both
  //    dialects), exact graft_dot re-score on same-bucket pairs only.
  //    Shuffle carries 12 small (band, bucket) keys per vector; pair
  //    generation is bucket-local, never a cross product (PlanSpec
  //    asserts this). Its result is BY CONTRACT a subset of
  //    dd_embed_cosine: the banding is a candidate filter with
  //    probabilistic recall, and the same banding runs in its oracle so
  //    the deterministic candidate set is hash-compared exactly.
  //    DedupRecallSpec asserts the subset relation against the exact
  //    variant on real data.
  //
  // Recall (measured, sf0.01): this corpus's embeddings are uniform-random
  // — the pairs >= 0.4 are the extreme tail of NOISE (angle ~66° vs 90°
  // background), and at that separation no sub-quadratic method keeps
  // every pair (per-hyperplane agreement 0.63 vs 0.50 background); the
  // 12x5 banding keeps ~49% of them while scoring 3.6x fewer pairs. In
  // the regime LSH pruning is FOR — near-dups at cos >= 0.9 (agreement
  // 0.857) — the same banding has recall 1-(1-0.857^5)^12 = 0.998.
  private val CosBands = 12
  private val CosRows = 5

  /** Hyperplane j, 1-based component i: ((j+1)*2654435761 + 40503*i)
    * mod 97 - 48 — an LCG-style integer family with period 97 > 60 in j
    * (the round-3 `% 11` family repeats after 11 planes), identical
    * arithmetic in both dialects. The Spark side computes all 60 plane
    * folds in one compiled pass (graft_rh_buckets — GraftHashes.rhBuckets
    * bakes this same family with the same IEEE fold order); the DuckDB
    * oracle keeps the unfused per-plane formulation below.
    */
  private def cosPlaneDotD(j: Int): String = {
    val cj = (j + 1) * 2654435761L
    s"list_reduce(list_transform(range(1, len(embedding) + 1), i ->" +
      s" CAST(embedding[i] AS DOUBLE)" +
      s" * CAST(($cj + 40503 * i) % 97 - 48 AS DOUBLE)), (x, y) -> x + y)"
  }

  private def cosBucket(dot: Int => String, b: Int): String =
    (0 until CosRows)
      .map(k => s"(CASE WHEN ${dot(b * CosRows + k)} > 0" +
        s" THEN ${1 << k} ELSE 0 END)")
      .mkString(" + ")

  /** The exact all-pairs spec (small-scale oracle; `_lsh` is the scale
    * path). `a.vec_id < b.vec_id` is a non-equi condition, so this is
    * deliberately a nested-loop join — quadratic by definition of the
    * spec, like sim_topk_brute.
    */
  private def ddEmbedExactPairs(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.ensureRegistered(s)
    val e = table(s, dir, "embeddings")
      .selectExpr("vec_id", "embedding",
        "graft_dot(embedding, embedding) AS n2")
    e.createOrReplaceTempView("cosx_e")
    // graft_cos fuses dot/sqrt/divide into one kernel call; the raw
    // prefilter (strictly looser than the rounded threshold: round6(x)
    // >= 0.4 implies x >= 0.3999995 - ulp > 0.3999994) discards the
    // overwhelming majority of pairs on a primitive double compare, so
    // the BigDecimal `round` only runs for near-threshold survivors.
    // The exact rounded filter stays — the result set is unchanged.
    // The streamed side is ROUND-ROBIN repartitioned (r21): the
    // corpus is one parquet file at fixture scale, so the nested-loop
    // grid — quadratic by spec — otherwise ran in the scan's single
    // partition on one core (the recall frames' pattern; round-robin
    // is neither elidable nor AQE-coalescible).
    val exP = s.conf.get("spark.sql.shuffle.partitions").toInt
    e.selectExpr("vec_id AS vec_a", "embedding AS ea", "n2 AS na")
      .repartition(exP)
      .join(e.selectExpr("vec_id AS vec_b", "embedding AS eb",
        "n2 AS nb"), col("vec_a") < col("vec_b"))
      .selectExpr("vec_a", "vec_b", "graft_cos(ea, eb, na, nb) AS cs")
      .where("cs > 0.3999994")
      .selectExpr("vec_a", "vec_b", "round(cs, 6) AS cos_sim")
      .where("cos_sim >= 0.4")
  }

  private def ddEmbedCosineExact(s: SparkSession, dir: String): DataFrame =
    ddEmbedExactPairs(s, dir).orderBy(col("vec_a"), col("vec_b"))

  private val ddEmbedCosineExactSql =
    """WITH e AS (
      |  SELECT vec_id, embedding,
      |    list_reduce(list_transform(range(1, len(embedding) + 1),
      |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
      |      (x, y) -> x + y) AS n2
      |  FROM embeddings)
      |SELECT vec_a, vec_b, cos_sim FROM (
      |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |    round(list_reduce(list_transform(range(1, len(a.embedding) + 1),
      |        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)),
      |        (x, y) -> x + y) / sqrt(a.n2 * b.n2), 6) AS cos_sim
      |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
      |WHERE cos_sim >= 0.4
      |ORDER BY vec_a, vec_b""".stripMargin

  /** Unordered banded cosine pairs — the composition form (see
    * [[ddJaccardPairs]] for why cluster inputs must not carry the sort).
    */
  /** Register the cached bucketed embedding relation as `cos_e` —
    * shared by the pair query and the collapsed cluster edge builder
    * so probe and index can never band differently.
    */
  private def ensureCosE(s: SparkSession, dir: String): String = {
    VectorFunctions.ensureRegistered(s)
    val v = cview("cos_e", dir)
    // cached: the bucketed relation feeds all 12 band sides and both
    // re-score join-backs — the 60 hyperplane folds run once per
    // vector, and re-registrations serve the SAME cached blocks (the
    // cache manager keys on the canonical plan, not the view name).
    // The view stays registered (dropping it would unpersist that
    // shared entry under the lazy verify frames); the blocks are
    // released by invalidateLpEdges through the tracked-cache hook.
    val e = table(s, dir, "embeddings")
      .selectExpr("vec_id", "embedding",
        "graft_dot(embedding, embedding) AS n2",
        "graft_rh_buckets(embedding) AS bks")
      .cache()
    e.createOrReplaceTempView(v)
    trackCached(s, dir, e)
    v
  }

  /** The cosine family's REP-level verified pairs (rep_a, rep_b,
    * cos_sim) plus the collapse membership registered as `cos_grp` —
    * [[ddJaccardRepPairs]]' guard for the embedding side: byte-
    * identical vectors collapse to their min-vec_id rep (key = the
    * vector rendering, zero-norm carve-out), only reps are banded,
    * the graft_cos verify runs once per group pair.
    */
  private[graft] def ddEmbedLshRepPairs(s: SparkSession,
                                        dir: String): DataFrame =
    cosRelations(s, dir).repVer

  /** The cosine family's shared collapse relations, one per
    * (session, corpus) — see [[jacRelations]].
    */
  private def cosRelations(s: SparkSession, dir: String): PairRelations =
    cosRelCache.getOrBuild(s, s"cos_pairs|$dir") {
      val (grp, ver) = cosRepVerifyFrame(s, dir)
      PairRelations(ver.truncated(), grp)
    }

  /** Membership (eager) + the rep-level banded cosine verify LAZY —
    * the [[jacRepVerifyFrame]] split for the cosine family's PlanSpec
    * pins (fused graft_cos kernel, raw prefilter, banded equi-joins).
    */
  private[graft] def cosRepVerifyFrame(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val ev = ensureCosE(s, dir)
    val gv = uview("cos_grp"); val rv = uview("cos_repe")
    val grp = embedGrpFrame(s, ev)
    grp.createOrReplaceTempView(gv)
    s.sql(
      s"""SELECT s.vec_id, s.bks FROM $ev s
         |JOIN (SELECT DISTINCT rep FROM $gv) r ON s.vec_id = r.rep"""
        .stripMargin)
      // count-derived width, not the old literal 4 — see repPartitions
      .coalesce(repPartitions(s, grp.count())).truncated()
      .createOrReplaceTempView(rv)
    // Band-side zero-norm guard — the embedding-space twin of
    // jacBandGuard: a zero vector's hyperplane dots are all 0, so its
    // sign buckets are the CONSTANT key in every band (all zero-norm
    // vectors share one bucket — |zero|²/2 candidates at corpus
    // scale), while its cosine to anything is 0/0 = NaN, which both
    // engines' NaN-is-greatest comparison semantics would wave
    // through the >= 0.4 verify as a bogus near-dup edge. Excluding
    // zero-norm vectors from the BAND side kills both failure modes
    // at candidate generation; they still reach every node list and
    // surface as singletons (ZeroNormGuardSpec). The oracle
    // restatements carry the same WHERE n2 > 0, so both dialects
    // state the same query. (They are also off the collapse: NaN
    // cosine means identical zero twins are never a pair.)
    val bandSelects = (0 until CosBands)
      .map(b => s"SELECT vec_id, $b AS band, element_at(bks, ${b + 1}) AS bkt" +
        s" FROM $rv")
      .mkString(" UNION ALL ")
    val ver = s.sql(
      s"""WITH bands AS ($bandSelects),
         |cand AS (
         |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.bkt = y.bkt AND x.vec_id < y.vec_id)
         |SELECT vec_a AS rep_a, vec_b AS rep_b, cos_sim FROM (
         |  SELECT vec_a, vec_b, round(cs, 6) AS cos_sim FROM (
         |    SELECT vec_a, vec_b,
         |      graft_cos(a.embedding, b.embedding, a.n2, b.n2) AS cs
         |    FROM cand JOIN $ev a ON a.vec_id = vec_a
         |              JOIN $ev b ON b.vec_id = vec_b)
         |  WHERE cs > 0.3999994)
         |WHERE cos_sim >= 0.4""".stripMargin)
    dropUviews(s, gv, rv)
    (grp, ver)
  }

  /** Member-level banded cosine pairs — the composition form behind
    * dd_embed_cosine_lsh and dd_decontaminate_semantic: the rep-level
    * verified pairs expand through `cos_grp` on both sides
    * (byte-identical vectors make the verified cosine every member
    * pair's cosine, bit-exactly), and within-group pairs carry
    * cos_sim 1 directly (round-6 of a cosine within one ulp of 1).
    * Output is row-for-row the uncollapsed banded pair table.
    * Expansion via [[expandMemberPairs]] — no temp views.
    */
  private def ddEmbedLshPairs(s: SparkSession, dir: String): DataFrame =
    expandMemberPairs(cosRelations(s, dir), "vec_id", "cos_sim",
      "vec_a", "vec_b")

  private def ddEmbedCosineLsh(s: SparkSession, dir: String): DataFrame =
    ddEmbedLshPairs(s, dir).orderBy(col("vec_a"), col("vec_b"))

  /** Corpus-scale candidate generator with TUNABLE banding — the same
    * bucket-local equi-join shape as [[ddEmbedLshPairs]], but over the
    * parameterized plane family (`graft_rh_buckets_n`). The fixed 12x5
    * default is the fixture/oracle path (its weights are baked into the
    * DuckDB restatements); a deployment sizes `rows ~ log2(n / bands)`
    * so background collisions stay O(bands) per vector instead of
    * quadratic in corpus size, and grows `bands` alongside to hold
    * near-dup recall (the math is on [[graft.functions.GraftHashes
    * .rhBucketsN]]). LshScalingSpec pins both directions: noise
    * candidates shrink ~2^(rows delta), planted near-dups survive.
    */
  private[graft] def embedLshCandidates(emb: DataFrame, bands: Int,
                                        rows: Int): DataFrame = {
    VectorFunctions.ensureRegistered(emb.sparkSession)
    val bandsDf = emb
      .selectExpr("vec_id", "embedding",
        s"graft_rh_buckets_n(embedding, $bands, $rows) AS bks")
      // same zero-norm band guard as ddEmbedLshPairs (constant-bucket
      // bomb + NaN-cosine wave-through; see the comment there)
      .where(expr("graft_dot(embedding, embedding) > 0"))
      .select(col("vec_id"), posexplode(col("bks")).as(Seq("band", "bkt")))
    bandsDf.alias("x").join(bandsDf.alias("y"),
        col("x.band") === col("y.band") && col("x.bkt") === col("y.bkt") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .distinct()
  }

  /** The edge frame dd_embed_cluster / dd_semdedup /
    * dd_embed_cluster_incremental feed into label propagation (via the
    * shared embed_lsh registry entry), with the EXACT-DUPLICATE bomb
    * defused the same way as [[ddClusterEdges]]: k identical
    * embeddings (duplicate docs embed identically) share every RH-LSH
    * bucket, so the banded join emits k²/2 pairs that all verify at
    * cos 1. Identical vectors collapse to a min-vec_id representative
    * (one groupBy on md5 of the vector rendering, read from the cached
    * cos_e relation), only representatives band, members attach by
    * k-1 star edges. Exact: vector-identical nonzero pairs have cos 1
    * ≥ 0.4 (true edges), a member's banded candidates are carried by
    * its identically-bucketed rep, and zero-norm vectors are EXCLUDED
    * from collapse groups (cos 0/0 = NaN is never an edge — same
    * carve-out as the band-side zero-norm guard), so the component
    * partition is bit-identical to the uncollapsed banded graph — the
    * closure oracle and DedupRecallSpec's refinement invariant hold
    * unchanged. Collapse frames are eager pruned localCheckpoints,
    * never lazy caches (the measured traps at [[ddClusterEdges]]).
    */
  private[graft] def embedClusterEdges(s: SparkSession,
                                       dir: String): DataFrame = {
    val ev = ensureCosE(s, dir)
    val gv = uview("ec_grp"); val rsv = uview("ec_repsigs")
    val rbv = uview("ec_repbands")
    val grp = embedGrpFrame(s, ev)
    grp.createOrReplaceTempView(gv)
    // count-derived widths, not the old literal 4s (see repPartitions):
    // the membership count bounds reps from above; the band relation
    // is CosBands rows per rep
    val nGrp = grp.count()
    s.sql(
      s"""SELECT s.vec_id, s.bks FROM $ev s
         |JOIN (SELECT DISTINCT rep FROM $gv) r ON s.vec_id = r.rep"""
        .stripMargin)
      .coalesce(repPartitions(s, nGrp)).truncated()
      .createOrReplaceTempView(rsv)
    s.sql(
      (0 until CosBands)
        .map(b => s"SELECT vec_id, $b AS band," +
          s" element_at(bks, ${b + 1}) AS bkt FROM $rsv")
        .mkString(" UNION ALL "))
      .coalesce(repPartitions(s, CosBands.toLong * nGrp)).truncated()
      .createOrReplaceTempView(rbv)
    val edges = s.sql(
      s"""WITH cand AS (
         |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
         |  FROM $rbv x JOIN $rbv y
         |    ON x.band = y.band AND x.bkt = y.bkt AND x.vec_id < y.vec_id),
         |ver AS (
         |  SELECT vec_a, vec_b FROM (
         |    SELECT vec_a, vec_b, round(cs, 6) AS cos_sim FROM (
         |      SELECT vec_a, vec_b,
         |        graft_cos(a.embedding, b.embedding, a.n2, b.n2) AS cs
         |      FROM cand JOIN $ev a ON a.vec_id = vec_a
         |                JOIN $ev b ON b.vec_id = vec_b)
         |    WHERE cs > 0.3999994)
         |  WHERE cos_sim >= 0.4)
         |SELECT vec_a, vec_b FROM ver
         |UNION ALL
         |SELECT rep AS vec_a, vec_id AS vec_b FROM $gv
         |WHERE vec_id <> rep""".stripMargin)
    dropUviews(s, gv, rsv, rbv)
    edges
  }

  private val ddEmbedCosineLshSql =
    s"""WITH ${duckEmbedECte()},
       |bands AS ($duckEmbedBandSelects),
       |cand AS (
       |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bkt = y.bkt AND x.vec_id < y.vec_id)
       |SELECT vec_a, vec_b, cos_sim FROM (
       |  SELECT vec_a, vec_b,
       |    ${duckEmbedCos("a", "b")} AS cos_sim
       |  FROM cand JOIN e a ON a.vec_id = vec_a
       |            JOIN e b ON b.vec_id = vec_b)
       |WHERE cos_sim >= 0.4
       |ORDER BY vec_a, vec_b""".stripMargin

  // -- dd_cluster: near-dup connected components ------------------------------
  // Pairs are only half the dedup story — a keep-one-per-group pipeline
  // needs CLUSTER assignments. Edges are the banded dd_jaccard pairs
  // (j >= 0.6); components come from iterative min-label propagation:
  // each round every doc takes the min cluster id among itself and its
  // neighbors, converging in O(component diameter) rounds — near-dup
  // components are shallow (dozens of docs, diameter ~2-3), so this is
  // 2-4 small equi-join shuffles, never a transitive-closure blowup.
  // This is the same algorithm GraphFrames' connectedComponents runs.
  // The label frame is localCheckpoint'd EVERY round, truncating lineage
  // so plan depth (and re-planning cost) stays bounded no matter how
  // many rounds a deep component needs. The driver-side loop is CONTROL
  // FLOW only — convergence is read from an accumulator filled during
  // the checkpoint job itself, so each round is exactly ONE Spark job
  // and no row data ever reaches the driver.
  //
  // The DuckDB oracle is independent twice over: all-pairs edges (no
  // banding) and a recursive-CTE transitive closure (no label
  // propagation), so the hash-compare checks both the candidate recall
  // and the component arithmetic. cluster_id = min doc_id reachable;
  // docs in no pair are singleton clusters of themselves.
  /** Min-label propagation over an undirected pair list: every node in
    * `nodes` starts as its own cluster, takes the min label among itself
    * and its `pairs` neighbors each round, and the loop stops at the
    * fixed point. Shared by dd_cluster (jaccard edges), dd_embed_cluster
    * (cosine-LSH edges) and mm_phash_cluster (phash edges) — see
    * dd_cluster's comment for the full scale rationale. `op` names the
    * calling operator in the non-convergence error.
    *
    * Node ids must be BIGINT (every graft table's id column is) — the
    * convergence tap reads them as longs.
    *
    * RELEASE CONTRACT: the returned frame is `.cache()`'d (the global
    * sort most callers add executes its input twice — range-partition
    * sampling plus the sort — and the nodes scan can be expensive).
    * The caller that materializes the result owns the release:
    * `unpersist()` it (or `catalog.clearCache()`) once consumed, as
    * Verify does per query and Bench per rep. Intermediate per-round
    * localCheckpoint RDD blocks are reclaimed by the ContextCleaner
    * once the loop drops its references.
    */
  /** Propagate+shortcut passes folded into each LP round's single
    * checkpoint job (override with GRAFT_LP_PASSES for measurement).
    * See the round-loop comment for the measured trade.
    */
  private val LpPassesPerRound = {
    val p = sys.env.getOrElse("GRAFT_LP_PASSES", "2").toInt
    // 0 would make every round after the first a no-op whose
    // convergence tap sees prev == cluster_id — the loop would
    // "converge" immediately and hand back under-propagated clusters
    // silently; fail loudly instead
    require(p >= 1, s"GRAFT_LP_PASSES must be >= 1, got $p")
    p
  }

  /** A prepared LP edge structure: the symmetric closure, hash-
    * partitioned by the neighbor-join key and checkpointed (see the
    * comments at the build site), plus the shuffle sizing derived from
    * its measured edge count.
    */
  private final case class LpEdges(edgesBoth: DataFrame, nEdges: Long,
                                   loopP: Int)

  /** Materialize one LP edge structure from a pair pipeline. Callers
    * run this under the LP loop's AQE-off scope (labelPropagate's
    * withLoopConf, or [[ddLpEdges]]'s own) so the build's plan shape is
    * identical on every path.
    */
  private def prepLpEdges(session: SparkSession, pairs: => DataFrame,
                          defaultP: Int): LpEdges = {
    val lpDebug = sys.env.contains("GRAFT_LP_DEBUG")
    val tE = System.nanoTime()
    // Both checkpointed frames are exactly two BIGINT columns per
    // edge — any column the pair pipeline carried (cos_sim, band,
    // shingle sets) is projected away by the caller, so the
    // materialized rows are as small as an edge can be.
    val e1 = pairs.toDF("pa", "pb").truncated()
    // With AQE scoped off, nothing coalesces the loop's shuffles, so
    // size them from the measured edge count instead — the work AQE's
    // runtime coalescing was doing, paid once here rather than one
    // stage-materialization job per shuffle per round. Every loop
    // shuffle carries O(edge-incident nodes) <= 2*|E| rows, so
    // ~256k rows/partition keeps tasks meaningful at any scale; the
    // session default stays as the cap (a cluster deployment sizes
    // that for the corpus, and the loop never needs more than the
    // corpus-scale setting). The count is one tiny job over the
    // already-checkpointed RDD.
    val nEdges = e1.count()
    val loopP = math.max(1L, math.min(defaultP.toLong,
      2L * nEdges / 262144L + 1L)).toInt
    // The symmetric closure is hash-partitioned by `dst` (the
    // neighbor-join key), sorted within partitions, and checkpointed
    // ONCE: localCheckpoint preserves outputPartitioning and
    // outputOrdering in the LogicalRDD leaf (asserted by
    // LpFrontierSpec), so EVERY round's neighbor join finds the edge
    // side already exchanged+sorted and only moves the label side —
    // per-round shuffle drops from O(E) to O(V), the difference
    // between re-exchanging a billion-edge list five times and once
    // at corpus scale. This replaces the old per-round
    // coalesce+union (which also collapsed task waves to loopP, as
    // the repartition here does, but rebuilt and re-shuffled the 2E
    // closure inside every round). The one-time cost is a single 2E
    // exchange over already-materialized blocks.
    val edgesBoth = e1
      .union(e1.select(col("pb"), col("pa")))
      .toDF("src", "dst")
      .repartition(loopP, col("dst"))
      .sortWithinPartitions(col("dst"))
      .truncated()
    if (lpDebug) System.err.println(
      f"LP edges took ${(System.nanoTime() - tE) / 1e9}%.2f s")
    LpEdges(edgesBoth, nEdges, loopP)
  }

  /** Session-scoped registry of prepared edge frames, keyed by the
    * edge-pipeline identity callers declare via `shareKey`. This is a
    * materialized-intermediate registry, not a benchmark cache: the
    * banded candidate pipeline is the dominant cost of every LP
    * consumer (BENCHING.md r14 attribution), and dd_embed_cluster /
    * dd_semdedup consume the IDENTICAL banded edge set — at 100 TB,
    * rebuilding a billion-edge banded self-join per downstream query
    * is the difference between one corpus pass and one per query (the
    * same share-the-model argument as [[Similarity]]'s ivfpqModelCache,
    * which the clustering+curation pair mirrors: clustering is the
    * diagnosis, semdedup the action over the same edges). Entries hold
    * localCheckpoint blocks, so they are session-bound (keyed by
    * session identity, purged when the context stops) and survive
    * `catalog.clearCache()` by design — the registry, not the catalog,
    * owns their lifetime.
    *
    * Lifecycle contract (LpEdgeCacheSpec):
    *   - BOUNDED: at most [[LpEdgeCacheMax]] entries, least-recently-
    *     USED evicted first (a long-lived session touring many corpora
    *     pins at most the cap's worth of checkpoint blocks; evicted
    *     entries' RDD blocks are reclaimed by the ContextCleaner once
    *     unreferenced).
    *   - INVALIDATION: a corpus rewritten in place under the same dir
    *     serves stale edges until [[invalidateLpEdges]] is called for
    *     that dir (or the session is replaced) — the registry cannot
    *     watch the filesystem, so staleness is the CALLER's contract,
    *     exactly like Spark's own `REFRESH TABLE`.
    */
  private val LpEdgeCacheMax: Int = {
    val m = sys.env.getOrElse("GRAFT_LP_EDGE_CACHE_MAX", "8").toInt
    require(m >= 1, s"GRAFT_LP_EDGE_CACHE_MAX must be >= 1, got $m")
    m
  }

  /** Generic bounded, invalidatable, session-bound registry of
    * materialized frames — the lifecycle mechanics behind the shared
    * LP edge frames, factored out (r17) so the jaccard/cosine pair
    * relations live under the SAME contract (LpEdgeCacheSpec's three
    * clauses: sharing, invalidation, LRU bound) instead of a
    * divergent copy. Keys are (session identity, "name|corpusDir");
    * values hold localCheckpoint blocks, so entries are session-bound
    * (purged when the context stops) and survive
    * `catalog.clearCache()` by design — the registry, not the
    * catalog, owns their lifetime.
    *
    * The monotonic invalidation stamp is bumped under the lock by
    * every invalidate/clear. A build that STARTED before an
    * invalidation must not register its (possibly pre-rewrite) result
    * after it — getOrBuild snapshots the stamp before building and
    * only puts if no invalidation intervened, closing the
    * build-outside-lock / invalidate interleaving that would
    * otherwise re-install stale frames right after the caller
    * followed the staleness contract. The build runs OUTSIDE the
    * lock — two concurrent first-callers may both build (last one
    * wins; the loser's blocks are ContextCleaner-reclaimed), the
    * standard price for not blocking every other session's lookup
    * behind a multi-second materialization.
    */
  private[graft] final class FrameRegistry[V <: AnyRef](maxEntries: Int) {
    private val cache =
      new java.util.LinkedHashMap[(SparkSession, String), V](
          16, 0.75f, /*accessOrder=*/ true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[(SparkSession, String), V])
            : Boolean = size() > maxEntries
      }
    private var invalidations = 0L

    private def purgeDead(): Unit = {
      val it = cache.keySet().iterator()
      while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
    }

    def getOrBuild(session: SparkSession, key: String)(build: => V): V = {
      val k = (session, key)
      val (hit, stamp) = cache.synchronized {
        purgeDead()
        (cache.get(k), invalidations)
      }
      if (hit != null) hit
      else {
        val e = build
        cache.synchronized {
          // an invalidation ran while we built: our result may predate
          // the rewrite that triggered it — serve it to THIS caller
          // (its own read is as fresh as its own build) but don't
          // register it for future ones
          if (invalidations == stamp) cache.put(k, e)
        }
        e
      }
    }

    def invalidate(session: SparkSession, dir: String): Unit =
      cache.synchronized {
        invalidations += 1
        val it = cache.keySet().iterator()
        while (it.hasNext) {
          val k = it.next()
          if (k._1 == session && k._2.endsWith("|" + dir)) it.remove()
        }
      }

    def clear(): Unit = cache.synchronized {
      invalidations += 1
      cache.clear()
    }

    def keys: Seq[String] = cache.synchronized {
      import scala.jdk.CollectionConverters._
      cache.keySet().asScala.toSeq.map(_._2)
    }
  }

  private val lpEdgeCache = new FrameRegistry[LpEdges](LpEdgeCacheMax)

  /** The collapse relations a banded pair family shares per
    * (session, corpus): the rep-level VERIFIED pair table and the
    * (member, rep) membership, both lineage-truncated. grp is small
    * by construction; repVer is bounded by the rep-level candidate
    * volume — never the member expansion, which stays lazy in each
    * consumer.
    */
  private[graft] final case class PairRelations(repVer: DataFrame, grp: DataFrame) {
    /** Membership row count — computed ONCE per (session, corpus)
      * registry entry (the frames are eagerly checkpointed, so this is
      * one tiny job on first use) and reused by every consumer that
      * needs a scale-adaptive partition width (repPartitions).
      */
    lazy val nGrp: Long = grp.count()
  }

  private val jacRelCache = new FrameRegistry[PairRelations](LpEdgeCacheMax)
  private val cosRelCache = new FrameRegistry[PairRelations](LpEdgeCacheMax)
  // one registry, two key families (cont_pairs|dir, contp_pairs|dir):
  // invalidate matches on the |dir suffix, so both drop together
  private val contRelCache = new FrameRegistry[PairRelations](LpEdgeCacheMax)
  // the phash pair family's registry (r21) — owned here so the one
  // staleness hook (invalidateLpEdges) covers every pair family;
  // built/consumed from Multimodal (mmPhashRelations)
  private[graft] val phashRelCache =
    new FrameRegistry[PairRelations](LpEdgeCacheMax)

  /** The incremental queries' PRIOR-phase assignments, shared per
    * (session, corpus) (r22, VERDICT item 4): the phase-1 LP — the
    * stored-prior stand-in — is a pure function of the corpus, so its
    * CONVERGED LABELS join the registry discipline the edge
    * structures already follow (r21 shared only the structure; the
    * 3 LP rounds, ~1.7 s at sf0.1, still re-ran per call). The first
    * caller pays the rounds (priced in the bench's build channel —
    * both incremental keys joined StoreBuildKeys with this change);
    * warm calls serve the checkpointed assignment. Invalidated with
    * every other derived frame.
    */
  private val priorLblCache = new FrameRegistry[DataFrame](LpEdgeCacheMax)

  private def lpEdgesFor(session: SparkSession, key: String)
                        (build: => LpEdges): LpEdges =
    lpEdgeCache.getOrBuild(session, key)(build)

  /** Drop every shared frame built over `dir` for `session` — edge
    * frames AND the pair families' collapse relations — the staleness
    * hook a caller MUST use after rewriting a corpus in place under
    * the same path (see the registry contract above). A no-op for
    * dirs with no entry (each registry's invalidation stamp still
    * advances, so an in-flight build over the old data cannot
    * register afterwards).
    */
  /** Registry-only invalidation: drops the DERIVED frames but keeps
    * the cached corpus scans warm. This is [[ddLpEdges]]' face — its
    * per-call rebuild re-reads the SAME immutable corpus, so evicting
    * the sig/cos_e caches there would recompute the minhash/RH
    * pipelines on every run for zero staleness benefit (r19 review).
    */
  private def invalidateDerived(session: SparkSession,
                                dir: String): Unit = {
    lpEdgeCache.invalidate(session, dir)
    jacRelCache.invalidate(session, dir)
    cosRelCache.invalidate(session, dir)
    contRelCache.invalidate(session, dir)
    phashRelCache.invalidate(session, dir)
    priorLblCache.invalidate(session, dir)
  }

  /** Fixed-name builder views whose EAGER checkpoints pin executor
    * blocks for as long as they stay registered (a rebind releases
    * the PREVIOUS generation through the ContextCleaner, but the
    * current one lives until session end). Dropped on invalidation so
    * a long-lived session that is done with a corpus sheds the last
    * block set too — the blocks are rebuild-on-demand state, never
    * the only copy of anything. NOTE the single-session contract
    * these names imply: the per-corpus builders (dc_/cinc_/inc_/...)
    * run serially within a session (the harness and every CLI do); a
    * concurrent-builder session must key its corpora to separate
    * SparkSessions. The store builders are path-qualified and exempt.
    */
  private val builderViews = Seq(
    "inc_sigs", "incb_sigs", "dd_sigs", "sh64_sims")

  def invalidateLpEdges(session: SparkSession, dir: String): Unit = {
    invalidateDerived(session, dir)
    // also release the builders' CACHED corpus scans (sig/cos_e
    // relations): the cache manager matches canonical plans, so a
    // rebuild after an in-place corpus rewrite would otherwise keep
    // serving the pre-rewrite blocks
    unpersistTracked(session, dir)
    // and the fixed-name builder views' checkpoint blocks (see
    // builderViews) — the names are corpus-agnostic, so this drop is
    // session-wide; the views rebuild on the next builder call
    builderViews.foreach(session.catalog.dropTempView)
  }

  /** Test/A-B hook: drop ALL shared frames (TimeOne's GRAFT_LP_COLD=1
    * uses this between reps to measure LP consumers cold; see
    * BENCHING.md).
    */
  private[graft] def clearLpEdgeCache(): Unit = {
    lpEdgeCache.clear()
    jacRelCache.clear()
    cosRelCache.clear()
    contRelCache.clear()
    phashRelCache.clear()
    priorLblCache.clear()
    unpersistAllTracked()
  }

  private[graft] def lpEdgeCacheKeys: Seq[String] = lpEdgeCache.keys

  /** `frontier = false` opts a call out of semi-naive rounds: full
    * passes scan the whole label set, which is only a cost when that
    * set is large relative to the changing frontier. The contracted
    * merge LP inverts that premise — its node set is |clusters| +
    * |new nodes| BY CONSTRUCTION — and there the frontier path
    * measured strictly worse at sf0.1 (dd_embed_cluster_incremental
    * merge: 6 rounds with a 2.8 s final compounded-frontier round —
    * the pass-2 tree references pass 1's three times and the frontier
    * filter rides every reference, so the round's DRIVER planning
    * cost balloons — vs 5 rounds, no tail, with full passes; the
    * frontier-restricted pointer-jump also skips shortcuts, hence the
    * extra round). The global GRAFT_LP_FRONTIER=0 escape still wins
    * over a `frontier = true` call for A/B runs.
    */
  private[graft] def labelPropagate(op: String,
                                    pairs: => DataFrame,
                                    nodes: DataFrame,
                                    shareKey: Option[String] = None,
                                    frontier: Boolean = true)
      : DataFrame = {
    val lpDebug = sys.env.contains("GRAFT_LP_DEBUG")
    // Semi-naive (frontier) rounds are the default; GRAFT_LP_FRONTIER=0
    // (or the system property, which wins — it's what lets
    // LpFrontierSpec flip paths in-process) restores full passes for
    // A/B measurement (LpFrontierSpec holds the two paths to identical
    // fixed points).
    val frontierOn = frontier && sys.props.get("graft.lp.frontier")
      .orElse(sys.env.get("GRAFT_LP_FRONTIER"))
      .getOrElse("1") != "0"
    def stamp(what: String, t0: Long): Unit = if (lpDebug)
      System.err.println(f"LP $what took ${(System.nanoTime() - t0) / 1e9}%.2f s")
    // The edge list is localCheckpoint'd (eager), not cached: every round
    // references it, and a checkpoint both materializes the (possibly
    // expensive) pair pipeline exactly once AND collapses its logical
    // plan — often a large banded-join tree — to a leaf, so per-round
    // Catalyst work doesn't re-traverse it.
    // The PAIR list is checkpointed BEFORE the symmetric closure: a
    // union of the pipeline with its own column swap embeds the banded
    // join tree twice, and exchange reuse only dedupes the subtrees
    // below the last shuffle — the top join + verify stages ran once
    // per branch (measured at sf0.1: the dd_cluster edge phase carried
    // ~50 of its 55 jobs). Checkpointing first runs the pipeline once;
    // the closure is then two narrow scans of the materialized RDD,
    // cheap enough to leave unmaterialized in the per-round plan.
    val session = nodes.sparkSession
    import session.implicits._
    // AQE is scoped OFF for the edge materialization AND the per-round
    // jobs (and restored after the loop, before the singleton rejoin,
    // where its runtime broadcast decision IS wanted). Inside the loop
    // AQE buys nothing — every round is the same fixed plan over
    // LogicalRDD leaves whose sizes AQE can't estimate better than the
    // planner — but it costs one Spark JOB PER QUERY STAGE: each
    // round's checkpoint ran as 5-6 stage-materialization jobs instead
    // of 1, and the LP consumers (dd_embed_cluster 140, dd_semdedup
    // 143 jobs/run) paid a per-job scheduling floor on every one of
    // them under host contention. The same arithmetic applies to the
    // edge checkpoint: the banded pair pipelines ran as 12-19
    // stage-materialization jobs under AQE for no plan benefit (their
    // join sides are derived frames the static planner shapes
    // identically — measured at sf0.1: edge-phase wall unchanged,
    // dd_semdedup 51 -> 20 jobs and dd_cluster 33 -> 13 once the edge
    // phase joined the AQE-off scope). What the edge phase gives up is
    // AQE's skew-join splitting during pair generation; the banded
    // pipelines are built so that loss is contained — candidate joins
    // are bucket-bounded by banding, containment probing is
    // rarest-first, and the nbrMin aggregate partially aggregates
    // map-side, so a hot key skews no single reducer.
    // NOTE: the conf flip is session-global for its duration — safe
    // for the sequential Verify/Bench harnesses; a concurrent query
    // on the same session would silently lose AQE until the finally.
    val aqeKey = "spark.sql.adaptive.enabled"
    val shufKey = "spark.sql.shuffle.partitions"
    val aqeWas = session.conf.getOption(aqeKey)
    val shufWas = session.conf.get(shufKey)
    def withLoopConf[T](body: => T): T = {
      session.conf.set(aqeKey, "false")
      try body finally {
        aqeWas match {
          case Some(v) => session.conf.set(aqeKey, v)
          case None    => session.conf.unset(aqeKey)
        }
        session.conf.set(shufKey, shufWas)
      }
    }
    var converged = false
    var iter = 0
    def prepEdges(): LpEdges =
      prepLpEdges(session, pairs, defaultP = shufWas.toInt)
    def runLoop(): DataFrame = {
      // Shared edge pipelines are prepared once per (session, key) and
      // reused by every consumer; the loop conf (shuffle partitions)
      // is re-applied on a registry hit because withLoopConf restores
      // it after every call.
      val LpEdges(edgesBoth, _, loopP) = shareKey match {
        case Some(k) => lpEdgesFor(session, k)(prepEdges())
        case None    => prepEdges()
      }
      session.conf.set(shufKey, loopP.toString)
      // Only nodes incident to >=1 edge can ever change label, so the
      // loop runs on the pair graph alone — at corpus scale that's a
      // tiny fraction of the table (near-dups are rare), so every
      // per-round shuffle carries O(edge nodes), not O(corpus).
      // Singletons rejoin once, after the fixed point.
      var labels = edgesBoth
        .select(col("src").as("doc_id"))
        .distinct()
        .select(col("doc_id"), col("doc_id").as("cluster_id"))
      // One propagate+shortcut pass over a (doc_id, prev, cluster_id)
      // frame: each node takes the min of its own label, its neighbors'
      // labels (one edge hop), and its label's label (pointer jumping —
      // label(v) is always a node of the same component, since labels
      // only ever point within the component and only ever decrease, so
      // the extra hop changes nothing about the fixed point but lets the
      // component minimum travel two label-links per pass). `prev` (the
      // round-start label, for the convergence tap) rides along
      // untouched.
      //
      // `frontier` (None = full pass) is SEMI-NAIVE evaluation: labels
      // are monotone non-increasing, so once u has incorporated
      // neighbor w's label, w contributes nothing new until w CHANGES —
      // only last pass's changed nodes (with their new labels) can
      // lower anyone this pass. Round 0 is a full pass (everyone
      // incorporates every neighbor's initial label); after that, each
      // change lands in the next pass's frontier, so at changed == 0
      // every node has seen every neighbor's final label — labels are
      // constant across every edge, i.e. exactly the component minimum.
      // The pointer-jump hop restricted to the frontier may skip a
      // shortcut a full pass would take (label(v)'s label changed
      // before v adopted label(v)); that only costs rounds, never the
      // fixed point — the edge part alone converges, the hop is an
      // accelerator. What the frontier buys at scale: the per-round
      // neighbor join probes O(edges incident to changed nodes) and the
      // nbr_min aggregate shuffles only those rows, so tail rounds
      // (changed counts 28 -> 7 -> 2 on the sf0.1 fixture, and the
      // same long tail on any chain-heavy corpus) stop paying the full
      // O(E) join+aggregate that dominated them.
      def mkFrontier(src: DataFrame): DataFrame = src
        .filter(col("prev") =!= col("cluster_id"))
        .select(col("doc_id").as("f_id"), col("cluster_id").as("f_lab"))
      def onePass(cur: DataFrame, frontier: Option[DataFrame]): DataFrame = {
        val contrib = frontier match {
          case Some(f) => edgesBoth
            .join(f, col("dst") === col("f_id"))
            .select(col("src"), col("f_lab").as("cluster_id"))
          case None => edgesBoth
            .join(cur, edgesBoth("dst") === cur("doc_id"))
            .select(col("src"), col("cluster_id"))
        }
        val nbrMin = contrib
          .groupBy(col("src"))
          .agg(min(col("cluster_id")).as("nbr_min"))
        val hop = frontier match {
          case Some(f) => f.select(col("f_id").as("h_id"),
            col("f_lab").as("hop2"))
          case None => cur.select(col("doc_id").as("h_id"),
            col("cluster_id").as("hop2"))
        }
        cur
          .join(nbrMin, cur("doc_id") === nbrMin("src"), "left")
          .join(hop, cur("cluster_id") === hop("h_id"), "left")
          .select(cur("doc_id"), cur("prev"),
            least(
              least(col("cluster_id"),
                coalesce(col("nbr_min"), col("cluster_id"))),
              coalesce(col("hop2"), col("cluster_id"))).as("cluster_id"))
      }
      var lastStep: DataFrame = null
      while (!converged && iter < 50) {
      // ONE pass for round 0, TWO composed passes per round after
      // (LpPassesPerRound): composing passes makes the effective reach
      // per round two edge hops with two label-squarings interleaved,
      // so label depth on chains more than halves per round — the
      // compounding argument of Kiveris et al.'s MapReduce CC family
      // (large-star/small-star), realized by pass composition instead
      // of edge rewriting (edge squaring can blow up |E| on hubs;
      // composing passes never grows the edge list). Measured at sf0.1
      // on the embed-LSH graph: 9 rounds -> 5, same fixed point.
      // The trade: pass B references pass A's unmaterialized tree
      // three times (nbrMin, hop, main), and only the exchanges below
      // survive ReuseExchange, so a compounded round costs roughly
      // double — right when the per-job scheduling floor dominates
      // (the contended regime this bench lives in, where halving the
      // barrier count wins outright), wrong for round 0, which does
      // the bulk of the propagation over the full label set and where
      // the bushy near-dup components (diameter 2-3) finish without
      // ever needing reach (shallow graphs: dd_cluster compounded
      // round 0 cost +5 CPU-s at sf0.1 and saved nothing). Hence
      // adaptive: round 0 single, chain-tail rounds compounded.
      // GRAFT_LP_PASSES=1 restores hop-per-round everywhere for
      // quiet-box wall runs; deeper than two grows the duplicated
      // subtree 3x per pass for one fewer barrier — measured slower
      // everywhere.
      val seeded = labels.select(col("doc_id"),
        col("cluster_id").as("prev"), col("cluster_id"))
      val passes = if (iter == 0) 1 else LpPassesPerRound
      // Round 0 and the GRAFT_LP_FRONTIER=0 escape hatch run full
      // passes; later rounds run semi-naive, seeding pass 1's frontier
      // from the previous round's checkpointed step (prev there is
      // that round's start label, so the filter is changed-during-
      // round — a superset of changed-in-last-pass, which is all
      // soundness needs) and pass 2's from pass 1's unmaterialized
      // output (changed-since-round-start = changed-in-pass-1).
      var stepPlan = seeded
      var frontier: Option[DataFrame] =
        if (iter == 0 || !frontierOn) None else Some(mkFrontier(lastStep))
      for (_ <- 1 to passes) {
        stepPlan = onePass(stepPlan, frontier)
        if (frontier.isDefined) frontier = Some(mkFrontier(stepPlan))
      }
      // localCheckpoint EVERY round (eager). This is lineage control, not
      // caching: step N's logical plan embeds TWO copies of step N-1's
      // (the nbrMin side and the join side), so without truncation the
      // analyzed tree — and driver-side planning cost — DOUBLES per round
      // (measured: the round-3 executed plan string was 111 MB and rounds
      // slowed 1.5 -> 3 -> 8 -> 17 s on constant-size data). Caching does
      // not help: InMemoryRelation substitution happens at planning, but
      // the analyzed tree is still walked in full each round. Checkpointing
      // collapses every round to a LogicalRDD leaf — the same reason
      // GraphFrames' connectedComponents checkpoints every few iterations.
      // Old round RDDs are reclaimed by the ContextCleaner once
      // unreferenced.
      //
      // Convergence piggybacks on the SAME job: a mapPartitions tap
      // counts changed labels into an accumulator while the checkpoint
      // materializes, so each round is one Spark job, not two (the
      // separate count() job roughly doubled wall time at sf0.1, where
      // the contended-box floor is ~1-2 s per job regardless of data).
      // Task retries can only over-count — rows that DID change counted
      // twice — never under-count, so `changed == 0` stays exact: a
      // benign extra round in the worst case, and only on retry.
      val acc = session.sparkContext.longAccumulator(s"$op-lp-changed-$iter")
      val tapped = stepPlan.as[(Long, Long, Long)]
        .mapPartitions { it =>
          it.map { r => if (r._2 != r._3) acc.add(1L); r }
        }
        .toDF("doc_id", "prev", "cluster_id")
      val tCk = System.nanoTime()
      val step = tapped.truncated()
      stamp(s"checkpoint $iter", tCk)
      val changed = acc.value
      if (lpDebug)
        System.err.println(s"LP round $iter changed=$changed")
      lastStep = step
      labels = step.drop("prev")
      converged = changed == 0
      iter += 1
      }
      labels
    }
    val labels = withLoopConf(runLoop())
    // silent truncation would hand a keep-one-per-cluster pipeline
    // partially-merged groups; a >50-hop min-label chain means the
    // corpus isn't the shallow near-dup graph this operator is for
    if (!converged) throw new IllegalStateException(
      s"$op: not converged after $iter rounds — component " +
        "diameter exceeds the cap")
    // Singletons (no edge) are their own cluster: one narrow left join of
    // the full node table against the converged labels. No broadcast hint:
    // the label set is data-dependent (ALL edge-incident nodes — on a
    // high-near-dup web corpus that can be a large fraction of the
    // table, past the 8 GB broadcast ceiling), so the join strategy is
    // left to the planner — AQE sees the actual checkpointed size at
    // runtime and picks broadcast exactly when it is safe.
    // Returned UNSORTED (callers that dump add their own orderBy): a sort
    // here would sit inside every composition's lineage, and the range
    // partitioner's sampling pass re-executes the input pipeline.
    nodes
      .select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .cache()
  }

  /** dd_cluster's edge set with the EXACT-DUPLICATE bomb defused. On a
    * web-scale corpus, k byte-identical copies of one page (mirrors,
    * boilerplate) share every minhash band key, so the banded
    * candidate join emits k²/2 pairs — all of which verify at
    * jaccard 1 and enter the edge set. That quadratic blowup is the
    * classic production failure of minhash-LSH, and no AQE skew split
    * fixes it (the pairs are real output, not reducer imbalance).
    * Components don't need the clique: collapse identical texts to
    * their min-doc_id REPRESENTATIVE (one map-side-combinable groupBy
    * on md5(text) — never a window, whose single-partition-per-key
    * shuffle carries the same bomb), band only the representatives,
    * and connect members by k-1 STAR edges. Exactness, not heuristic:
    * identical text ⟹ identical shingle set ⟹ jaccard 1 ≥ 0.6, so
    * every star edge is a true edge; and a member's sig/hs equal its
    * rep's, so any banded-verified edge the member would have carried
    * is carried by its rep — the component partition (hence the
    * min-label assignment) is bit-identical to the uncollapsed graph.
    * Empty-shingle docs are EXCLUDED from collapse groups (no star
    * edges): two identical too-short texts share md5 but their
    * jaccard is 0/0 = never ≥ 0.6, so they must stay singletons —
    * same reason [[jacBandGuard]] keeps them off the band side.
    */
  private[graft] def ddClusterEdges(s: SparkSession, dir: String): DataFrame = {
    // COMPOSED from the jaccard family's shared pair relations (r21):
    // the edge set is the rep-level VERIFIED pair table plus the k-1
    // star edges — and [[jacRepVerifyFrame]] already computes that
    // verified table with the identical banding (8x2), the identical
    // shingle-set collapse, the identical empty-shingle carve-out and
    // the identical jaccard >= 0.6 verify (the two SQL bodies were
    // byte-equal modulo view names). Before r21 this method carried
    // its own copy of that pipeline, so every dd_cluster call re-ran
    // the banded self-join + graft_isect verify the registry had
    // already materialized for dd_jaccard / dd_decontaminate /
    // dd_source_overlap (~9 CPU-s per call at sf0.1 — the dominant
    // stage of dd_cluster's profile, guide §2.4: two operations keyed
    // the same way share one materialization). Consuming
    // [[jacRelations]] makes the banded corpus pass happen ONCE per
    // (session, corpus) across the whole jaccard family; the
    // registry's staleness/LRU contract (invalidateLpEdges) already
    // covers this caller.
    val rel = jacRelations(s, dir)
    rel.repVer
      .select(col("rep_a").as("doc_a"), col("rep_b").as("doc_b"))
      .unionAll(rel.grp
        .where(col("doc_id") =!= col("rep"))
        .select(col("rep").as("doc_a"), col("doc_id").as("doc_b")))
  }

  private def ddCluster(s: SparkSession, dir: String): DataFrame =
    labelPropagate("dd_cluster",
      ddClusterEdges(s, dir),
      table(s, dir, "documents").select("doc_id"),
      // shared LP edge structure: the closure/repartition of the (now
      // registry-served) pair table is itself materialized once per
      // (session, corpus) — the dd_embed_cluster discipline
      shareKey = Some(s"dd_cluster_edges|$dir"))
      .orderBy(col("doc_id"))

  // -- dd_cluster_incremental: fold a NEW batch into EXISTING clusters --------
  // The 100 TB companion to dd_cluster: production clustering is not
  // re-run over the whole corpus per ingest — the previous run's
  // (doc_id, cluster_id) assignment is stored, and an increment only
  // pays for edges that TOUCH the new batch (bands(new) probed against
  // bands(all): O(|new| band keys) join work, never a rebuild of the
  // old corpus's edge set). Supernode contraction makes that exact,
  // not approximate: each existing cluster is a connected component of
  // the old-old edge graph, so contracting it to one node preserves
  // the full graph's components 1-1 (old-old edges never leave a
  // supernode by definition; every new-touching edge is added
  // explicitly), and because a cluster id is the MIN doc_id of its
  // members, min-label propagation over the contracted graph — old
  // cluster ids plus new doc ids — converges to the global component
  // minimum. The result is therefore BIT-IDENTICAL to batch
  // re-clustering of the full corpus, which is exactly what the
  // oracle states (the same all-pairs recursive-closure SQL as
  // dd_cluster); new edges can and do MERGE old clusters — the
  // contracted LP handles that case, an assign-only shortcut would
  // not. At fixture scale the "stored prior assignment" is computed
  // in-query by a first LP over the old-old edges (the measured query
  // honestly carries both phases); the contracted merge LP runs over
  // |clusters| + |new| nodes, the part that stays small at any corpus
  // size. Split convention shared with dd_incremental: sources srcNN
  // with NN >= 10 are the new batch.
  //
  // SCALE NOTE (exact-duplicate bombs): this path carries a PER-SIDE
  // representative collapse (the [[ddClusterEdges]] guard, split by
  // the batch boundary): old docs collapse among old, new among new,
  // each group keyed by its shingle set (md5 of the sorted hash
  // array), members connect to their side's min-doc_id representative
  // by k-1 star edges, and only representatives are banded — so a
  // bombed increment (k identical new docs) contributes k-1 edges
  // plus ONE rep-rep crossing edge per matching old group, never the
  // k²/2 clique. Collapsing ACROSS the split would be wrong in a
  // subtler way: a new-side representative standing in for old
  // members would carry old-old connectivity, changing which merges
  // the phase-1 "stored prior" sees (final components stay identical,
  // but the prior-assignment stand-in would diverge from a real
  // stored run). Exactness per side is [[ddClusterEdges]]' argument
  // verbatim — identical hs ⟹ jaccard 1 star edges are true edges,
  // and a member's banding equals its rep's, so every banded edge a
  // member would carry (including crossing edges to the OTHER side's
  // reps) is carried by its rep; the component partition, hence the
  // phase split and the min-label assignment, is bit-identical to the
  // uncollapsed graph's.
  private def ddClusterIncremental(s: SparkSession, dir: String): DataFrame = {
    val pairsAll = ddClusterIncrementalEdges(s, dir)
    val docs = incrementalDocFlags(s, dir)
    // phase 1 — the stored prior assignment (stand-in): LP over the
    // old corpus's own edges. Corpus-deterministic end to end, so the
    // CONVERGED ASSIGNMENT is registry-shared per (session, corpus)
    // (r22 — r21 shared only the closure structure and still re-ran
    // the rounds per call); the merge phase's contracted edges depend
    // on this phase's output and stay per-call.
    val lblA = priorLblCache.getOrBuild(s, s"cinc_prior_lbl|$dir") {
      labelPropagate("dd_cluster_incremental#prior",
        pairsAll.filter("NOT a_new AND NOT b_new")
          .select("doc_a", "doc_b"),
        docs.filter("NOT is_new").select("doc_id"),
        shareKey = Some(s"cinc_prior_edges|$dir"))
        .truncated()
    }
    // phase 2 — the increment: only edges touching the new batch
    contractedMerge("dd_cluster_incremental#merge", lblA,
      pairsAll.filter("a_new OR b_new").select("doc_a", "doc_b"),
      docs.filter("is_new").select("doc_id"))
      .orderBy(col("doc_id"))
  }

  /** The split flag shared by the incremental cluster query's phases
    * (srcNN with NN >= 10 is the new batch — the family's split
    * convention).
    */
  private def incrementalDocFlags(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents")
      .selectExpr("doc_id",
        "cast(substring(source, 4) as int) >= 10 AS is_new")

  /** dd_cluster_incremental's side-tagged edge set (doc_a, doc_b,
    * a_new, b_new), duplicate-bomb-guarded per side — exposed so
    * DupBombGuardSpec can pin the linearity on a bombed increment.
    *
    * COMPOSED from the jaccard family's shared pair relations (r21).
    * Before, this method re-ran the full banded pipeline with an
    * is_new tag riding along (~15 CPU-s per call at sf0.1 — the
    * dominant stage of the query's profile). But the side-tagged edge
    * set is exactly derivable from the GLOBAL collapse relations,
    * because both banding and the jaccard verify are functions of the
    * shingle set, i.e. constant on each hs-equality class:
    *
    *   - per-side collapse groups = the global classes split by
    *     is_new, each with its side-min doc_id as side rep (the same
    *     empty-shingle carve-out — docs outside the global membership
    *     get no stars and never band);
    *   - a pair of side reps is a banded CANDIDATE iff their classes
    *     share a band key iff the global reps do (identical sigs);
    *     it VERIFIES iff the class-level jaccard >= 0.6 iff the
    *     global rep pair is in repVer (cross-class), or the classes
    *     are equal (jaccard 1 — the one same-class crossing edge
    *     between the two sides' reps);
    *   - star edges are the per-side member fan-in, as before.
    *
    * Row-for-row the r16 inline pipeline's output (DupBombGuardSpec
    * re-pins the bombed-increment linearity on this form), at the
    * cost of a few joins over the registry's checkpointed frames plus
    * one narrow documents scan for the flags — the banded corpus
    * pass is shared with the rest of the jaccard family instead of
    * rebuilt per call (guide §2.4).
    */
  private[graft] def ddClusterIncrementalEdges(s: SparkSession,
                                               dir: String): DataFrame = {
    val rel = jacRelations(s, dir)
    val flags = incrementalDocFlags(s, dir)
    // Scale-adaptive derivation width (r22; was a session-global
    // spark.sql.shuffle.partitions=4 pin — right at sf0.1 where these
    // are sub-5k-row joins drowning in 32-task-wave floors, wrong at
    // 100 TB where grp × documents is corpus-proportional, and a
    // non-atomic conf mutation besides). Explicit repartitions at a
    // count-derived width k seed every downstream exchange: with AQE
    // off, joins and aggregates keyed on (a subset of) an existing
    // hash partitioning reuse it, and exchanges inserted to co-locate
    // the other side match its partition count — so the whole
    // derivation runs at k, no conf touched, and k grows with the
    // corpus (repPartitions: ~256k rows/partition, capped at the
    // session's shuffle parallelism).
    val k = repPartitions(s, rel.nGrp)
    // (doc_id, is_new, rep=global class rep, side_rep)
    val grpFlags = rel.grp.repartition(k, col("doc_id"))
      .join(flags.repartition(k, col("doc_id")), "doc_id")
      .repartition(k, col("rep"))
    val sideGrp = grpFlags
      .groupBy(col("rep"), col("is_new"))
      .agg(min(col("doc_id")).as("side_rep"))
    val mem = grpFlags.join(sideGrp, Seq("rep", "is_new"))
    val stars = mem
      .where(col("doc_id") =!= col("side_rep"))
      .select(col("side_rep").as("doc_a"), col("doc_id").as("doc_b"),
        col("is_new").as("a_new"), col("is_new").as("b_new"))
    // the same-class crossing edge: classes present on both sides
    // contribute exactly one rep-rep edge (jaccard 1 by identity)
    val sameClass = sideGrp
      .select(col("rep"), col("side_rep").as("sa"), col("is_new").as("na"))
      .join(sideGrp
        .select(col("rep"), col("side_rep").as("sb"),
          col("is_new").as("nb")), "rep")
      .where(col("sa") < col("sb"))
      .select(col("sa").as("doc_a"), col("sb").as("doc_b"),
        col("na").as("a_new"), col("nb").as("b_new"))
    // cross-class verified rep pairs expand to every side-rep pair
    // (<= 2x2 per class pair), each carrying the class-level verify
    val crossClass = rel.repVer
      .join(sideGrp.select(col("rep").as("rep_a"),
        col("side_rep").as("xa"), col("is_new").as("xna")), "rep_a")
      .join(sideGrp.select(col("rep").as("rep_b"),
        col("side_rep").as("xb"), col("is_new").as("xnb")), "rep_b")
      .selectExpr("least(xa, xb) AS doc_a", "greatest(xa, xb) AS doc_b",
        "CASE WHEN xa < xb THEN xna ELSE xnb END AS a_new",
        "CASE WHEN xa < xb THEN xnb ELSE xna END AS b_new")
    // one eager checkpoint, AQE scoped off (the prepLpEdges
    // discipline — AQE-on materialization was measured here in r22 at
    // +7 stage-materialization jobs and +1.5 s wall for flat CPU):
    // both phases filter this frame, and the checkpoint keeps their
    // plans rooted at a leaf instead of re-running the derivation
    // joins per phase. The derivation's width comes from the explicit
    // k repartitions above, not from a conf pin.
    withAqeOff(s) {
      crossClass.unionAll(sameClass).unionAll(stars).truncated()
    }
  }

  /** The contracted-merge phase shared by the incremental cluster
    * operators (dd_cluster_incremental, dd_embed_cluster_incremental):
    * rewrite each increment edge endpoint to its prior cluster id
    * (identity for new nodes), drop self-loops, run min-label
    * propagation over prior cluster ids + new node ids, and expand —
    * old nodes route through their supernode's merged label, new
    * nodes carry their own. See dd_cluster_incremental's component
    * argument for why this is bit-identical to batch re-clustering.
    * `lblA` is the prior (doc_id, cluster_id) assignment; `newNodes`
    * is one `doc_id` column of the increment's nodes.
    */
  private def contractedMerge(op: String, lblA: DataFrame,
                              newEdges: DataFrame,
                              newNodes: DataFrame): DataFrame = {
    val contracted = newEdges
      .join(lblA.toDF("doc_a", "ca"), Seq("doc_a"), "left")
      .join(lblA.toDF("doc_b", "cb"), Seq("doc_b"), "left")
      .selectExpr("coalesce(ca, doc_a) AS pa", "coalesce(cb, doc_b) AS pb")
      .where("pa <> pb")
      .selectExpr("least(pa, pb) AS doc_a", "greatest(pa, pb) AS doc_b")
      .distinct()
    val contractedNodes = lblA
      .select(col("cluster_id").as("doc_id")).distinct()
      .union(newNodes)
    // full passes, not semi-naive: see the frontier param's rationale
    val lblC = labelPropagate(op, contracted, contractedNodes,
      frontier = false)
    lblA.toDF("doc_id", "ca")
      .join(lblC.toDF("ca", "cluster_id"), Seq("ca"))
      .select("doc_id", "cluster_id")
      .union(newNodes.join(lblC, Seq("doc_id"))
        .select("doc_id", "cluster_id"))
  }

  /** The all-pairs recursive-closure clustering oracle, over the docs
    * selected by `docsWhere` ("" = whole corpus) — shared by dd_cluster,
    * both incremental variants (contraction is bit-identical to batch
    * re-clustering), and the store build's old-half gate.
    */
  private def ddClusterSqlFor(docsWhere: String): String = {
    val allPairsEdges =
      s"""SELECT a.doc_id AS src, b.doc_id AS dst
         |  FROM docs a JOIN docs b ON a.doc_id <> b.doc_id
         |  WHERE least(len(a.hs), len(b.hs)) * 10
         |        >= greatest(len(a.hs), len(b.hs)) * 6
         |    AND round(CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)
         |      / (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))), 6)
         |      >= 0.6""".stripMargin
    s"""WITH RECURSIVE docs AS (
       |  SELECT doc_id,
       |    list_sort(list_distinct(list_transform(grams,
       |      g -> ${duckH64("g")}))) AS hs
       |  FROM (
       |    SELECT doc_id, $duckGrams AS grams FROM (
       |      SELECT doc_id, string_split(text, ' ') AS toks
       |      FROM documents$docsWhere))),
       |edges AS ($allPairsEdges),
       |r(doc, node) AS (
       |  SELECT doc_id, doc_id FROM docs
       |  UNION
       |  SELECT r.doc, e.dst FROM r JOIN edges e ON e.src = r.node)
       |SELECT doc AS doc_id, MIN(node) AS cluster_id
       |FROM r GROUP BY doc
       |ORDER BY doc_id""".stripMargin
  }

  private val ddClusterSql = ddClusterSqlFor("")

  // ---- persistent cluster store + incremental fold --------------------------
  // dd_cluster_incremental's scale argument reads "at corpus scale the
  // prior LP is the stored assignment"; this section makes that real.
  // A store holds everything an increment needs and NOTHING else:
  //   assignment/  (doc_id, cluster_id)   the converged prior labels
  //   sigs/        (doc_id, hs)           sorted 60-bit shingle hashes
  //                                       (the exact-verify side)
  //   bands/       (doc_id, band, bk)     the 8x2 MinHash band keys
  //                                       (the probe index)
  //   manifest.json                       written temp+ATOMIC_MOVE LAST —
  //                                       the store's exists() marker, the
  //                                       same crash discipline as
  //                                       IvfPqStore/ShardManifest
  // A fold probes bands(new) against the stored index, verifies only
  // the candidates against stored+new sigs, and contract-merges into
  // the stored assignment — it NEVER re-reads old documents' text.
  // That claim is behavioral, not aspirational: ClusterStoreSpec
  // overwrites every old doc's text with garbage after the build and
  // the fold still bit-matches full re-clustering of the original
  // corpus. At 100 TB the store is signature-sized (dozens of longs
  // per doc vs the doc itself), the probe join is an equi-join on
  // (band, bk) a deployment co-locates by writing bands/ bucketed on
  // that key, and the contracted LP runs over |clusters| + |new|.
  //
  // REP-COLLAPSED LAYOUT (r17): the store keeps sig/band rows for the
  // min-doc_id REPRESENTATIVE of each identical-shingle-set group
  // only, plus a `grp/` (doc_id, rep) membership relation — the
  // [[ddClusterEdges]] duplicate-bomb guard carried into the store
  // layout itself. k byte-identical stored copies of a page cost ONE
  // banded row set instead of k (a probing near-dup of the group
  // verifies once against the rep, never k times), the build's own
  // banded self-join runs over reps + k-1 star edges, and pair-level
  // consumers (the streaming probes) recover member pairs by ONE
  // equi-join through grp/ AFTER the verify — the fan-out is true
  // output, linear in real matches, which no layout can shrink.
  // Exactness is ddClusterEdges' argument: a member's hs equals its
  // rep's, so jaccard(probe, member) = jaccard(probe, rep) and every
  // member pair the uncollapsed layout would emit is recovered by the
  // grp expansion; components are preserved because stars are true
  // edges and the stored assignment already links members to reps.
  // Generations built before this layout carry no grp/ — every reader
  // treats a missing grp/ as the identity mapping (bands are then
  // member-level and the store serves exactly as before).
  private[graft] object ClusterStore {
    def exists(dir: String): Boolean = StoreFiles.exists(dir)

    def writeManifest(dir: String, nDocs: Long): Unit =
      StoreFiles.writeManifest(dir,
        s"""{"docs": $nDocs, "bands": $JacBands, "rows_per_band": 2,
           | "threshold": 0.6}""".stripMargin)
  }

  /** The old-half split shared by store build and fold (the same
    * convention as dd_incremental / dd_cluster_incremental, negated).
    * Exposed to the streaming replay gates (st_store_neardup_replay
    * feeds exactly the non-matching half).
    */
  private[graft] val oldPred = "cast(substring(source, 4) as int) < 10"

  /** Build the store from the corpus docs matching `pred` (the driver
    * key uses [[oldPred]]): one per-group collapse, one banded
    * self-join over REPRESENTATIVES + exact verify (the dd_jaccard
    * arithmetic, term-for-term) + star edges, one LP to convergence,
    * four parquet landings (assignment over all docs; sigs/bands over
    * reps only; grp membership), manifest last. See the section
    * comment for the rep-collapsed layout's exactness argument —
    * built this way, a duplicate-bombed corpus costs the build O(k)
    * edges and every later probe ONE collision per group instead
    * of k.
    */
  private[graft] def clusterStoreBuild(s: SparkSession, dir: String,
                                       store: String,
                                       pred: String = oldPred): Unit = {
    VectorFunctions.ensureRegistered(s)
    // view names are qualified by the STORE path: two builds over the
    // SAME corpus but different stores (the serving store and the
    // eval-slice store lock DIFFERENT dirs) may run concurrently in
    // one session, and fixed names would let one build's rebind leak
    // into the other's analysis — a store silently mixing the two
    // predicates' rows
    val cstSigs = "cst" + StoreFiles.md5Hex(store, 8) + "_sigs"
    val cstGrp = "cst" + StoreFiles.md5Hex(store, 8) + "_grp"
    val cstRep = "cst" + StoreFiles.md5Hex(store, 8) + "_repsigs"
    val sigs = table(s, dir, "documents")
      .where(pred)
      .selectExpr("doc_id", "split(text, ' ') AS toks")
      .selectExpr("doc_id", s"$sparkGrams AS grams")
      .selectExpr("doc_id",
        "graft_h32a(grams) AS ghs", "graft_h64sd(grams) AS hs")
      .selectExpr("doc_id", "hs", "graft_minhash16(ghs) AS sigarr")
      .selectExpr(Seq("doc_id", "hs") ++ sparkSigCols: _*)
      .cache()
    sigs.createOrReplaceTempView(cstSigs)
    // collapse groups (the ddClusterEdges discipline: shingle-set key,
    // empty-shingle carve-out, eager checkpoint — see dc_grp)
    shingleGrpFrame(s, cstSigs).createOrReplaceTempView(cstGrp)
    s.sql(
      s"""SELECT s.* FROM $cstSigs s
         |JOIN (SELECT DISTINCT rep FROM $cstGrp) r ON s.doc_id = r.rep"""
        .stripMargin)
      .truncated().createOrReplaceTempView(cstRep)
    val bandSelects = (0 until JacBands)
      .map(b => s"SELECT doc_id, $b AS band, ${jacBandKeySpark(b)} AS bk" +
        s" FROM $cstRep$jacBandGuard")
      .mkString(" UNION ALL ")
    val pairs = s.sql(
      s"""WITH bands AS ($bandSelects),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.bk = y.bk AND x.doc_id < y.doc_id)
         |SELECT doc_a, doc_b FROM (
         |  SELECT doc_a, doc_b,
         |    round(cast(graft_isect(a.hs, b.hs) as double)
         |      / (size(a.hs) + size(b.hs) - graft_isect(a.hs, b.hs)), 6)
         |      AS jaccard
         |  FROM cand JOIN $cstSigs a ON a.doc_id = doc_a
         |            JOIN $cstSigs b ON b.doc_id = doc_b
         |  WHERE least(size(a.hs), size(b.hs)) * 10
         |        >= greatest(size(a.hs), size(b.hs)) * 6)
         |WHERE jaccard >= 0.6
         |UNION ALL
         |SELECT rep AS doc_a, doc_id AS doc_b FROM $cstGrp
         |WHERE doc_id <> rep""".stripMargin)
    val lbl = labelPropagate("dd_cluster_store", pairs,
      sigs.select("doc_id"))
    new java.io.File(store).mkdirs()
    // bucketed layout (StoreFiles.writeBucketed): each relation lands
    // clustered on its probe key, so single-generation reads report
    // the partitioning and the serve joins skip the store-side
    // exchange (PlanSpec pins the shape)
    StoreFiles.writeBucketed(lbl, s"$store/assignment", Seq("doc_id"))
    StoreFiles.writeBucketed(
      s.sql(s"SELECT doc_id, hs FROM $cstRep"),
      s"$store/sigs", Seq("doc_id"))
    StoreFiles.writeBucketed(
      s.sql(s"SELECT doc_id, band, bk FROM ($bandSelects)"),
      s"$store/bands", Seq("band", "bk"), Seq("doc_id"))
    StoreFiles.writeBucketed(
      s.sql(s"SELECT doc_id, rep FROM $cstGrp"),
      s"$store/grp", Seq("rep"), Seq("doc_id"))
    val n = sigs.count()
    sigs.unpersist()
    lbl.unpersist()
    ClusterStore.writeManifest(store, n)
  }

  /** Streaming-side (doc_id, ts, hs, band, bk) expansion against the
    * persistent cluster store's banding — the text twin of the embed
    * serve path's `graft_rh_buckets` probe. Lives here, next to
    * [[clusterStoreBuild]], so the stream probe and the store's
    * `bands/` index can never band differently: same word-bigram
    * shingles, same 16-perm MinHash, same 8x2 [[jacBandKeySpark]]
    * keys, same empty-shingle guard (an empty-sig doc would hit the
    * store's guarded band index zero times anyway; dropping it before
    * the explode also keeps the bucket-bomb argument — see
    * [[jacBandGuard]] — true for the STREAM side of the join).
    * Input columns: doc_id, ts (epoch-nanos bigint), text.
    */
  private[graft] def jacStoreProbeRows(docs: DataFrame): DataFrame = {
    VectorFunctions.ensureRegistered(docs.sparkSession)
    val bandCols = (0 until JacBands).map(b =>
      s"struct($b AS band, ${jacBandKeySpark(b)} AS bk)")
    docs
      .selectExpr("doc_id", "ts", "split(text, ' ') AS toks")
      .selectExpr("doc_id", "ts", s"$sparkGrams AS grams")
      .selectExpr("doc_id", "ts",
        "graft_h32a(grams) AS ghs", "graft_h64sd(grams) AS hs")
      .selectExpr("doc_id", "ts", "hs", "graft_minhash16(ghs) AS sigarr")
      .selectExpr(Seq("doc_id", "ts", "hs") ++ sparkSigCols: _*)
      .where(s"sig_0 <> ${Long.MaxValue}L")
      .selectExpr("doc_id", "ts", "hs",
        s"explode(array(${bandCols.mkString(", ")})) AS bb")
      .selectExpr("doc_id", "ts", "hs", "bb.band AS band", "bb.bk AS bk")
  }

  /** The exact Jaccard verify between two hs columns `$a`/`$b` as one
    * WHERE-clause string — the same prefilter + rounded-threshold
    * arithmetic the batch probes state term-for-term (those embed it
    * as a named `jaccard` column inside their pair projections; the
    * streaming serve path, which filters in place, uses this form).
    */
  private[graft] def jacVerifySpark(a: String, b: String): String =
    s"least(size($a), size($b)) * 10 >= greatest(size($a), size($b)) * 6" +
      s" AND round(cast(graft_isect($a, $b) as double)" +
      s" / (size($a) + size($b) - graft_isect($a, $b)), 6) >= 0.6"

  /** DuckDB restatement for st_store_neardup_replay: the INDEPENDENT
    * all-pairs old-new spec (no banding — the hash-compare therefore
    * verifies the stream's banded recall against the exact spec, the
    * same role [[ddJaccardSql]] plays for the batch family). An
    * empty-shingle doc matches nothing in both dialects (Jaccard
    * 0/len = 0 or 0/0 = NULL, never >= 0.6 — ShortDocGuardSpec).
    */
  private[graft] val duckStoreNearDupSql =
    s"""WITH docs AS (
       |  SELECT doc_id, CAST(substr(source, 4) AS INT) < 10 AS is_old,
       |    list_sort(list_distinct(list_transform(grams,
       |      g -> ${duckH64("g")}))) AS hs
       |  FROM (
       |    SELECT doc_id, source, $duckGrams AS grams FROM (
       |      SELECT doc_id, source, string_split(text, ' ') AS toks
       |      FROM documents)))
       |SELECT n.doc_id AS doc_id, o.doc_id AS owner_id
       |FROM docs n JOIN docs o ON NOT n.is_old AND o.is_old
       |WHERE least(len(n.hs), len(o.hs)) * 10
       |      >= greatest(len(n.hs), len(o.hs)) * 6
       |  AND round(CAST(len(list_intersect(n.hs, o.hs)) AS DOUBLE)
       |    / (len(n.hs) + len(o.hs) - len(list_intersect(n.hs, o.hs))), 6)
       |    >= 0.6
       |ORDER BY 1, 2""".stripMargin

  /** Fold the corpus docs NOT matching [[oldPred]] into the stored
    * clustering. Reads the store (assignment + sigs + bands) and the
    * NEW docs' text only; returns the full-corpus assignment,
    * bit-identical to batch re-clustering (contractedMerge's
    * argument).
    */
  private[graft] def clusterStoreFold(s: SparkSession, dir: String,
                                      store: String,
                                      newPred: String = s"NOT ($oldPred)")
      : DataFrame =
    clusterStoreIncrement(s, dir, store, newPred)._2
      .orderBy(col("doc_id"))

  /** The increment computation shared by the serve-only fold and the
    * generation-writing [[clusterStoreFoldInto]]: returns the new
    * batch's checkpointed sig relation and the merged (store + new)
    * assignment, UNSORTED.
    */
  private def clusterStoreIncrement(s: SparkSession, dir: String,
                                    store: String, newPred: String)
      : (DataFrame, DataFrame) = {
    val (newSigs, edgesLazy) = clusterStoreEdgeFrame(s, dir, store, newPred)
    // The verified edge list is checkpointed EAGERLY before
    // contractedMerge sees it: handed on as lineage, the jaccard
    // threshold over the expensive graft_isect projection gets pushed
    // into the contracted-pipeline's join conditions and re-evaluated
    // per probed pair (the known trap the repo mitigates everywhere by
    // persisting the compact pair projection first). The checkpoint
    // runs with AQE ON (r21): under the old scoped AQE-off the static
    // planner could not see that the store relations and the
    // checkpointed new-batch frame are broadcast-sized, so the verify
    // join-backs ran as sort-merge joins — AQE picks broadcast at
    // runtime and the warm fold's CPU roughly halves (measured on the
    // embed twin: 19.4 -> 7.6 CPU-s/rep at sf0.1, wall 4.7 -> ~4.0,
    // +3 stage-materialization jobs). At corpus scale the broadcast
    // decision reverts to sort-merge automatically — that is AQE's
    // call to make, which is the point.
    val edges = edgesLazy.truncated()
    val lblA = storeAssignment(s, store, "doc_id")
    (newSigs,
      contractedMerge("dd_cluster_fold_stored#merge", lblA, edges,
        newSigs.select("doc_id")))
  }

  /** The fold's new-batch sig relation (eagerly checkpointed) and its
    * verified-edge frame, LAZY — split out so PlanSpec can pin the
    * probe join's physical shape (equi-join on (band, bk), no
    * nested-loop fallback) without running the fold. The caller owns
    * checkpointing the edge frame; [[clusterStoreIncrement]] is the
    * only production caller.
    */
  /** Store-path-qualified fold-builder view name — ONE derivation for
    * the creator (clusterStoreEdgeFrame / embedStoreEdgeFrame) and the
    * consumer (the FoldInto writers), so concurrent folds probing
    * DIFFERENT stores in one session cannot rebind each other's views
    * (folds from the SAME store are serialized by the generation-name
    * claim, so a per-store name suffices).
    */
  private[graft] def foldView(kind: String, store: String,
                       suffix: String): String =
    kind + StoreFiles.md5Hex(store, 8) + suffix

  private[graft] def clusterStoreEdgeFrame(s: SparkSession, dir: String,
                                           store: String, newPred: String)
      : (DataFrame, DataFrame) = {
    val cfoSigs = foldView("cfo", store, "_sigs")
    val cfoGrp = foldView("cfo", store, "_grp")
    val cfoRep = foldView("cfo", store, "_repsigs")
    val cfoOldBands = foldView("cfo", store, "_oldbands")
    val cfoOldSigs = foldView("cfo", store, "_oldsigs")
    VectorFunctions.ensureRegistered(s)
    // localCheckpoint (EAGER), not cache: the relation feeds 8 band
    // sides, both verify join-backs, and the node list — ~10
    // references inside ONE edge-materialization job. A lazy cache
    // populates mid-job, so the concurrently racing scans each
    // recompute the md5/minhash chains (measured: the fold's edge
    // checkpoint carried 15.4 CPU-s, ~10x the sig pipeline's cost);
    // an eager checkpoint runs the chains exactly once.
    val newSigs = table(s, dir, "documents")
      .where(newPred)
      .selectExpr("doc_id", "split(text, ' ') AS toks")
      .selectExpr("doc_id", s"$sparkGrams AS grams")
      .selectExpr("doc_id",
        "graft_h32a(grams) AS ghs", "graft_h64sd(grams) AS hs")
      .selectExpr("doc_id", "hs", "graft_minhash16(ghs) AS sigarr")
      .selectExpr(Seq("doc_id", "hs") ++ sparkSigCols: _*)
      .truncated()
    newSigs.createOrReplaceTempView(cfoSigs)
    // NEW-side collapse (the store layout's rep discipline applied to
    // the increment): a duplicate-bombed ingest batch probes and
    // verifies once per GROUP, and members ride k-1 star edges. Old
    // side needs no stars — the stored assignment already links old
    // members to their reps (a group is jaccard-1-connected, so it is
    // one stored component by construction).
    shingleGrpFrame(s, cfoSigs).createOrReplaceTempView(cfoGrp)
    s.sql(
      s"""SELECT s.* FROM $cfoSigs s
         |JOIN (SELECT DISTINCT rep FROM $cfoGrp) r ON s.doc_id = r.rep"""
        .stripMargin)
      .truncated().createOrReplaceTempView(cfoRep)
    StoreFiles.readRelChain(s, store, "bands")
      .createOrReplaceTempView(cfoOldBands)
    StoreFiles.readRelChain(s, store, "sigs")
      .createOrReplaceTempView(cfoOldSigs)
    val newBandSelects = (0 until JacBands)
      .map(b => s"SELECT doc_id, $b AS band, ${jacBandKeySpark(b)} AS bk" +
        s" FROM $cfoRep$jacBandGuard")
      .mkString(" UNION ALL ")
    // Increment candidates: bands(new reps) probe the STORED index
    // (old-new) plus a banded self-join of the new reps alone
    // (new-new); old-old pairs never regenerate — the assignment
    // already summarizes them. The verify join is SIDE-SPLIT (r22,
    // guide §2.4/§6): the two candidate branches are disjoint by
    // construction (an id is never both stored and new, so an old-new
    // pair can't also be a new-new pair), which makes the old
    // cross-branch UNION equal to a per-branch DISTINCT — and with
    // the branches separate, each verify endpoint has ONE home: old
    // endpoints join the stored sigs relation directly (bucketed by
    // doc_id, so the store side of that join is exchange-free at any
    // scale) and new endpoints join the checkpointed increment. The
    // old UNION ALL of stored + new sigs destroyed the store's
    // bucketing and re-shuffled corpus-scale signature arrays by
    // doc_id on every fold; now only the candidate pair list (two
    // BIGINTs per row) moves. least/greatest normalizes the old-new
    // branch because old/new ids interleave (the split is by source,
    // not id); jaccard is symmetric, so verifying in (old, new)
    // orientation is the same arithmetic term-for-term. The new
    // batch's star edges ride along in the same frame.
    val edges = s.sql(
      s"""WITH newbands AS ($newBandSelects),
         |cand_on AS (
         |  SELECT DISTINCT o.doc_id AS doc_o, n.doc_id AS doc_n
         |  FROM $cfoOldBands o JOIN newbands n
         |    ON o.band = n.band AND o.bk = n.bk),
         |cand_nn AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM newbands x JOIN newbands y
         |    ON x.band = y.band AND x.bk = y.bk AND x.doc_id < y.doc_id),
         |v_on AS (
         |  SELECT least(doc_o, doc_n) AS doc_a,
         |         greatest(doc_o, doc_n) AS doc_b FROM (
         |    SELECT doc_o, doc_n,
         |      round(cast(graft_isect(o.hs, n.hs) as double)
         |        / (size(o.hs) + size(n.hs) - graft_isect(o.hs, n.hs)), 6)
         |        AS jaccard
         |    FROM cand_on JOIN $cfoOldSigs o ON o.doc_id = doc_o
         |                 JOIN $cfoSigs n ON n.doc_id = doc_n
         |    WHERE least(size(o.hs), size(n.hs)) * 10
         |          >= greatest(size(o.hs), size(n.hs)) * 6)
         |  WHERE jaccard >= 0.6),
         |v_nn AS (
         |  SELECT doc_a, doc_b FROM (
         |    SELECT doc_a, doc_b,
         |      round(cast(graft_isect(a.hs, b.hs) as double)
         |        / (size(a.hs) + size(b.hs) - graft_isect(a.hs, b.hs)), 6)
         |        AS jaccard
         |    FROM cand_nn JOIN $cfoSigs a ON a.doc_id = doc_a
         |                 JOIN $cfoSigs b ON b.doc_id = doc_b
         |    WHERE least(size(a.hs), size(b.hs)) * 10
         |          >= greatest(size(a.hs), size(b.hs)) * 6)
         |  WHERE jaccard >= 0.6)
         |SELECT doc_a, doc_b FROM v_on
         |UNION ALL
         |SELECT doc_a, doc_b FROM v_nn
         |UNION ALL
         |SELECT rep AS doc_a, doc_id AS doc_b FROM $cfoGrp
         |WHERE doc_id <> rep""".stripMargin)
    (newSigs, edges)
  }

  /** Write the NEXT-GENERATION store at `out`: assignment = the merged
    * fold, sigs/bands = the prior store's parquet UNION the
    * increment's (computed this generation). Stores are IMMUTABLE —
    * the caller manages generation paths like any object-store
    * dataset version, so there is no in-place flip to get wrong and a
    * reader of the prior generation is never disturbed. Old text is
    * never re-read at any generation; ClusterStoreSpec's
    * three-generation chain destroys each batch's text as soon as its
    * generation lands and the final assignment still bit-matches
    * batch re-clustering of the original corpus.
    */
  private[graft] def clusterStoreFoldInto(s: SparkSession, dir: String,
                                          store: String, newPred: String,
                                          out: String,
                                          delta: Boolean = false): Unit = {
    if (delta)
      require(StoreFiles.normParent(out) == StoreFiles.normParent(store),
        "a delta generation links its parent by bare sibling name — " +
          s"$out and $store must share a root")
    val (newSigs, merged) = clusterStoreIncrement(s, dir, store, newPred)
    new java.io.File(out).mkdirs()
    // DELTA assignment = the rows the merge CHANGED: new docs plus
    // old docs relabeled through new-batch bridges (set-difference
    // against the parent chain's served assignment — exact because
    // assignment rows are (id, label) pairs, one per id). Readers
    // recover the full relation with last-writer-wins per id
    // ([[storeAssignment]]); a non-delta fold writes the full merge,
    // sealing any chain it folds from.
    val mergedKept = merged.truncated()
    val landedAssign =
      if (delta) mergedKept.except(storeAssignment(s, store, "doc_id"))
      else mergedKept
    StoreFiles.writeBucketed(landedAssign, s"$out/assignment",
      Seq("doc_id"))
    // the increment lands rep-collapsed (the edge frame registered
    // cfo_grp/cfo_repsigs): sigs/bands gain the NEW batch's reps only,
    // grp gains its membership. A new group identical to a stored one
    // keeps its own rep — both reps stay banded, so later probes fan
    // out to both member sets (bounded by generation count, and
    // `StoreCtl compact` re-seals a long chain).
    def withPrior(rel: String,
                  inc: DataFrame): DataFrame =
      if (delta) inc else StoreFiles.readRelChain(s, store, rel).union(inc)
    StoreFiles.writeBucketed(
      withPrior("sigs", s.sql(s"SELECT doc_id, hs FROM ${foldView("cfo", store, "_repsigs")}")),
      s"$out/sigs", Seq("doc_id"))
    val bandSelects = (0 until JacBands)
      .map(b => s"SELECT doc_id, $b AS band, ${jacBandKeySpark(b)} AS bk" +
        s" FROM ${foldView("cfo", store, "_repsigs")}$jacBandGuard")
      .mkString(" UNION ALL ")
    StoreFiles.writeBucketed(
      withPrior("bands",
        s.sql(s"SELECT doc_id, band, bk FROM ($bandSelects)")),
      s"$out/bands", Seq("band", "bk"), Seq("doc_id"))
    StoreFiles.writeBucketed(
      if (delta) s.sql(s"SELECT doc_id, rep FROM ${foldView("cfo", store, "_grp")}")
      else storeGrp(s, store, "doc_id")
        .union(s.sql(s"SELECT doc_id, rep FROM ${foldView("cfo", store, "_grp")}")),
      s"$out/grp", Seq("rep"), Seq("doc_id"))
    if (delta)
      StoreFiles.writeParent(out, StoreFiles.parentGenName(store))
    // docs = everything the SERVED assignment covers; for a delta the
    // landed parquet is changed-rows-only, so count the merge itself
    val n = if (delta) mergedKept.count()
      // readRel, not raw parquet: an EMPTY fold's bucketed assignment
      // has zero data files, and schema inference on it would abort a
      // fold whose relations all landed (the sidecar carries the DDL)
      else StoreFiles.readRel(s, s"$out/assignment").count()
    ClusterStore.writeManifest(out, n)
  }

  /** The store's assignment relation as (idCol, cluster_id), chain-
    * aware with LAST-WRITER-WINS per id: a DELTA generation's
    * assignment holds only the rows its fold CHANGED (new docs plus
    * old docs relabeled through new-batch bridges — the global-state
    * part that makes cluster/embed deltas harder than phash/ivfpq's
    * append-only relations), so the served assignment is the newest
    * generation's row per id over the _PARENT chain. One aggregation
    * (min_by on chain depth) at serve time — EXCHANGE-FREE through the
    * aligned chain table when every generation shares the id-bucketed
    * layout (StoreFiles.readChainAligned; the chain's depth partition
    * column feeds the min_by directly), an id-hashed shuffle bounded
    * by chain length only on mixed-layout fallbacks; identity (a
    * plain read) for self-contained generations.
    */
  private[graft] def storeAssignment(s: SparkSession, store: String,
                                     idCol: String): DataFrame = {
    val gens = StoreFiles.chainPaths(store) match {
      case Left(e)  => throw new IllegalStateException(e)
      case Right(g) => g
    }
    if (gens.size == 1)
      StoreFiles.readRel(s, s"${gens.head}/assignment")
        .toDF(idCol, "cluster_id")
    else {
      // aligned chain table when the layouts match (the id-bucketed
      // scan makes the min_by agg exchange-free at any depth);
      // per-generation union otherwise
      val chained = StoreFiles.readChainAligned(
          s, gens.map(g => s"$g/assignment"), Some("__depth"))
        .map(_.toDF(idCol, "cluster_id", "__depth"))
        .getOrElse(gens.zipWithIndex.map { case (g, depth) =>
          StoreFiles.readRel(s, s"$g/assignment").toDF(idCol, "cluster_id")
            .withColumn("__depth", lit(depth))
        }.reduce(_ unionAll _))
      chained.groupBy(idCol)
        .agg(min_by(col("cluster_id"), col("__depth")).as("cluster_id"))
    }
  }

  /** The store's membership relation as (idCol, rep) — identity over
    * the banded ids when the generation predates the rep-collapsed
    * layout (no grp/ subdir): bands are then member-level, so every
    * banded doc is its own representative and the expansion is a
    * no-op by construction.
    */
  private[graft] def storeGrp(s: SparkSession, store: String,
                              idCol: String): DataFrame = {
    // per chain member (identity for self-contained generations):
    // real membership where grp/ landed, identity-from-bands for
    // pre-layout generations (member-level bands — every banded id
    // is its own representative; first bands column is the id in
    // every store kind)
    val gens = StoreFiles.chainPaths(store) match {
      case Left(e)  => throw new IllegalStateException(e)
      case Right(g) => g
    }
    val allGrp = gens.forall(g => java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(g, "grp")))
    val aligned =
      if (allGrp)
        StoreFiles.readChainAligned(s, gens.map(g => s"$g/grp"), None)
          .map(_.toDF(idCol, "rep"))
      else None // a pre-layout generation in the chain: per-gen fallback
    aligned.getOrElse(gens.map { gen =>
      if (java.nio.file.Files.isDirectory(
          java.nio.file.Paths.get(gen, "grp")))
        StoreFiles.readRel(s, s"$gen/grp").toDF(idCol, "rep")
      else {
        val bands = StoreFiles.readRel(s, s"$gen/bands")
        val id = bands.columns.head
        bands.selectExpr(id).distinct()
          .selectExpr(s"$id AS $idCol", s"$id AS rep")
      }
    }.reduce(_ union _))
  }

  // One monitor per on-disk store dir (same role as Similarity's
  // storeLocks): the exists/build/write check-then-act must not
  // interleave with a concurrent load of a half-written store.
  private val clusterStoreLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]

  /** Per-(process, corpus) scratch store dir, the IvfPqStore
    * convention: first caller builds+saves, later calls are pure
    * load+serve — the restarted-session story at fixture scale.
    */
  private[graft] def ensureClusterStore(s: SparkSession, dir: String): String = {
    val store = StoreFiles.scratchDir("graft_cstore_", dir)
    StoreFiles.ensure(clusterStoreLocks, store) {
      clusterStoreBuild(s, dir, store)
    }
  }

  /** The family's held-out eval stand-in (txt_decontaminate /
    * dd_decontaminate's deterministic slice), shared with the
    * streaming decontamination gate so the store pred and the oracle
    * slice cannot drift.
    */
  private[graft] val evalPred = "doc_id % 50 = 0"

  /** Per-(process, corpus) EVAL-SLICE cluster store: the same
    * clusterStoreBuild layout, built over [[evalPred]]'s rows — the
    * served index st_decontaminate_replay probes at ingest. At
    * deployment scale this is the natural shape: the eval set is
    * tiny, curated, and versioned, so its signature store is built
    * once per eval release and every ingest batch screens against it.
    */
  private[graft] def ensureEvalClusterStore(s: SparkSession,
                                            dir: String): String = {
    val store = StoreFiles.scratchDir("graft_cstore_eval_", dir)
    StoreFiles.ensure(clusterStoreLocks, store) {
      clusterStoreBuild(s, dir, store, evalPred)
    }
  }

  /** DuckDB restatement for st_decontaminate_replay: the INDEPENDENT
    * all-pairs corpus-vs-eval spec ([[duckStoreNearDupSql]] with the
    * eval slice as the stored side) — the same contamination pair set
    * dd_decontaminate aggregates, emitted pairwise as (doc_id,
    * owner_id = the leaked eval doc).
    */
  private[graft] val duckDecontaminateReplaySql =
    s"""WITH docs AS (
       |  SELECT doc_id, doc_id % 50 = 0 AS is_eval,
       |    list_sort(list_distinct(list_transform(grams,
       |      g -> ${duckH64("g")}))) AS hs
       |  FROM (
       |    SELECT doc_id, $duckGrams AS grams FROM (
       |      SELECT doc_id, string_split(text, ' ') AS toks
       |      FROM documents)))
       |SELECT n.doc_id AS doc_id, o.doc_id AS owner_id
       |FROM docs n JOIN docs o ON NOT n.is_eval AND o.is_eval
       |WHERE least(len(n.hs), len(o.hs)) * 10
       |      >= greatest(len(n.hs), len(o.hs)) * 6
       |  AND round(CAST(len(list_intersect(n.hs, o.hs)) AS DOUBLE)
       |    / (len(n.hs) + len(o.hs) - len(list_intersect(n.hs, o.hs))), 6)
       |    >= 0.6
       |ORDER BY 1, 2""".stripMargin

  // -- dd_cluster_store: persist the prior clustering, serve the LOADED copy --
  // Round-trips the assignment through the store and returns the
  // parquet-loaded copy — never the in-session frame that computed it —
  // so the gate pins the persist/load path against the independent
  // old-half recursive-closure oracle.
  private def ddClusterStore(s: SparkSession, dir: String): DataFrame = {
    val store = ensureClusterStore(s, dir)
    storeAssignment(s, store, "doc_id").orderBy(col("doc_id"))
  }

  // -- dd_cluster_fold_stored: fold the new batch into the stored clusters ----
  // Gated by the full-corpus oracle: the fold over store + new text
  // must be bit-identical to batch re-clustering of everything.
  private def ddClusterFoldStored(s: SparkSession, dir: String)
      : DataFrame =
    clusterStoreFold(s, dir, ensureClusterStore(s, dir))

  // -- dd_embed_cluster: semantic near-dup components (SemDeDup shape) --------
  // Embedding-space clustering for semantic dedup: connected components
  // over the dd_embed_cosine_lsh candidate pairs (the banded RH-LSH scale
  // path, recall contract documented there), via the same edge-restricted
  // min-label propagation as dd_cluster. A keep-one-per-cluster pass over
  // this output is the SemDeDup-style curation step. The oracle re-derives
  // the banded edges independently and closes them with a recursive CTE,
  // so the component arithmetic is checked by a different algorithm —
  // but over the SAME (deterministic) banded candidate set, because on
  // this corpus banding recall at cos >= 0.4 is ~49% by design (the
  // pairs are the extreme tail of uniform noise — see the recall note at
  // dd_embed_cosine), so exact edges would differ by construction.
  // Candidate RECALL is gated separately and exactly by
  // dd_embed_cluster_exact below (exact edges, both engines) plus
  // DedupRecallSpec's refinement assertion (banded clusters partition-
  // refine exact clusters, which holds iff banded edges ⊆ exact edges).
  private def ddEmbedCluster(s: SparkSession, dir: String): DataFrame =
    labelPropagate("dd_embed_cluster",
      embedClusterEdges(s, dir),
      table(s, dir, "embeddings").select(col("vec_id").as("doc_id")),
      shareKey = Some(s"embed_lsh|$dir"))
      .select(col("doc_id").as("vec_id"), col("cluster_id"))
      .orderBy(col("vec_id"))

  // -- dd_embed_cluster_incremental: fold new vectors into existing clusters --
  // The semantic-dedup twin of dd_cluster_incremental (same supernode
  // contraction, same bit-identity argument — see that operator's
  // comment; the shared phase lives in contractedMerge). Split
  // convention: vec_ids are append-ordered, so the top half
  // (vec_id >= max/2 + 1) is the new batch — embeddings carry no
  // source column. The split only STRUCTURES the computation
  // (prior LP over old-old edges, contracted merge over
  // new-touching edges); the result is the full banded clustering
  // either way, which is exactly what the shared oracle states. At
  // corpus scale the prior LP is the stored assignment and the
  // increment pays bands(new) probing + a contracted LP over
  // |clusters| + |new| nodes.
  private def ddEmbedClusterIncremental(s: SparkSession, dir: String)
      : DataFrame = {
    // FOURTH consumer of the shared embed_lsh registry entry
    // (dd_embed_cluster diagnoses, dd_semdedup curates, dd_lp_edges
    // prices the cold build, this folds an increment): the increment
    // operates over the SAME banded edge set, so the engine
    // materializes it once per (session, corpus), not once per query.
    // Raw ordered pairs are recovered from the symmetric closure by
    // src < dst — exact because edgesBoth is pairs UNION swap(pairs)
    // with vec_a < vec_b by construction — a narrow scan of the
    // checkpointed blocks, not a second banded self-join.
    val edges = withAqeOff(s)(
      lpEdgesFor(s, s"embed_lsh|$dir")(
        prepLpEdges(s, embedClusterEdges(s, dir),
          defaultP = s.conf.get("spark.sql.shuffle.partitions").toInt)))
    val pairsAll = edges.edgesBoth.where(col("src") < col("dst"))
      .toDF("vec_a", "vec_b")
    val ids = table(s, dir, "embeddings").select("vec_id")
    // the ONE split convention (shared with embedStoreBuild and the
    // oracle's max//2+1 restatement) — this was an inline second copy
    val split = embedSplit(s, dir)
    // vec_a < vec_b by construction, so an edge is old-old iff its
    // MAX endpoint is old — the two filters partition the edge set
    // corpus-deterministic prior phase, assignment registry-shared
    // per (session, corpus) — see priorLblCache (r22)
    val lblA = priorLblCache.getOrBuild(s, s"einc_prior_lbl|$dir") {
      labelPropagate("dd_embed_cluster_incremental#prior",
        pairsAll.filter(col("vec_b") < split).toDF("doc_a", "doc_b"),
        ids.filter(col("vec_id") < split).toDF("doc_id"),
        shareKey = Some(s"einc_prior_edges|$dir"))
        .truncated()
    }
    contractedMerge("dd_embed_cluster_incremental#merge", lblA,
      pairsAll.filter(col("vec_b") >= split).toDF("doc_a", "doc_b"),
      ids.filter(col("vec_id") >= split).toDF("doc_id"))
      .select(col("doc_id").as("vec_id"), col("cluster_id"))
      .orderBy(col("vec_id"))
  }

  // ---- persistent EMBED cluster store + incremental fold --------------------
  // The semantic-dedup (SemDeDup) production pattern, mirroring the
  // jaccard-side ClusterStore term-for-term: a store holds exactly
  // what a vector increment needs and nothing else —
  //   assignment/  (vec_id, cluster_id)  the converged prior labels
  //   vecs/        (vec_id, embedding, n2)  the cosine-verify side
  //   bands/       (vec_id, band, bkt)  the 12x5 RH-LSH probe index
  //   manifest.json  written temp+ATOMIC_MOVE LAST (crash marker)
  // A fold probes bands(new) against the stored index, cosine-verifies
  // candidates against stored vecs + the new batch, and contract-merges
  // into the stored assignment (contractedMerge's bit-identity
  // argument) — it NEVER re-reads old vectors from the corpus:
  // EmbedClusterStoreSpec zeroes every old embedding after the build
  // and the fold still bit-matches full banded re-clustering of the
  // original corpus. At 100 TB the store is the served dedup index —
  // bands/ is bucket-collocatable on (band, bkt), vecs/ is the only
  // full-width relation and is touched solely by verified candidates,
  // and the contracted LP runs over |clusters| + |new| nodes. n2 is
  // stored, not recomputed: the same graft_dot kernel output the
  // build used, so fold-time cosines are bit-identical to build-time.
  private[graft] object EmbedClusterStore {
    def exists(dir: String): Boolean = StoreFiles.exists(dir)

    def writeManifest(dir: String, nVecs: Long): Unit =
      StoreFiles.writeManifest(dir,
        s"""{"vecs": $nVecs, "bands": $CosBands, "rows_per_band": 5,
           | "threshold": 0.4}""".stripMargin)
  }

  /** Append-ordered split shared with dd_embed_cluster_incremental:
    * the top half of vec_ids is the new batch.
    */
  private[graft] def embedSplit(s: SparkSession, dir: String): Long = {
    val row = table(s, dir, "embeddings").agg(max("vec_id")).head
    // an empty table's max is NULL — name the problem instead of the
    // opaque NullPointerException getLong would throw
    require(!row.isNullAt(0),
      s"$dir/embeddings is empty — no vectors to split")
    row.getLong(0) / 2 + 1
  }

  /** Build the store from the corpus vectors with vec_id < `split`:
    * one banded self-join + cosine verify (the dd_embed_cosine_lsh
    * arithmetic, term-for-term), one LP to convergence, three parquet
    * landings, manifest last.
    */
  private[graft] def embedStoreBuild(s: SparkSession, dir: String,
                                     store: String,
                                     pred: String = ""): Unit = {
    // store-path-qualified view names — the clusterStoreBuild note:
    // the serving and eval-slice builds of one corpus lock different
    // dirs and may run concurrently in one session
    val estE = "est" + StoreFiles.md5Hex(store, 8) + "_e"
    val estGrp = "est" + StoreFiles.md5Hex(store, 8) + "_grp"
    val estRep = "est" + StoreFiles.md5Hex(store, 8) + "_repe"
    VectorFunctions.ensureRegistered(s)
    val oldPred =
      if (pred.isEmpty) s"vec_id < ${embedSplit(s, dir)}" else pred
    val e = table(s, dir, "embeddings")
      .where(oldPred)
      .selectExpr("vec_id", "embedding",
        "graft_dot(embedding, embedding) AS n2",
        "graft_rh_buckets(embedding) AS bks")
      .cache()
    e.createOrReplaceTempView(estE)
    // rep-collapsed layout (the ClusterStore r17 discipline, embed
    // face): byte-identical vectors collapse to their min-vec_id rep
    // (embedClusterEdges' key; zero-norm carve-out — a zero vector's
    // cosine is NaN, never an edge), only reps are banded/stored
    // full-width, membership lands in grp/. Exact because a member's
    // bytes and n2 equal its rep's: every cosine any consumer computes
    // against a member is bit-identical against its rep.
    embedGrpFrame(s, estE).createOrReplaceTempView(estGrp)
    s.sql(
      s"""SELECT s.* FROM $estE s
         |JOIN (SELECT DISTINCT rep FROM $estGrp) r ON s.vec_id = r.rep"""
        .stripMargin)
      .truncated().createOrReplaceTempView(estRep)
    // same zero-norm band guard as ddEmbedLshPairs
    val bandSelects = (0 until CosBands)
      .map(b => s"SELECT vec_id, $b AS band, element_at(bks, ${b + 1})" +
        s" AS bkt FROM $estRep WHERE n2 > 0")
      .mkString(" UNION ALL ")
    val pairs = s.sql(
      s"""WITH bands AS ($bandSelects),
         |cand AS (
         |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.bkt = y.bkt AND x.vec_id < y.vec_id)
         |SELECT vec_a, vec_b FROM (
         |  SELECT vec_a, vec_b, round(cs, 6) AS cos_sim FROM (
         |    SELECT vec_a, vec_b,
         |      graft_cos(a.embedding, b.embedding, a.n2, b.n2) AS cs
         |    FROM cand JOIN $estE a ON a.vec_id = vec_a
         |              JOIN $estE b ON b.vec_id = vec_b)
         |  WHERE cs > 0.3999994)
         |WHERE cos_sim >= 0.4
         |UNION ALL
         |SELECT rep AS vec_a, vec_id AS vec_b FROM $estGrp
         |WHERE vec_id <> rep""".stripMargin)
    val lbl = labelPropagate("dd_embed_cluster_store",
      pairs.toDF("doc_a", "doc_b"),
      e.select(col("vec_id").as("doc_id")))
      .toDF("vec_id", "cluster_id")
    new java.io.File(store).mkdirs()
    // bucketed layout — see clusterStoreBuild's note
    StoreFiles.writeBucketed(lbl, s"$store/assignment", Seq("vec_id"))
    StoreFiles.writeBucketed(
      s.sql(s"SELECT vec_id, embedding, n2 FROM $estRep"),
      s"$store/vecs", Seq("vec_id"))
    StoreFiles.writeBucketed(
      s.sql(s"SELECT vec_id, band, bkt FROM ($bandSelects)"),
      s"$store/bands", Seq("band", "bkt"), Seq("vec_id"))
    StoreFiles.writeBucketed(
      s.sql(s"SELECT vec_id, rep FROM $estGrp"),
      s"$store/grp", Seq("rep"), Seq("vec_id"))
    val n = e.count()
    e.unpersist()
    lbl.unpersist()
    EmbedClusterStore.writeManifest(store, n)
  }

  /** The embed fold's new-batch relation (eagerly checkpointed) and
    * its cosine-verified edge frame, LAZY — the same split as
    * [[clusterStoreEdgeFrame]], for the same PlanSpec pin.
    */
  private[graft] def embedStoreEdgeFrame(s: SparkSession, dir: String,
                                         store: String,
                                         newPred: String = "")
      : (DataFrame, DataFrame) = {
    val efoE = foldView("efo", store, "_e")
    val efoGrp = foldView("efo", store, "_grp")
    val efoRep = foldView("efo", store, "_repe")
    val efoOldBands = foldView("efo", store, "_oldbands")
    val efoOldVecs = foldView("efo", store, "_oldvecs")
    VectorFunctions.ensureRegistered(s)
    val np =
      if (newPred.isEmpty) s"vec_id >= ${embedSplit(s, dir)}" else newPred
    // eager localCheckpoint: feeds 12 band sides, both verify
    // join-backs, and the node list inside ONE edge job (the lazy-
    // cache race documented at clusterStoreIncrement)
    val newE = table(s, dir, "embeddings")
      .where(np)
      .selectExpr("vec_id", "embedding",
        "graft_dot(embedding, embedding) AS n2",
        "graft_rh_buckets(embedding) AS bks")
      .truncated()
    newE.createOrReplaceTempView(efoE)
    // NEW-side collapse (see clusterStoreEdgeFrame): a bombed vector
    // ingest batch probes and verifies once per group; members ride
    // star edges; the old side's membership lives in the stored
    // assignment.
    embedGrpFrame(s, efoE).createOrReplaceTempView(efoGrp)
    s.sql(
      s"""SELECT s.* FROM $efoE s
         |JOIN (SELECT DISTINCT rep FROM $efoGrp) r ON s.vec_id = r.rep"""
        .stripMargin)
      .truncated().createOrReplaceTempView(efoRep)
    StoreFiles.readRelChain(s, store, "bands")
      .createOrReplaceTempView(efoOldBands)
    StoreFiles.readRelChain(s, store, "vecs")
      .createOrReplaceTempView(efoOldVecs)
    val newBandSelects = (0 until CosBands)
      .map(b => s"SELECT vec_id, $b AS band, element_at(bks, ${b + 1})" +
        s" AS bkt FROM $efoRep WHERE n2 > 0")
      .mkString(" UNION ALL ")
    // bands(new reps) probe the STORED index (old-new) plus a banded
    // self-join of the new reps alone (new-new); old-old pairs never
    // regenerate. The verify join is SIDE-SPLIT (r22, guide §2.4/§6 —
    // see clusterStoreEdgeFrame's note): the branches are disjoint
    // (an id is never both stored and new), so the cross-branch UNION
    // equals per-branch DISTINCTs, and each endpoint verifies against
    // its ONE home — old endpoints against the stored vecs relation
    // (bucketed by vec_id: the store side of the join is
    // exchange-free at any scale), new endpoints against the
    // checkpointed increment. The old UNION ALL re-shuffled
    // corpus-scale EMBEDDING ARRAYS through a fresh exchange on every
    // fold; now only the candidate pair list moves. least/greatest
    // normalizes the probe branch because a caller's pred need not
    // keep every old id below every new id (the default split does);
    // cosine is symmetric. The new batch's star edges ride along in
    // the same frame.
    val edges = s.sql(
      s"""WITH newbands AS ($newBandSelects),
         |cand_on AS (
         |  SELECT DISTINCT o.vec_id AS vec_o, n.vec_id AS vec_n
         |  FROM $efoOldBands o JOIN newbands n
         |    ON o.band = n.band AND o.bkt = n.bkt),
         |cand_nn AS (
         |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
         |  FROM newbands x JOIN newbands y
         |    ON x.band = y.band AND x.bkt = y.bkt AND x.vec_id < y.vec_id),
         |v_on AS (
         |  SELECT least(vec_o, vec_n) AS vec_a,
         |         greatest(vec_o, vec_n) AS vec_b FROM (
         |    SELECT vec_o, vec_n, round(cs, 6) AS cos_sim FROM (
         |      SELECT vec_o, vec_n,
         |        graft_cos(o.embedding, n.embedding, o.n2, n.n2) AS cs
         |      FROM cand_on JOIN $efoOldVecs o ON o.vec_id = vec_o
         |                   JOIN $efoE n ON n.vec_id = vec_n)
         |    WHERE cs > 0.3999994)
         |  WHERE cos_sim >= 0.4),
         |v_nn AS (
         |  SELECT vec_a, vec_b FROM (
         |    SELECT vec_a, vec_b, round(cs, 6) AS cos_sim FROM (
         |      SELECT vec_a, vec_b,
         |        graft_cos(a.embedding, b.embedding, a.n2, b.n2) AS cs
         |      FROM cand_nn JOIN $efoE a ON a.vec_id = vec_a
         |                   JOIN $efoE b ON b.vec_id = vec_b)
         |    WHERE cs > 0.3999994)
         |  WHERE cos_sim >= 0.4)
         |SELECT vec_a, vec_b FROM v_on
         |UNION ALL
         |SELECT vec_a, vec_b FROM v_nn
         |UNION ALL
         |SELECT rep AS vec_a, vec_id AS vec_b FROM $efoGrp
         |WHERE vec_id <> rep""".stripMargin)
    (newE, edges)
  }

  /** Fold the corpus vectors matching `newPred` (default: the top
    * half) into the stored clustering: reads the store + the NEW
    * vectors only; bit-identical to batch re-clustering
    * (contractedMerge's argument).
    */
  private[graft] def embedStoreFold(s: SparkSession, dir: String,
                                    store: String,
                                    newPred: String = ""): DataFrame =
    embedStoreIncrement(s, dir, store, newPred)._2
      .orderBy(col("vec_id"))

  /** The increment shared by the serve-only fold and the
    * generation-writing [[embedStoreFoldInto]]: the new batch's
    * checkpointed (vec_id, embedding, n2, bks) relation and the
    * merged (store + new) assignment, UNSORTED.
    */
  private def embedStoreIncrement(s: SparkSession, dir: String,
                                  store: String, newPred: String)
      : (DataFrame, DataFrame) = {
    val (newE, edgesLazy) = embedStoreEdgeFrame(s, dir, store, newPred)
    // eager edge checkpoint (the threshold-into-join-condition trap,
    // see clusterStoreIncrement) — with AQE ON since r21 so the
    // verify join-backs broadcast the model-sized sides at runtime
    // (measured there: CPU halves; same adjudication note)
    val edges = edgesLazy.truncated()
    val lblA = storeAssignment(s, store, "doc_id")
    (newE,
      contractedMerge("dd_embed_cluster_fold_stored#merge", lblA,
        edges.toDF("doc_a", "doc_b"),
        newE.select(col("vec_id").as("doc_id")))
        .select(col("doc_id").as("vec_id"), col("cluster_id")))
  }

  /** Write the NEXT-GENERATION embed store at `out`: assignment = the
    * merged fold, vecs/bands = the prior store's parquet UNION the
    * increment's. Stores are IMMUTABLE — same generation discipline
    * and no-old-reads guarantee as [[clusterStoreFoldInto]]
    * (EmbedClusterStoreSpec's chain test zeroes each batch's vectors
    * as soon as its generation lands).
    */
  private[graft] def embedStoreFoldInto(s: SparkSession, dir: String,
                                        store: String, newPred: String,
                                        out: String,
                                        delta: Boolean = false): Unit = {
    if (delta)
      require(StoreFiles.normParent(out) == StoreFiles.normParent(store),
        "a delta generation links its parent by bare sibling name — " +
          s"$out and $store must share a root")
    val (newE, merged) = embedStoreIncrement(s, dir, store, newPred)
    new java.io.File(out).mkdirs()
    // delta assignment = changed rows only; serve is last-writer-wins
    // over the chain (see clusterStoreFoldInto)
    val mergedKept = merged.truncated()
    StoreFiles.writeBucketed(
      if (delta) mergedKept.except(storeAssignment(s, store, "vec_id"))
      else mergedKept,
      s"$out/assignment", Seq("vec_id"))
    // the increment lands rep-collapsed (the edge frame registered
    // efo_grp/efo_repe): vecs/bands gain the NEW batch's reps only,
    // grp gains its membership (the clusterStoreFoldInto discipline)
    def withPrior(rel: String, inc: DataFrame): DataFrame =
      if (delta) inc else StoreFiles.readRelChain(s, store, rel).union(inc)
    StoreFiles.writeBucketed(
      withPrior("vecs",
        s.sql(s"SELECT vec_id, embedding, n2 FROM ${foldView("efo", store, "_repe")}")),
      s"$out/vecs", Seq("vec_id"))
    val bandSelects = (0 until CosBands)
      .map(b => s"SELECT vec_id, $b AS band, element_at(bks, ${b + 1})" +
        s" AS bkt FROM ${foldView("efo", store, "_repe")} WHERE n2 > 0")
      .mkString(" UNION ALL ")
    StoreFiles.writeBucketed(
      withPrior("bands",
        s.sql(s"SELECT vec_id, band, bkt FROM ($bandSelects)")),
      s"$out/bands", Seq("band", "bkt"), Seq("vec_id"))
    StoreFiles.writeBucketed(
      if (delta) s.sql(s"SELECT vec_id, rep FROM ${foldView("efo", store, "_grp")}")
      else storeGrp(s, store, "vec_id")
        .union(s.sql(s"SELECT vec_id, rep FROM ${foldView("efo", store, "_grp")}")),
      s"$out/grp", Seq("rep"), Seq("vec_id"))
    if (delta)
      StoreFiles.writeParent(out, StoreFiles.parentGenName(store))
    // vecs are reps only now — docs = what the SERVED assignment covers
    val n = if (delta) mergedKept.count()
      // readRel, not raw parquet: an EMPTY fold's bucketed assignment
      // has zero data files, and schema inference on it would abort a
      // fold whose relations all landed (the sidecar carries the DDL)
      else StoreFiles.readRel(s, s"$out/assignment").count()
    EmbedClusterStore.writeManifest(out, n)
  }

  private val embedStoreLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]

  /** Per-(process, corpus) scratch store, the ClusterStore/IvfPqStore
    * convention: first caller builds+saves, later calls load+serve.
    */
  private[graft] def ensureEmbedStore(s: SparkSession,
                                      dir: String): String = {
    val store = StoreFiles.scratchDir("graft_estore_", dir)
    StoreFiles.ensure(embedStoreLocks, store) {
      embedStoreBuild(s, dir, store)
    }
  }

  /** [[evalPred]] over vec_id — one definition for the embed family's
    * eval slice, so the store build and the streaming feed cannot
    * drift (the text side's evalPred argument; the DuckDB oracles
    * state the same % 50 literally, next to the batch oracle's own).
    */
  private[graft] val evalVecPred = "vec_id % 50 = 0"

  /** Per-(process, corpus) EVAL-SLICE embed store ([[evalVecPred]] —
    * the semantic twin of [[ensureEvalClusterStore]]): the served
    * index st_decontaminate_semantic_replay probes at ingest.
    */
  private[graft] def ensureEvalEmbedStore(s: SparkSession,
                                          dir: String): String = {
    val store = StoreFiles.scratchDir("graft_estore_eval_", dir)
    StoreFiles.ensure(embedStoreLocks, store) {
      embedStoreBuild(s, dir, store, evalVecPred)
    }
  }

  /** DuckDB restatement for st_decontaminate_semantic_replay: the
    * corpus-vs-eval slice of the BANDED cosine pair table (the
    * dd_decontaminate_semantic convention — banding recall on the
    * noise fixture is ~49% by design, so the banded restatement IS
    * the spec; the stream's probe against the eval store's band index
    * computes exactly this slice because a non-eval vector
    * band-matches a stored eval vector iff the full self-join would
    * band the pair), emitted pairwise as (vec_id, owner_id = the
    * leaked eval vector). Lazy for the same init-order reason as
    * [[ddDecontaminateSemanticSql]].
    */
  private[graft] lazy val duckDecontaminateSemanticReplaySql =
    s"""WITH ${duckEmbedECte()},
       |bands AS ($duckEmbedBandSelects),
       |cand AS (
       |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bkt = y.bkt AND x.vec_id < y.vec_id),
       |p AS (
       |  SELECT vec_a, vec_b FROM (
       |    SELECT vec_a, vec_b, ${duckEmbedCos("a", "b")} AS cos_sim
       |    FROM cand JOIN e a ON a.vec_id = vec_a
       |              JOIN e b ON b.vec_id = vec_b)
       |  WHERE cos_sim >= 0.4)
       |SELECT d AS vec_id, ev AS owner_id FROM (
       |  SELECT vec_a AS d, vec_b AS ev FROM p
       |  UNION ALL SELECT vec_b AS d, vec_a AS ev FROM p)
       |WHERE d % 50 <> 0 AND ev % 50 = 0
       |ORDER BY 1, 2""".stripMargin

  // -- dd_embed_cluster_store: persist the old-half clustering, serve LOADED --
  private def ddEmbedClusterStore(s: SparkSession, dir: String)
      : DataFrame = {
    val store = ensureEmbedStore(s, dir)
    storeAssignment(s, store, "vec_id").orderBy(col("vec_id"))
  }

  // -- dd_embed_cluster_fold_stored: fold new vectors into the store ----------
  // Gated by the full-corpus banded oracle: the fold over store + new
  // vectors must be bit-identical to batch re-clustering of everything.
  private def ddEmbedClusterFoldStored(s: SparkSession, dir: String)
      : DataFrame =
    embedStoreFold(s, dir, ensureEmbedStore(s, dir))

  /** Old-half restriction for the store oracle — the banded clustering
    * of the build's half alone, restated independently.
    */
  private val embedOldWhere =
    " WHERE vec_id < (SELECT max(vec_id) // 2 + 1 FROM embeddings)"

  private val ddEmbedClusterSql = {
    val bandSelects = duckEmbedBandSelects
    s"""${ddEmbedClusterCtes(bandSelects)}
       |SELECT v AS vec_id, MIN(node) AS cluster_id
       |FROM r GROUP BY v ORDER BY vec_id""".stripMargin
  }

  private val ddEmbedClusterStoreSql = {
    val bandSelects = duckEmbedBandSelects
    s"""${ddEmbedClusterCtes(bandSelects, embedOldWhere)}
       |SELECT v AS vec_id, MIN(node) AS cluster_id
       |FROM r GROUP BY v ORDER BY vec_id""".stripMargin
  }

  /** The shared banded-edge + recursive-closure CTE chain behind
    * dd_embed_cluster's oracle and dd_semdedup's (which adds the
    * per-cluster keeper selection on top). `withKw` lets dd_lp_edges
    * reuse the edge prefix without the recursive closure.
    */
  private def ddEmbedClusterCtes(bandSelects: String,
                                 embWhere: String = ""): String =
    s"""${ddEmbedEdgeCtes(bandSelects, "WITH RECURSIVE", embWhere)},
       |r(v, node) AS (
       |  SELECT vec_id, vec_id FROM embeddings$embWhere
       |  UNION
       |  SELECT r.v, e2.dst FROM r JOIN edges e2 ON e2.src = r.node)""".stripMargin

  /** The banded-edge CTE prefix alone: e (normed + bucketed vectors),
    * bands, cand (banded candidates), pairs (cosine-verified), edges
    * (symmetric closure) — the independent DuckDB restatement of
    * exactly what [[prepLpEdges]] materializes for the embed-LSH share
    * key.
    */
  private def ddEmbedEdgeCtes(bandSelects: String, withKw: String,
                              embWhere: String = ""): String =
    s"""$withKw ${duckEmbedECte(embWhere)},
       |bands AS ($bandSelects),
       |cand AS (
       |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bkt = y.bkt AND x.vec_id < y.vec_id),
       |pairs AS (
       |  SELECT vec_a, vec_b FROM (
       |    SELECT vec_a, vec_b,
       |      ${duckEmbedCos("a", "b")} AS cos_sim
       |    FROM cand JOIN e a ON a.vec_id = vec_a
       |              JOIN e b ON b.vec_id = vec_b)
       |  WHERE cos_sim >= 0.4),
       |edges AS (SELECT vec_a AS src, vec_b AS dst FROM pairs
       |          UNION ALL SELECT vec_b, vec_a FROM pairs)""".stripMargin

  /** The embed e-CTE (normed + bucketed vectors) — ONE construction
    * for every embed-family oracle ([[ddEmbedEdgeCtes]],
    * [[duckEmbedBandsSql]], the cosine-LSH oracle), so a tuning
    * change to the plane family or n2 formulation cannot
    * desynchronize them.
    */
  private def duckEmbedECte(embWhere: String = ""): String =
    s"""e AS (
       |  SELECT vec_id, embedding,
       |    list_reduce(list_transform(range(1, len(embedding) + 1),
       |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
       |      (x, y) -> x + y) AS n2,
       |    ${(0 until CosBands)
              .map(b => s"${cosBucket(cosPlaneDotD, b)} AS bkt_$b")
              .mkString(",\n    ")}
       |  FROM embeddings$embWhere)""".stripMargin

  /** The zero-norm-guarded band-side UNION ALL over the e-CTE — the
    * single definition behind every embed oracle's `bands` clause.
    */
  private def duckEmbedBandSelects: String =
    (0 until CosBands)
      .map(b => s"SELECT vec_id, $b AS band, bkt_$b AS bkt FROM e WHERE n2 > 0")
      .mkString(" UNION ALL ")

  /** e-CTE + guarded band rows as two WITH clauses (`e`, `emb_bands`)
    * — shared by the streaming store-dedup replay oracle
    * (st_store_dedup_replay) so stream and batch banding stay
    * provably identical, the same role [[duckBandRowsSql]] plays for
    * the MinHash stream.
    */
  private[graft] def duckEmbedBandsSql: String =
    s"""${duckEmbedECte()},
       |emb_bands AS ($duckEmbedBandSelects)""".stripMargin

  /** The rounded cosine between two e-CTE rows `$a`/`$b`, the exact
    * text of every embed oracle's verify — exposed for the streaming
    * store-dedup oracle.
    */
  private[graft] def duckEmbedCos(a: String, b: String): String =
    s"""round(list_reduce(list_transform(range(1, len($a.embedding) + 1),
       |    i -> CAST($a.embedding[i] AS DOUBLE)
       |         * CAST($b.embedding[i] AS DOUBLE)),
       |    (x, y) -> x + y) / sqrt($a.n2 * $b.n2), 6)""".stripMargin

  // -- dd_lp_edges: the shared embed-LSH edge materialization, COLD -----------
  // The bench line for the registry build dd_embed_cluster/dd_semdedup
  // amortize (VERDICT r15: once the edge frame was shared, those two
  // queries' numbers became warm-cache-only and the ~15 CPU-s cold
  // build vanished from every measured channel). Each call first
  // INVALIDATES the (session, corpus) entry, then rebuilds it through
  // the same registry path + AQE-off scope the consumers use, so the
  // measured cost IS the cold banded self-join + cosine verify +
  // symmetric-closure checkpoint. Returns the materialized closure;
  // the oracle restates it independently (band CTEs + UNION ALL).
  // ORACLE SCOPE (r18): the oracle restates embedClusterEdges'
  // duplicate COLLAPSE too — identical vectors group under their
  // min-vec_id rep (GROUP BY the embedding value itself, the
  // engine-neutral form of the md5-rendering key; zero-norm
  // carve-out), only reps band, and the star edges' symmetric
  // closure joins the verified rep pairs' — so the row-for-row
  // equality holds on ANY corpus, including bombed ones
  // (DupBombGuardSpec pins it on the bomb fixture; linearity stays
  // that spec's gate).
  private def ddLpEdges(s: SparkSession, dir: String): DataFrame = {
    invalidateDerived(s, dir)
    val edges = withAqeOff(s)(
      lpEdgesFor(s, s"embed_lsh|$dir")(
        prepLpEdges(s, embedClusterEdges(s, dir),
          defaultP = s.conf.get("spark.sql.shuffle.partitions").toInt)))
    edges.edgesBoth.orderBy(col("src"), col("dst"))
  }

  private val ddLpEdgesSql =
    s"""WITH ${duckEmbedECte()},
       |grp AS (
       |  SELECT k.vec_id, g.rep
       |  FROM (SELECT vec_id, embedding FROM e WHERE n2 > 0) k
       |  JOIN (SELECT embedding, MIN(vec_id) AS rep FROM e
       |        WHERE n2 > 0 GROUP BY embedding) g
       |  ON k.embedding = g.embedding),
       |bands AS (
       |  SELECT b.vec_id, b.band, b.bkt FROM ($duckEmbedBandSelects) b
       |  JOIN (SELECT DISTINCT rep FROM grp) r ON b.vec_id = r.rep),
       |cand AS (
       |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bkt = y.bkt AND x.vec_id < y.vec_id),
       |pairs AS (
       |  SELECT vec_a, vec_b FROM (
       |    SELECT vec_a, vec_b,
       |      ${duckEmbedCos("a", "b")} AS cos_sim
       |    FROM cand JOIN e a ON a.vec_id = vec_a
       |              JOIN e b ON b.vec_id = vec_b)
       |  WHERE cos_sim >= 0.4),
       |alledges AS (
       |  SELECT vec_a, vec_b FROM pairs
       |  UNION ALL
       |  SELECT rep AS vec_a, vec_id AS vec_b FROM grp
       |  WHERE vec_id <> rep),
       |edges AS (SELECT vec_a AS src, vec_b AS dst FROM alledges
       |          UNION ALL SELECT vec_b, vec_a FROM alledges)
       |SELECT src, dst FROM edges ORDER BY src, dst""".stripMargin

  // -- dd_semdedup: the SemDeDup keep/drop action -----------------------------
  // Clustering is diagnosis; THIS is the curation action (Abbas et al.
  // 2023, SemDeDup): per semantic cluster keep ONE prototype — here the
  // max-L2-norm member (vec_id as tiebreak; n2 is the graft_dot left
  // fold, bit-identical in both engines, so the argmax cannot diverge) —
  // and report cluster size. Downstream, an anti-join of the corpus
  // against the non-keepers is the dedup'd training set. Shape: the LP
  // labels (edge-incident nodes only) join the norms once; keeper
  // selection is one cluster-partitioned window — nothing global.
  // Oracle: the same banded edges closed by a recursive CTE plus the
  // identical window, stated independently of label propagation.
  private def ddSemdedup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Shares dd_embed_cluster's prepared edge frame (same shareKey):
    // semdedup is the curation ACTION over the same banded edge set the
    // clustering query diagnoses, so the engine materializes those
    // edges once per (session, corpus), not once per query.
    val labels = labelPropagate("dd_semdedup",
      embedClusterEdges(s, dir),
      table(s, dir, "embeddings").select(col("vec_id").as("doc_id")),
      shareKey = Some(s"embed_lsh|$dir"))
      .select(col("doc_id").as("vec_id"), col("cluster_id"))
    val norms = table(s, dir, "embeddings")
      .selectExpr("vec_id", "graft_dot(embedding, embedding) AS n2")
    val wC = Window.partitionBy("cluster_id")
    labels.join(norms, Seq("vec_id"))
      .withColumn("rk", row_number().over(
        wC.orderBy(col("n2").desc, col("vec_id"))))
      .withColumn("n_members", count(lit(1)).over(wC))
      .filter(col("rk") === 1)
      .select(col("cluster_id"), col("vec_id").as("keep_id"),
        col("n_members"))
      .orderBy(col("cluster_id"))
  }

  private def ddSemdedupSql: String = {
    val bandSelects = duckEmbedBandSelects
    s"""${ddEmbedClusterCtes(bandSelects)},
       |lab AS (SELECT v AS vec_id, MIN(node) AS cluster_id
       |        FROM r GROUP BY v)
       |SELECT cluster_id, keep_id, n_members FROM (
       |  SELECT l.cluster_id, l.vec_id AS keep_id,
       |    row_number() OVER (PARTITION BY l.cluster_id
       |      ORDER BY e.n2 DESC, l.vec_id) AS rk,
       |    CAST(COUNT(*) OVER (PARTITION BY l.cluster_id) AS BIGINT)
       |      AS n_members
       |  FROM lab l JOIN e ON e.vec_id = l.vec_id)
       |WHERE rk = 1 ORDER BY cluster_id""".stripMargin
  }

  // -- dd_embed_cluster_exact: the exact-edge spec for dd_embed_cluster -------
  // Same min-label propagation, but over the EXACT all-pairs cosine
  // edges (dd_embed_cosine's quadratic spec — small-scale oracle role,
  // like sim_topk_brute for the ANN paths, NOT the 100 TB path). The
  // DuckDB oracle closes the same exact edge spec with a recursive CTE,
  // so this row gates candidate recall AND closure against formulations
  // independent of banding and of label propagation — the exactness
  // anchor the banded dd_embed_cluster is measured against in
  // DedupRecallSpec's refinement assertion.
  private def ddEmbedClusterExact(s: SparkSession, dir: String): DataFrame =
    labelPropagate("dd_embed_cluster_exact",
      ddEmbedExactPairs(s, dir).select("vec_a", "vec_b"),
      table(s, dir, "embeddings").select(col("vec_id").as("doc_id")),
      // shared LP edge structure per (session, corpus) — the r21
      // registry discipline; the quadratic exact-pair NLJ is the
      // oracle shape and need not re-run per call
      shareKey = Some(s"dd_embed_cluster_exact_edges|$dir"))
      .select(col("doc_id").as("vec_id"), col("cluster_id"))
      .orderBy(col("vec_id"))

  private val ddEmbedClusterExactSql =
    """WITH RECURSIVE e AS (
      |  SELECT vec_id, embedding,
      |    list_reduce(list_transform(range(1, len(embedding) + 1),
      |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
      |      (x, y) -> x + y) AS n2
      |  FROM embeddings),
      |pairs AS (
      |  SELECT vec_a, vec_b FROM (
      |    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |      round(list_reduce(list_transform(range(1, len(a.embedding) + 1),
      |          i -> CAST(a.embedding[i] AS DOUBLE)
      |               * CAST(b.embedding[i] AS DOUBLE)),
      |          (x, y) -> x + y) / sqrt(a.n2 * b.n2), 6) AS cos_sim
      |    FROM e a JOIN e b ON a.vec_id < b.vec_id)
      |  WHERE cos_sim >= 0.4),
      |edges AS (SELECT vec_a AS src, vec_b AS dst FROM pairs
      |          UNION ALL SELECT vec_b, vec_a FROM pairs),
      |r(v, node) AS (
      |  SELECT vec_id, vec_id FROM embeddings
      |  UNION
      |  SELECT r.v, e2.dst FROM r JOIN edges e2 ON e2.src = r.node)
      |SELECT v AS vec_id, MIN(node) AS cluster_id
      |FROM r GROUP BY v ORDER BY vec_id""".stripMargin

  // -- dd_curation_funnel: the end-to-end corpus-prep composition -------------
  // The pipeline a training-data user actually runs, as ONE declarative
  // query so Catalyst fuses the gates into a single pass over the scan:
  // exact dedup (keep the min doc_id per md5(text) group) -> quality
  // gate (>= 5 tokens, stopword ratio <= 0.5) -> repetition gate
  // (distinct-token ratio >= 0.3), reported as a per-language funnel
  // with surviving token mass. One window + one aggregation; every
  // ratio is a single IEEE division on exact integer counts, so the
  // DuckDB oracle states the identical funnel.
  private def ddCurationFunnel(s: SparkSession, dir: String): DataFrame = {
    table(s, dir, "documents").createOrReplaceTempView("cf_docs")
    s.sql(
      """SELECT lang,
        |  COUNT(*) AS n_docs,
        |  cast(sum(CASE WHEN keep = 1 THEN 1 ELSE 0 END) as bigint)
        |    AS n_unique,
        |  cast(sum(CASE WHEN keep = 1 AND ok_quality AND ok_repetition
        |    THEN 1 ELSE 0 END) as bigint) AS n_curated,
        |  cast(sum(CASE WHEN keep = 1 AND ok_quality AND ok_repetition
        |    THEN n_tokens ELSE 0 END) as bigint) AS curated_tokens
        |FROM (
        |  SELECT lang, n_tokens,
        |    CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY h)
        |      THEN 1 ELSE 0 END AS keep,
        |    n_tokens >= 5 AND
        |      cast(n_stop as double) / n_tokens <= 0.5 AS ok_quality,
        |    cast(n_distinct as double) / n_tokens >= 0.3 AS ok_repetition
        |  FROM (
        |    SELECT lang, doc_id, md5(text) AS h,
        |      cast(size(toks) as bigint) AS n_tokens,
        |      cast(size(filter(toks, t -> t = 'the' OR t = 'a')) as bigint)
        |        AS n_stop,
        |      cast(size(array_distinct(toks)) as bigint) AS n_distinct
        |    FROM (SELECT lang, doc_id, text, split(text, ' ') AS toks
        |          FROM cf_docs)))
        |GROUP BY lang ORDER BY lang""".stripMargin)
  }

  private val ddCurationFunnelSql =
    """SELECT lang,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN keep = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_unique,
      |  CAST(SUM(CASE WHEN keep = 1 AND ok_quality AND ok_repetition
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_curated,
      |  CAST(SUM(CASE WHEN keep = 1 AND ok_quality AND ok_repetition
      |    THEN n_tokens ELSE 0 END) AS BIGINT) AS curated_tokens
      |FROM (
      |  SELECT lang, n_tokens,
      |    CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY h)
      |      THEN 1 ELSE 0 END AS keep,
      |    n_tokens >= 5 AND
      |      CAST(n_stop AS DOUBLE) / n_tokens <= 0.5 AS ok_quality,
      |    CAST(n_distinct AS DOUBLE) / n_tokens >= 0.3 AS ok_repetition
      |  FROM (
      |    SELECT lang, doc_id, md5(text) AS h,
      |      len(toks) AS n_tokens,
      |      len(list_filter(toks, t -> t = 'the' OR t = 'a')) AS n_stop,
      |      len(list_distinct(toks)) AS n_distinct
      |    FROM (SELECT lang, doc_id, text, string_split(text, ' ') AS toks
      |          FROM documents)))
      |GROUP BY lang ORDER BY lang""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(
      "dd_exact" -> ddExact _,
      "dd_jaccard" -> ddJaccard _,
      "dd_decontaminate" -> ddDecontaminate _,
      "dd_decontaminate_semantic" -> ddDecontaminateSemantic _,
      "dd_containment" -> ddContainment _,
      "dd_minhash" -> ddMinhash _,
      "dd_minhash_lsh" -> ddMinhashLsh _,
      "dd_simhash" -> ddSimhash _,
      "dd_simhash_pairs" -> ddSimhashPairs _,
      "dd_simhash64" -> ddSimhash64 _,
      "dd_embed_cosine" -> ddEmbedCosineExact _,
      "dd_embed_cosine_lsh" -> ddEmbedCosineLsh _,
      "dd_cluster" -> ddCluster _,
      "dd_cluster_incremental" -> ddClusterIncremental _,
      "dd_containment_smallside" -> ddContainmentSmallside _,
      "dd_span" -> ddSpan _,
      "dd_incremental" -> ddIncremental _,
      "dd_incremental_bloom" -> ddIncrementalBloom _,
      "dd_threshold_sweep" -> ddThresholdSweep _,
      "dd_cluster_store" -> ddClusterStore _,
      "dd_cluster_fold_stored" -> ddClusterFoldStored _,
      "dd_semdedup" -> ddSemdedup _,
      "dd_embed_cluster" -> ddEmbedCluster _,
      "dd_embed_cluster_incremental" -> ddEmbedClusterIncremental _,
      "dd_embed_cluster_store" -> ddEmbedClusterStore _,
      "dd_embed_cluster_fold_stored" -> ddEmbedClusterFoldStored _,
      "dd_embed_cluster_exact" -> ddEmbedClusterExact _,
      "dd_curation_funnel" -> ddCurationFunnel _,
      "dd_source_overlap" -> ddSourceOverlap _,
      "dd_lp_edges" -> ddLpEdges _
    )

  override val oracles: Map[String, String] = Map(
    "dd_exact" -> ddExactSql,
    "dd_jaccard" -> ddJaccardSql,
    "dd_decontaminate" -> ddDecontaminateSql,
    "dd_decontaminate_semantic" -> ddDecontaminateSemanticSql,
    "dd_containment" -> ddContainmentSql,
    "dd_minhash" -> ddMinhashSql,
    "dd_minhash_lsh" -> ddMinhashLshSql,
    "dd_simhash" -> ddSimhashSql,
    "dd_simhash_pairs" -> ddSimhashPairsSql,
    "dd_simhash64" -> ddSimhash64Sql,
    "dd_embed_cosine" -> ddEmbedCosineExactSql,
    "dd_embed_cosine_lsh" -> ddEmbedCosineLshSql,
    "dd_cluster" -> ddClusterSql,
    // supernode contraction is bit-identical to full re-clustering
    // (see ddClusterIncremental's component argument)
    "dd_cluster_incremental" -> ddClusterSql,
    "dd_containment_smallside" -> ddContainmentSql,
    "dd_span" -> ddSpanSql,
    "dd_incremental" -> ddIncrementalSql,
    // the Bloom-gated variant is bit-identical by construction
    "dd_incremental_bloom" -> ddIncrementalSql,
    "dd_threshold_sweep" -> ddThresholdSweepSql,
    // the stored prior: the old-half restriction of the closure oracle
    "dd_cluster_store" ->
      ddClusterSqlFor(" WHERE CAST(substr(source, 4) AS INT) < 10"),
    // the fold is bit-identical to batch re-clustering of everything
    "dd_cluster_fold_stored" -> ddClusterSql,
    "dd_semdedup" -> ddSemdedupSql,
    "dd_embed_cluster" -> ddEmbedClusterSql,
    // contraction is bit-identical to the full banded clustering
    "dd_embed_cluster_incremental" -> ddEmbedClusterSql,
    // the stored prior: the old-half restriction of the banded oracle
    "dd_embed_cluster_store" -> ddEmbedClusterStoreSql,
    // the fold is bit-identical to batch re-clustering of everything
    "dd_embed_cluster_fold_stored" -> ddEmbedClusterSql,
    "dd_lp_edges" -> ddLpEdgesSql,
    "dd_embed_cluster_exact" -> ddEmbedClusterExactSql,
    "dd_curation_funnel" -> ddCurationFunnelSql,
    "dd_source_overlap" -> ddSourceOverlapSql
  )
}

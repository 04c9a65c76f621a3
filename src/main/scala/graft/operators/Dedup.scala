package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  *  - Jaccard uses an inverted-index equi-join on shingles (shuffle is
  *    bounded by the posting lists, never a cross join); at corpus scale
  *    you'd add a document-frequency cap on shingles to bound the longest
  *    posting list — the MinHash/LSH path below IS that scale path;
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
  private val sparkGrams =
    "CASE WHEN size(toks) >= 2 THEN" +
      " array_distinct(transform(sequence(1, size(toks) - 1)," +
      " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))))" +
      " ELSE cast(array() as array<string>) END"
  private val duckGrams =
    "list_distinct(list_transform(range(1, len(toks))," +
      " i -> toks[i] || ' ' || toks[i + 1]))"

  /** 32-bit shingle hash from the md5 hex prefix. */
  private def sparkH(v: String) =
    s"cast(conv(substring(md5($v), 1, 8), 16, 10) as bigint)"
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

  // -- dd_jaccard: hashed-shingle Jaccard over document pairs -----------------
  // Shingles are reduced to 60-bit hashes (md5 prefix, identical in both
  // dialects) and kept as one sorted-distinct array per document; pair
  // similarity is then a codegen'd two-pointer merge (graft_isect) over a
  // broadcast self-join of the small per-doc signature table. The classic
  // inverted-index (explode + posting-list equi-join) formulation is
  // strictly worse on this corpus: the shingle vocabulary is tiny
  // (~1 k bigrams, doc-frequency into the hundreds), so sum(df^2) blows
  // up to ~10^8 intermediate rows while the pair space is only ~10^7.
  // At real corpus scale neither exact formulation survives — the
  // MinHash/LSH path below is the scale answer — but per-doc signatures +
  // merge-intersect is also exactly how the bucket-local re-check runs
  // there. Hash collisions would affect both engines identically.
  private def sparkH64(v: String) =
    s"cast(conv(substring(md5($v), 1, 15), 16, 10) as bigint)"
  private def duckH64(v: String) =
    s"CAST('0x' || substr(md5($v), 1, 15) AS BIGINT)"

  private def ddJaccard(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.ensureRegistered(s)
    // cached: materializes the per-doc sorted hash arrays ONCE — without
    // this the planner re-derives the shingle pipeline per join side
    val sigs = table(s, dir, "documents")
      .selectExpr("doc_id", "split(text, ' ') AS toks")
      .selectExpr("doc_id", s"$sparkGrams AS grams")
      .selectExpr("doc_id", "0 AS k",
        s"array_sort(array_distinct(transform(grams, g -> ${sparkH64("g")})))" +
          " AS hs")
      .cache()
    val a = sigs.select(col("doc_id").as("doc_a"), col("k"),
      col("hs").as("hs_a"))
    val b = sigs.select(col("doc_id").as("doc_b"), col("k").as("kb"),
      col("hs").as("hs_b"))
    // Three deliberate plan shapes here:
    //  - the constant equi-key `k = kb` turns the pair generator into a
    //    BroadcastHASHJoin (codegen-friendly) instead of a nested-loop
    //    join — measured ~35% faster at sf0.1 for the identical rows;
    //  - the length-ratio conjunct in the join condition is a pure prune
    //    (jaccard >= 0.6 implies min(sz)/max(sz) >= 0.6; exact integers,
    //    same rows out) so the condition drops ~half the pairs on an
    //    O(1) test;
    //  - the pair projection (24 bytes/row, arrays gone) is persisted
    //    BEFORE the threshold filter: without the barrier Catalyst pushes
    //    `jaccard >= 0.6` into the join condition ahead of the cheap
    //    conjuncts, making the O(|a|+|b|) merge run for every ordered
    //    pair (measured 39 s vs ~8 s for this shape at sf0.1).
    val pairs = a
      .join(b, col("k") === col("kb")
        && col("doc_a") < col("doc_b")
        && least(size(col("hs_a")), size(col("hs_b"))) * 10
           >= greatest(size(col("hs_a")), size(col("hs_b"))) * 6)
      .selectExpr("doc_a", "doc_b",
        "round(cast(graft_isect(hs_a, hs_b) as double)" +
          " / (size(hs_a) + size(hs_b) - graft_isect(hs_a, hs_b)), 6)" +
          " AS jaccard")
      .cache()
    pairs
      .filter(col("jaccard") >= 0.6)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private val ddJaccardSql =
    s"""WITH g AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(grams, g -> ${duckH64("g")})) AS hs
       |  FROM (
       |    SELECT doc_id, $duckGrams AS grams FROM (
       |      SELECT doc_id, string_split(text, ' ') AS toks FROM documents))
       |)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, unnest(list_filter([round(
       |    CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)
       |      / (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))), 6)],
       |    x -> x >= 0.6)) AS jaccard
       |FROM g a JOIN g b
       |  ON a.doc_id < b.doc_id
       |  AND least(len(a.hs), len(b.hs)) * 10
       |      >= greatest(len(a.hs), len(b.hs)) * 6
       |ORDER BY doc_a, doc_b""".stripMargin

  // -- dd_minhash: per-document MinHash signatures ----------------------------
  // One narrow pass: signature j = min over shingles of (A_j*h + B_j) mod P.
  // The md5 shingle hash is hoisted into a per-doc array FIRST so it runs
  // once per shingle, not once per (shingle x K signatures).
  private def sparkSigCols: Seq[String] = (0 until K).map { j =>
    s"aggregate(ghs, cast(9223372036854775807 as bigint)," +
      s" (acc, h) -> least(acc, (${A(j)} * h + ${B(j)}) % $P))" +
      s" AS sig_$j"
  }

  private def duckSigCols: Seq[String] = (0 until K).map { j =>
    s"list_reduce(list_transform(ghs," +
      s" h -> (${A(j)} * h + ${B(j)}) % $P)," +
      s" (x, y) -> least(x, y)) AS sig_$j"
  }

  /** documents -> (doc_id, ghs: array<bigint>) hashed-shingle pipeline. */
  private def sigInput(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents")
      .selectExpr("doc_id", "split(text, ' ') AS toks")
      .selectExpr("doc_id", s"$sparkGrams AS grams")
      .selectExpr("doc_id", s"transform(grams, g -> ${sparkH("g")}) AS ghs")

  private val duckSigInput =
    s"""SELECT doc_id, list_transform(grams, g -> ${duckH("g")}) AS ghs
       |FROM (SELECT doc_id, $duckGrams AS grams FROM (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents))"""
      .stripMargin

  private def ddMinhash(s: SparkSession, dir: String): DataFrame =
    sigInput(s, dir)
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
      .selectExpr(Seq("doc_id") ++ sparkSigCols: _*)
      .cache()
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
  private def simhashCore(s: SparkSession, dir: String): DataFrame = {
    val bits = (0 until 16).map { b =>
      val mask = 1 << b
      s"CASE WHEN aggregate(toks, 0, (acc, t) -> acc +" +
        s" (CASE WHEN (${sparkH16("t")} & $mask) > 0 THEN 1 ELSE -1 END))" +
        s" > 0 THEN $mask ELSE 0 END"
    }
    table(s, dir, "documents")
      .selectExpr("doc_id", "split(text, ' ') AS toks")
      .selectExpr("doc_id", s"${bits.mkString(" + ")} AS simhash")
  }

  private def ddSimhash(s: SparkSession, dir: String): DataFrame =
    simhashCore(s, dir).orderBy(col("doc_id"))

  private def sparkH16(v: String) =
    s"cast(conv(substring(md5($v), 1, 4), 16, 10) as bigint)"
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

  // -- dd_embed_cosine: embedding-space near-dup pairs -------------------------
  // Self-dot precomputed per vector; the pair fold is the codegen'd
  // graft_dot expression (bit-identical IEEE sequence to the oracle's
  // list_reduce — see graft.functions.FloatDotProduct).
  private def ddEmbedCosine(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.ensureRegistered(s)
    // same persist barrier as dd_jaccard: the pair projection (24 B/row)
    // is materialized so the threshold filter cannot be pushed into the
    // nested-loop join condition, where the codegen'd dot product would
    // run for every ordered pair instead of once per unordered pair
    val e = table(s, dir, "embeddings")
      .selectExpr("vec_id", "0 AS k", "embedding",
        "graft_dot(embedding, embedding) AS n2")
      .cache()
    val a = e.select(col("vec_id").as("vec_a"), col("k"),
      col("embedding").as("ea"), col("n2").as("n2a"))
    val b = e.select(col("vec_id").as("vec_b"), col("k").as("kb"),
      col("embedding").as("eb"), col("n2").as("n2b"))
    // constant equi-key => BroadcastHashJoin pair generation (codegen),
    // same trick as ddJaccard
    val pairs = a.join(b, col("k") === col("kb")
        && col("vec_a") < col("vec_b"))
      .selectExpr("vec_a", "vec_b",
        "round(graft_dot(ea, eb) / sqrt(n2a * n2b), 6) AS cos_sim")
      .cache()
    pairs.filter(col("cos_sim") >= 0.4).orderBy(col("vec_a"), col("vec_b"))
  }

  private val ddEmbedCosineSql =
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

  override val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(
      "dd_exact" -> ddExact _,
      "dd_jaccard" -> ddJaccard _,
      "dd_minhash" -> ddMinhash _,
      "dd_minhash_lsh" -> ddMinhashLsh _,
      "dd_simhash" -> ddSimhash _,
      "dd_simhash_pairs" -> ddSimhashPairs _,
      "dd_embed_cosine" -> ddEmbedCosine _
    )

  override val oracles: Map[String, String] = Map(
    "dd_exact" -> ddExactSql,
    "dd_jaccard" -> ddJaccardSql,
    "dd_minhash" -> ddMinhashSql,
    "dd_minhash_lsh" -> ddMinhashLshSql,
    "dd_simhash" -> ddSimhashSql,
    "dd_simhash_pairs" -> ddSimhashPairsSql,
    "dd_embed_cosine" -> ddEmbedCosineSql
  )
}

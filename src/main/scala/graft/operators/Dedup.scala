package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine._
import graft.QueryPack

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

  // -- dd_jaccard: exact n-gram Jaccard via inverted-index join ---------------
  private def ddJaccard(s: SparkSession, dir: String): DataFrame = {
    val grams = table(s, dir, "documents")
      .selectExpr("doc_id", "split(text, ' ') AS toks")
      .selectExpr("doc_id", s"$sparkGrams AS grams")
      .selectExpr("doc_id", "size(grams) AS sz", "explode(grams) AS gram")
    val a = grams.select(col("doc_id").as("doc_a"), col("sz").as("sz_a"),
      col("gram"))
    val b = grams.select(col("doc_id").as("doc_b"), col("sz").as("sz_b"),
      col("gram"))
    a.join(b, Seq("gram"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"), col("sz_a"), col("sz_b"))
      .agg(count(lit(1)).as("common"))
      .selectExpr("doc_a", "doc_b",
        "round(cast(common as double) / (sz_a + sz_b - common), 6) AS jaccard")
      .filter(col("jaccard") >= 0.6)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private val ddJaccardSql =
    s"""WITH g AS (
       |  SELECT doc_id, len(grams) AS sz, unnest(grams) AS gram FROM (
       |    SELECT doc_id, $duckGrams AS grams FROM (
       |      SELECT doc_id, string_split(text, ' ') AS toks FROM documents))
       |)
       |SELECT doc_a, doc_b,
       |  round(CAST(common AS DOUBLE) / (sz_a + sz_b - common), 6) AS jaccard
       |FROM (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sz AS sz_a,
       |    b.sz AS sz_b, COUNT(*) AS common
       |  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2, 3, 4)
       |WHERE round(CAST(common AS DOUBLE) / (sz_a + sz_b - common), 6) >= 0.6
       |ORDER BY doc_a, doc_b""".stripMargin

  // -- dd_minhash: per-document MinHash signatures ----------------------------
  // One narrow pass: signature j = min over shingles of (A_j*h + B_j) mod P.
  private def sparkSigCols: Seq[String] = (0 until K).map { j =>
    s"aggregate(grams, cast(9223372036854775807 as bigint)," +
      s" (acc, g) -> least(acc, (${A(j)} * ${sparkH("g")} + ${B(j)}) % $P))" +
      s" AS sig_$j"
  }

  private def duckSigCols: Seq[String] = (0 until K).map { j =>
    s"list_reduce(list_transform(grams," +
      s" g -> (${A(j)} * ${duckH("g")} + ${B(j)}) % $P)," +
      s" (x, y) -> least(x, y)) AS sig_$j"
  }

  private def ddMinhash(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents")
      .selectExpr("doc_id", "split(text, ' ') AS toks")
      .selectExpr("doc_id", s"$sparkGrams AS grams")
      .selectExpr(Seq("doc_id") ++ sparkSigCols: _*)
      .orderBy(col("doc_id"))

  private val ddMinhashSql =
    s"""SELECT doc_id, ${(0 until K).map("sig_" + _).mkString(", ")} FROM (
       |  SELECT doc_id, ${duckSigCols.mkString(", ")} FROM (
       |    SELECT doc_id, $duckGrams AS grams FROM (
       |      SELECT doc_id, string_split(text, ' ') AS toks FROM documents)))
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
    val sigs = table(s, dir, "documents")
      .selectExpr("doc_id", "split(text, ' ') AS toks")
      .selectExpr("doc_id", s"$sparkGrams AS grams")
      .selectExpr(Seq("doc_id") ++ sparkSigCols: _*)
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
       |  SELECT doc_id, ${duckSigCols.mkString(", ")} FROM (
       |    SELECT doc_id, $duckGrams AS grams FROM (
       |      SELECT doc_id, string_split(text, ' ') AS toks FROM documents))),
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
  private def ddSimhash(s: SparkSession, dir: String): DataFrame = {
    val bits = (0 until 16).map { b =>
      val mask = 1 << b
      s"CASE WHEN aggregate(toks, 0, (acc, t) -> acc +" +
        s" (CASE WHEN (${sparkH16("t")} & $mask) > 0 THEN 1 ELSE -1 END))" +
        s" > 0 THEN $mask ELSE 0 END"
    }
    table(s, dir, "documents")
      .selectExpr("doc_id", "split(text, ' ') AS toks")
      .selectExpr("doc_id", s"${bits.mkString(" + ")} AS simhash")
      .orderBy(col("doc_id"))
  }

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
    ddSimhash(s, dir).createOrReplaceTempView("dd_sim")
    s.sql(
      """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  cast(bit_count(a.simhash ^ b.simhash) as int) AS hamming
        |FROM dd_sim a JOIN dd_sim b ON a.doc_id < b.doc_id
        |WHERE bit_count(a.simhash ^ b.simhash) <= 2
        |ORDER BY doc_a, doc_b""".stripMargin)
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
  // Self-dot precomputed per vector; the pair loop is one IEEE fold whose
  // shape matches the oracle exactly.
  private def ddEmbedCosine(s: SparkSession, dir: String): DataFrame = {
    table(s, dir, "embeddings")
      .selectExpr("vec_id", "embedding",
        "aggregate(zip_with(embedding, embedding," +
          " (x, y) -> cast(x as double) * cast(y as double))," +
          " cast(0.0 as double), (acc, v) -> acc + v) AS n2")
      .createOrReplaceTempView("dd_emb")
    s.sql(
      """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  round(aggregate(zip_with(a.embedding, b.embedding,
        |          (x, y) -> cast(x as double) * cast(y as double)),
        |        cast(0.0 as double), (acc, v) -> acc + v)
        |    / sqrt(a.n2 * b.n2), 6) AS cos_sim
        |FROM dd_emb a JOIN dd_emb b ON a.vec_id < b.vec_id
        |WHERE round(aggregate(zip_with(a.embedding, b.embedding,
        |          (x, y) -> cast(x as double) * cast(y as double)),
        |        cast(0.0 as double), (acc, v) -> acc + v)
        |    / sqrt(a.n2 * b.n2), 6) >= 0.4
        |ORDER BY vec_a, vec_b""".stripMargin)
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

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/** Fused single-pass kernels behind graft's sketching expressions.
  *
  * Each method is the exact arithmetic of a higher-order-function
  * pipeline the operators previously ran per signature/plane/bit —
  * K (or 60, or 16) separate interpreted `aggregate` folds per row —
  * collapsed into one compiled loop. The DuckDB oracle SQL keeps the
  * unfused per-column formulas; results are identical because every
  * kernel is either pure integer arithmetic (minhash, simhash) or the
  * same IEEE sequence per plane (rh: cast-to-double, multiply, add
  * left-to-right from 0.0).
  *
  * Plain object (no companion class) so Scala emits static forwarders —
  * generated Java can call `graft.functions.GraftHashes.minhash16(...)`
  * directly inside whole-stage codegen.
  */
object GraftHashes {

  /** md5-hex-prefix hash: the value of
    * `cast(conv(substring(md5(s), 1, nibbles), 16, 10) as bigint)` —
    * i.e. the first `nibbles` hex digits of the md5 of the UTF-8 bytes,
    * read as an unsigned base-16 integer — WITHOUT materializing the
    * 32-char hex string or re-parsing it. The dedup pack computes this
    * per shingle (~n_tokens per document, corpus-wide), so skipping the
    * two string passes is the dominant per-row saving. nibbles <= 15
    * keeps the value in a positive long, exactly like conv's digit fold.
    */
  private val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** Single-pass content-defined-chunking boundary scan: the sorted
    * distinct 1-based end positions `{ i+3 | graft_h32(substr(text,i,4))
    * % 64 == 0 } ∪ {numChars}` — exactly the HOF formulation in
    * txt_cdc_chunks, fused so one row costs one byte-offset walk and one
    * MessageDigest per window instead of an interpreted
    * transform/filter/distinct/sort pipeline with a substring allocation
    * per position. `% 64 == 0` on the 8-nibble (4-byte big-endian) md5
    * prefix is equivalent to the low 6 bits of digest byte 3 being zero,
    * so the long is never materialized.
    */
  /** char -> starting byte offset table (UTF-8-safe window slicing),
    * computed ONCE per row — shared by [[cdcEnds]] and [[charNgrams]]
    * so every windowed kernel slices by offset instead of re-walking
    * bytes from position 0 per window.
    */
  private def charOffsets(bytes: Array[Byte], nChars: Int): Array[Int] = {
    val offs = new Array[Int](nChars + 1)
    var b = 0
    var c = 0
    while (c < nChars) {
      offs(c) = b
      b += org.apache.spark.unsafe.types.UTF8String
        .numBytesForFirstByte(bytes(b))
      c += 1
    }
    offs(nChars) = bytes.length
    offs
  }

  def cdcEnds(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val bytes = s.getBytes
    val nChars = s.numChars()
    val offs = charOffsets(bytes, nChars)
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    val d = md5Local.get()
    var i = 0 // 0-based window start; 1-based end = i + 4
    while (i + 4 <= nChars) {
      d.reset()
      d.update(bytes, offs(i), offs(i + 4) - offs(i))
      if ((d.digest()(3) & 0x3F) == 0) out += (i + 4)
      i += 1
    }
    // boundaries are generated in ascending order; only the final
    // document end can collide with the last content boundary
    if (out.isEmpty || out.last != nChars) out += nChars
    new GenericArrayData(out.toArray)
  }

  /** All character n-grams in order (see [[CharNgrams]]). Slices by
    * the precomputed offset table: UTF8String.substring(i, i+n)
    * re-walks byte offsets from position 0 per call, which turned a
    * 100 KB document into ~5e9 byte inspections (O(len²)) on the
    * dedup/text hot path — one offs[] walk makes it linear, the same
    * fix [[cdcEnds]] always had.
    */
  def charNgrams(s: org.apache.spark.unsafe.types.UTF8String,
                 n: Int): ArrayData = {
    val nChars = s.numChars()
    if (nChars < n) return new GenericArrayData(Array.empty[Any])
    val bytes = s.getBytes
    val offs = charOffsets(bytes, nChars)
    val out = new Array[Any](nChars - n + 1)
    var i = 0
    while (i + n <= nChars) {
      out(i) = org.apache.spark.unsafe.types.UTF8String
        .fromBytes(bytes, offs(i), offs(i + n) - offs(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** First-occurrence-distinct word bigrams (see [[WordBigrams]]):
    * `array_distinct(transform(sequence(1, n-1), i ->
    * concat(toks[i], ' ', toks[i+1])))` in ONE compiled pass — no
    * per-element interpreted lambda, no sequence array, no second
    * distinct pass. A LinkedHashSet keeps exactly the HOF's
    * first-occurrence order.
    */
  private val spaceUtf8 =
    org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  def wordBigrams(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[
      org.apache.spark.unsafe.types.UTF8String](n * 2)
    var i = 0
    while (i < n - 1) {
      seen.add(org.apache.spark.unsafe.types.UTF8String.concat(
        arr.getUTF8String(i), spaceUtf8, arr.getUTF8String(i + 1)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  /** First-occurrence-distinct space-joined word n-grams (see
    * [[WordNgrams]]): the distinct set of
    * `array_join(slice(toks, i, n), ' ')` over every window, in one
    * compiled pass. concatWs SKIPS null inputs exactly like
    * array_join skips null elements, so the two agree on null tokens
    * too; the output strings themselves are never null.
    */
  def wordNgrams(arr: ArrayData, n: Int): ArrayData = {
    val sz = arr.numElements()
    if (sz < n) return new GenericArrayData(Array.empty[Any])
    val toks =
      new Array[org.apache.spark.unsafe.types.UTF8String](sz)
    var i = 0
    while (i < sz) { toks(i) = arr.getUTF8String(i); i += 1 }
    val seen = new java.util.LinkedHashSet[
      org.apache.spark.unsafe.types.UTF8String](sz * 2)
    i = 0
    while (i + n <= sz) {
      seen.add(org.apache.spark.unsafe.types.UTF8String.concatWs(
        spaceUtf8, java.util.Arrays.copyOfRange(toks, i, i + n): _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  def md5Prefix(s: org.apache.spark.unsafe.types.UTF8String,
                nibbles: Int): Long = {
    val d = md5Local.get()
    d.reset()
    val b = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < nibbles) {
      val byte = b(i >> 1) & 0xFF
      val nib = if ((i & 1) == 0) byte >>> 4 else byte & 0xF
      v = (v << 4) | nib
      i += 1
    }
    v
  }

  /** [[md5Prefix]] generalized to an arbitrary hex-digit window:
    * digits [startNibble, startNibble + nNibbles) of the md5 hex
    * string (1-based start, mirroring SQL `substring`), folded as an
    * unsigned base-16 integer. `md5Prefix(s, n) == md5Segment(s, 1, n)`.
    */
  def md5Segment(s: org.apache.spark.unsafe.types.UTF8String,
                 startNibble: Int, nNibbles: Int): Long = {
    val d = md5Local.get()
    d.reset()
    val b = d.digest(s.getBytes)
    var v = 0L
    var i = startNibble - 1
    val end = i + nNibbles
    while (i < end) {
      val byte = b(i >> 1) & 0xFF
      val nib = if ((i & 1) == 0) byte >>> 4 else byte & 0xF
      v = (v << 4) | nib
      i += 1
    }
    v
  }

  /** Per-element [[md5Segment]] over an `array<string>`, order- and
    * null-preserving — the fused form of
    * `transform(arr, x -> graft_hN(x))`, whose interpreted lambda paid
    * an eval + boxing per element.
    */
  def md5SegmentArray(arr: ArrayData, startNibble: Int,
                      nNibbles: Int): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i))
        out(i) = md5Segment(arr.getUTF8String(i), startNibble, nNibbles)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Sorted distinct md5-prefix hashes of an `array<string>` — the
    * fused form of
    * `array_sort(array_distinct(transform(arr, x -> graft_hN(x))))`:
    * one digest pass, one primitive sort, in-place dedup. Mirrors the
    * unfused semantics on nulls too (distinct keeps one null,
    * ascending sort places it last), though call sites never produce
    * null elements.
    */
  def md5PrefixSortedDistinct(arr: ArrayData, nibbles: Int): ArrayData = {
    val n = arr.numElements()
    val tmp = new Array[Long](n)
    var m = 0
    var hasNull = false
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) hasNull = true
      else {
        tmp(m) = md5Segment(arr.getUTF8String(i), 1, nibbles)
        m += 1
      }
      i += 1
    }
    java.util.Arrays.sort(tmp, 0, m)
    var w = 0
    var k = 0
    while (k < m) {
      if (w == 0 || tmp(k) != tmp(w - 1)) { tmp(w) = tmp(k); w += 1 }
      k += 1
    }
    val out = new Array[Any](w + (if (hasNull) 1 else 0))
    var j = 0
    while (j < w) { out(j) = tmp(j); j += 1 }
    new GenericArrayData(out)
  }

  /** MinHash family (mirrors Dedup's oracle constants):
    * sig_j = min over h of (A_j*h + B_j) mod P, A_j/B_j mod 65521,
    * P = 2^31-1; empty input folds to the Long.MaxValue init, exactly
    * like `aggregate(ghs, 9223372036854775807, least(...))`. Null
    * elements are SKIPPED — `least(m, null)` keeps `m` in the unfused
    * fold, so the fused kernel must too (call sites carry
    * containsNull=true statically even though shingle arrays are dense).
    */
  private val K = 16
  private val P = 2147483647L
  private val As = Array.tabulate(K)(j => (1103515245L * (j + 1)) % 65521L)
  private val Bs = Array.tabulate(K)(j => (12345L * (j + 17)) % 65521L)

  def minhash16(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](K)
    var j = 0
    while (j < K) {
      val aj = As(j)
      val bj = Bs(j)
      var m = Long.MaxValue
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val v = (aj * arr.getLong(i) + bj) % P
          if (v < m) m = v
        }
        i += 1
      }
      out(j) = m
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Random-hyperplane buckets (mirrors Dedup.ddEmbedCosine's oracle):
    * 12 bands x 5 sign bits; plane j at 1-based component i has integer
    * weight ((j+1)*2654435761 + 40503*i) mod 97 - 48; each plane's dot
    * is the left fold `0.0 + v_1*w_1 + ...` in index order — the same
    * IEEE sequence as the HOF/`list_reduce` formulation.
    */
  private val CosBands = 12
  private val CosRows = 5

  def rhBuckets(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    // A null component nulls every plane's dot in the unfused fold
    // (`acc + null = null`), and `CASE WHEN null > 0` takes the ELSE
    // branch — every sign bit 0. Mirror that: all-zero buckets.
    var pre = 0
    while (pre < n) {
      if (arr.isNullAt(pre)) {
        return new GenericArrayData(new Array[Int](CosBands))
      }
      pre += 1
    }
    val out = new Array[Int](CosBands)
    var b = 0
    while (b < CosBands) {
      var bucket = 0
      var k = 0
      while (k < CosRows) {
        val j = b * CosRows + k
        val cj = (j + 1) * 2654435761L
        var acc = 0.0
        var i = 1
        while (i <= n) {
          acc += arr.getFloat(i - 1).toDouble *
            ((cj + 40503L * i) % 97L - 48L).toDouble
          i += 1
        }
        if (acc > 0) bucket |= 1 << k
        k += 1
      }
      out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Parameterized random-hyperplane buckets — the corpus-scale tuning
    * knob the fixed 12x5 default cannot provide. With `2^rows` buckets
    * per band, two UNRELATED vectors collide in a band with probability
    * `2^-rows`, so expected noise candidates are `bands * n^2 /
    * 2^(rows+1)` — quadratic in corpus size n unless `rows` grows with
    * `log2(n)` (size `rows ~ log2(n / bands)` to hold per-vector noise
    * candidates at O(bands)). Recall at per-plane sign agreement `a` is
    * `1 - (1 - a^rows)^bands`, so `bands` must grow alongside `rows` to
    * hold recall in the near-dup regime (e.g. cos 0.9 -> a = 0.857:
    * 12x5 gives 0.998; 24x10 gives 0.90; 48x10 gives 0.99). Plane `j`
    * at 1-based component `i` weighs
    * `((j+1)*2654435761 + 40503*i) mod 9973 - 4986` — the same LCG
    * shape as [[rhBuckets]]'s 97-period family, with a prime period
    * larger than any practical `bands*rows`. The fixed 12x5 family
    * stays THE fixture/oracle path (its weights are baked into the
    * DuckDB restatements); this one is the deployment knob, pinned by
    * LshScalingSpec's candidate-volume and recall assertions.
    */
  def rhBucketsN(arr: ArrayData, bands: Int, rows: Int): ArrayData = {
    val n = arr.numElements()
    var pre = 0
    while (pre < n) {
      if (arr.isNullAt(pre)) {
        return new GenericArrayData(new Array[Int](bands))
      }
      pre += 1
    }
    val out = new Array[Int](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0
      var k = 0
      while (k < rows) {
        val j = b * rows + k
        val cj = (j + 1) * 2654435761L
        var acc = 0.0
        var i = 1
        while (i <= n) {
          acc += arr.getFloat(i - 1).toDouble *
            ((cj + 40503L * i) % 9973L - 4986L).toDouble
          i += 1
        }
        if (acc > 0) bucket |= 1 << k
        k += 1
      }
      out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash over pre-hashed token halves: the token's 64-bit hash
    * is lo | (hi << 32) (two 32-bit md5 prefixes); counter_b sums +/-1
    * per token on bit b and the result sets bit b when counter_b > 0 —
    * bit 63 lands in the sign bit, which is fine: downstream banding and
    * Hamming arithmetic are two's-complement-safe in both engines.
    *
    * The halves must be element-aligned views of one token list: a length
    * mismatch is a caller bug and raises rather than reading undefined
    * values off the end of the shorter array. A null in either half makes
    * the token's CASE test null in the unfused per-bit fold — ELSE -1 on
    * every counter — and is mirrored here.
    */
  def simhash64(lo: ArrayData, hi: ArrayData): Long = {
    val n = lo.numElements()
    require(hi.numElements() == n,
      s"graft_simhash64: length mismatch (lo=$n, hi=${hi.numElements()})")
    val counters = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (lo.isNullAt(i) || hi.isNullAt(i)) {
        var b = 0
        while (b < 64) { counters(b) -= 1; b += 1 }
      } else {
        val h = (hi.getLong(i) << 32) | lo.getLong(i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  /** 16-bit SimHash over pre-hashed tokens: counter_b = sum of +/-1 per
    * token depending on bit b of the token hash (integer addition —
    * order-independent, so one pass equals 16 per-bit folds), result
    * sets bit b when counter_b > 0. A null token hash nulls the CASE
    * test in the unfused fold — ELSE -1 on every counter — mirrored
    * here.
    */
  def simhash16(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counters = new Array[Int](16)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        var b = 0
        while (b < 16) { counters(b) -= 1; b += 1 }
      } else {
        val h = arr.getLong(i)
        var b = 0
        while (b < 16) {
          if (((h >> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 16) {
      if (counters(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }
}

/** `graft_h16/h32/h64(s)` — the first 4/8/15 md5 hex digits of a string
  * as an unsigned bigint, fused (digest -> integer, no hex-string
  * round-trip). Value-identical to the conv(substring(md5(..)))
  * chain it replaces and to the DuckDB oracles'
  * `CAST('0x' || substr(md5(..), 1, n) AS BIGINT)`.
  */
case class Md5PrefixHash(child: Expression, nibbles: Int)
    extends UnaryExpression {

  require(nibbles > 0 && nibbles <= 15,
    s"md5 prefix must fit a positive long, got $nibbles nibbles")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${t.sql}")
  }

  override def dataType: DataType = LongType

  // the registry advertises the 15-nibble variant as 64-bit
  // ("graft_h64"); nibbles*4 would render a "graft_h60" that exists in
  // no registry, confusing EXPLAIN output and type-check errors
  override def prettyName: String =
    s"graft_h${if (nibbles == 15) 64 else nibbles * 4}"

  override protected def nullSafeEval(a: Any): Any =
    GraftHashes.md5Prefix(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], nibbles)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftHashes.md5Prefix($c, $nibbles)")

  override protected def withNewChildInternal(
      newChild: Expression): Md5PrefixHash = copy(child = newChild)
}

/** `graft_h{16,32}a(arr)` / `graft_h32b(arr)` — per-element md5
  * hex-segment hash of an `array<string>`, the fused form of
  * `transform(arr, x -> graft_hN(x))` (and, for the `b` variant, of
  * the hex-digits-9..16 `conv(substring(md5(x), 9, 8), 16, 10)` HOF).
  * `ArrayTransform` evaluates its lambda interpreted per element; this
  * keeps the map inside whole-stage codegen, one digest per element
  * and no per-element boxing of the lambda variable.
  */
case class Md5SegmentHashArray(child: Expression, startNibble: Int,
                               nibbles: Int) extends UnaryExpression {

  require(startNibble >= 1 && nibbles > 0 && startNibble + nibbles <= 33
    && nibbles <= 15,
    s"md5 segment must fit the digest and a positive long, " +
      s"got start $startNibble width $nibbles")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${t.sql}")
  }

  override def dataType: DataType = child.dataType match {
    case ArrayType(_, n) => ArrayType(LongType, containsNull = n)
    case _ => ArrayType(LongType)
  }

  override def prettyName: String =
    if (startNibble == 1) s"graft_h${nibbles * 4}a"
    else s"graft_h${nibbles * 4}b"

  override protected def nullSafeEval(a: Any): Any =
    GraftHashes.md5SegmentArray(
      a.asInstanceOf[ArrayData], startNibble, nibbles)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraftHashes.md5SegmentArray($c, $startNibble, $nibbles)")

  override protected def withNewChildInternal(
      newChild: Expression): Md5SegmentHashArray = copy(child = newChild)
}

/** `graft_h64sd(arr)` — sorted distinct md5-prefix hashes of an
  * `array<string>`: the fused form of
  * `array_sort(array_distinct(transform(arr, x -> graft_h64(x))))`,
  * which ran an interpreted lambda per element plus two more
  * interpreted array passes. One compiled pass builds the per-doc
  * sorted shingle-hash set every banded dedup relation carries.
  */
case class Md5PrefixSortedDistinct(child: Expression, nibbles: Int)
    extends UnaryExpression {

  require(nibbles > 0 && nibbles <= 15,
    s"md5 prefix must fit a positive long, got $nibbles nibbles")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${t.sql}")
  }

  override def dataType: DataType = child.dataType match {
    case ArrayType(_, n) => ArrayType(LongType, containsNull = n)
    case _ => ArrayType(LongType)
  }

  // same 15-nibbles-advertised-as-64-bit registry convention as
  // [[Md5PrefixHash]]
  override def prettyName: String =
    s"graft_h${if (nibbles == 15) 64 else nibbles * 4}sd"

  override protected def nullSafeEval(a: Any): Any =
    GraftHashes.md5PrefixSortedDistinct(a.asInstanceOf[ArrayData], nibbles)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraftHashes.md5PrefixSortedDistinct($c, $nibbles)")

  override protected def withNewChildInternal(
      newChild: Expression): Md5PrefixSortedDistinct = copy(child = newChild)
}

/** `graft_char_ngrams(text)` for a compile-time n — every character
  * n-gram of the input in order (NOT distinct: downstream counts
  * frequencies). Replaces the interpreted
  * `transform(sequence(1, length(text) - n + 1), i -> substring(text,
  * i, n))` HOF, which paid a lambda eval per character; this is one
  * char-offset walk with UTF8String slices.
  */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"ngram width must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${t.sql}")
  }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  override def prettyName: String = s"graft_char${n}grams"

  override protected def nullSafeEval(a: Any): Any =
    GraftHashes.charNgrams(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftHashes.charNgrams($c, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): CharNgrams = copy(child = newChild)
}

/** `graft_bigrams(toks)` — the dedup pack's word-bigram shingles:
  * first-occurrence-distinct `concat(toks[i], ' ', toks[i+1])`, the
  * fused form of the `array_distinct(transform(sequence(...), i ->
  * concat(element_at ...)))` HOF that headed EVERY jaccard-family
  * signature pipeline (corpus scans, fold increments, the streaming
  * ingest batches). `ArrayTransform` is CodegenFallback — the old head
  * paid an interpreted lambda eval per token plus a sequence
  * materialization and a second distinct pass, per document, on the
  * hottest kernel chain in the engine. Callers keep the `size(toks) >=
  * 2` CASE guard (null-toks parity with the legacy HOF); the kernel's
  * own n < 2 early-out makes the guard semantic, not protective.
  */
case class WordBigrams(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${t.sql}")
  }

  // Nullability PROPAGATES from the input's elements (r22): a null
  // token flows UTF8String.concat(null, …) = null into the output set
  // (the LinkedHashSet dedupes it to one first-occurrence null —
  // exactly what the legacy HOF's array_distinct did), so declaring
  // containsNull=false here would let downstream codegen miscompile
  // against a null element. The engine's own call sites feed split()
  // output (never null elements) and are unaffected; the guard is for
  // graft_bigrams' registry exposure to arbitrary callers.
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StringType,
    containsNull = child.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    })

  override def prettyName: String = "graft_bigrams"

  override protected def nullSafeEval(a: Any): Any =
    GraftHashes.wordBigrams(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftHashes.wordBigrams($c)")

  override protected def withNewChildInternal(
      newChild: Expression): WordBigrams = copy(child = newChild)
}

/** `graft_word<n>grams(toks)` — first-occurrence-distinct space-joined
  * word n-grams for a compile-time n: the DISTINCT SET of
  * `array_join(slice(toks, i, n), ' ')` over every window, fused into
  * one compiled pass (r22, for txt_novelty: computing a document's
  * distinct gram set map-side is what lets the per-corpus
  * explode→DISTINCT exchange of gram strings disappear — the set is
  * derivable inside the document's own row). Output elements are never
  * null (concatWs skips null inputs, exactly like array_join skips
  * null elements), so containsNull=false holds for any input.
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"ngram width must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${t.sql}")
  }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  override def prettyName: String = s"graft_word${n}grams"

  override protected def nullSafeEval(a: Any): Any =
    GraftHashes.wordNgrams(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftHashes.wordNgrams($c, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): WordNgrams = copy(child = newChild)
}

/** `graft_cdc_ends(text)` — content-defined chunk end positions (sorted
  * distinct, 1-based, document end included) in one compiled pass. See
  * [[GraftHashes.cdcEnds]]; consumed by txt_cdc_chunks in place of its
  * original per-position HOF scan.
  */
case class CdcEnds(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_cdc_ends expects string, got ${t.sql}")
  }

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_cdc_ends"

  override protected def nullSafeEval(a: Any): Any =
    GraftHashes.cdcEnds(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftHashes.cdcEnds($c)")

  override protected def withNewChildInternal(
      newChild: Expression): CdcEnds = copy(child = newChild)
}

/** `graft_minhash16(ghs)` — all 16 MinHash signatures of a hashed-shingle
  * array in one compiled pass (replaces 16 interpreted `aggregate` folds
  * per document).
  */
case class MinhashSignatures(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash16 expects array<bigint>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_minhash16"

  override protected def nullSafeEval(a: Any): Any =
    GraftHashes.minhash16(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftHashes.minhash16($c)")

  override protected def withNewChildInternal(
      newChild: Expression): MinhashSignatures = copy(child = newChild)
}

/** `graft_rh_buckets(embedding)` — the 12 banded random-hyperplane LSH
  * buckets of a float vector in one compiled pass (replaces 60
  * interpreted plane folds per vector).
  */
case class RhLshBuckets(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_rh_buckets expects array<float>, got ${t.sql}")
  }

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_rh_buckets"

  override protected def nullSafeEval(a: Any): Any =
    GraftHashes.rhBuckets(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftHashes.rhBuckets($c)")

  override protected def withNewChildInternal(
      newChild: Expression): RhLshBuckets = copy(child = newChild)
}

/** `graft_rh_buckets_n(embedding, bands, rows)` — parameterized banded
  * random-hyperplane buckets (see [[GraftHashes.rhBucketsN]] for the
  * scaling rule). `bands`/`rows` must be foldable integer literals;
  * `rows` is capped at 30 so the bucket fits an Int without touching
  * the sign bit.
  */
case class RhLshBucketsN(first: Expression, second: Expression,
                         third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), IntegerType, IntegerType)
          if second.foldable && third.foldable =>
        // bounds-check HERE, not per row: rows > 30 would shift into
        // the Int sign bit, bands < 1 yields an empty signature
        val bands = second.eval()
        val rows = third.eval()
        if (bands == null || rows == null ||
            bands.asInstanceOf[Int] < 1 ||
            rows.asInstanceOf[Int] < 1 || rows.asInstanceOf[Int] > 30)
          TypeCheckResult.TypeCheckFailure(
            s"graft_rh_buckets_n needs bands >= 1 and rows in [1, 30]," +
              s" got ($bands, $rows)")
        else TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_rh_buckets_n expects (array<float>, int literal, " +
          s"int literal), got (${first.dataType.sql}, " +
          s"${second.dataType.sql}, ${third.dataType.sql})")
    }

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_rh_buckets_n"

  override protected def nullSafeEval(a: Any, b: Any, r: Any): Any =
    GraftHashes.rhBucketsN(a.asInstanceOf[ArrayData],
      b.asInstanceOf[Int], r.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, r) =>
      s"graft.functions.GraftHashes.rhBucketsN($a, $b, $r)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): RhLshBucketsN =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `graft_simhash64(lo, hi)` — 64-bit SimHash of two pre-hashed 32-bit
  * token-hash arrays in one compiled pass (the unfused equivalent is 64
  * interpreted per-bit folds with an md5 per token PER BIT).
  */
case class Simhash64(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash64 expects (array<bigint>, array<bigint>), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftHashes.simhash64(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.GraftHashes.simhash64($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Simhash64 =
    copy(left = newLeft, right = newRight)
}

/** `graft_simhash16(hts)` — 16-bit SimHash of a pre-hashed token array in
  * one compiled pass (replaces 16 interpreted per-bit folds, and lets the
  * caller hash each token ONCE instead of once per bit).
  */
case class Simhash16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash16 expects array<bigint>, got ${t.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash16"

  override protected def nullSafeEval(a: Any): Any =
    GraftHashes.simhash16(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftHashes.simhash16($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Simhash16 = copy(child = newChild)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Imperative JVM kernels behind the dedup/similarity hot-path
  * expressions, plus the Catalyst `Expression` wrappers that call them.
  *
  * Why this layer exists: Spark's higher-order functions (`transform`,
  * `aggregate`, `zip_with`) are evaluated INTERPRETED, one closure call
  * per element. A MinHash signature written as
  * `transform(seq(0..63), j -> array_min(transform(shingles, h -> hash)))`
  * costs 64 × |shingles| interpreted expression evaluations per row —
  * measured 356 s for the sf0.1 dedup query. The same math as a tight
  * static JVM loop is ~100× faster, and calling a static method from
  * `doGenCode` keeps the surrounding projection inside whole-stage
  * codegen (the kernel call is a single generated-Java statement).
  *
  * Every kernel is deterministic (fixed seeds), allocation-light, and
  * embarrassingly parallel per row — the properties that let the scan →
  * project stage stream at 100 TB with zero shuffle.
  */
object Kernels {

  // ---- MinHash -----------------------------------------------------------

  val MinHashK = 64

  /** Fixed per-permutation multipliers/offsets (LCG-family minhash:
    * h_j(x) = A(j)*x + B(j) over Z/2^64; A odd). Seeded once. */
  private val (permA, permB) = {
    val rng = new java.util.Random(0x5eed5eedL)
    val a = Array.fill(MinHashK)(rng.nextLong() | 1L)
    val b = Array.fill(MinHashK)(rng.nextLong())
    (a, b)
  }

  /** The permutation constants, exposed for the DuckDB oracle generator
    * ([[graft.queries.MinhashOracle]]) so the replayed SQL stays in sync
    * with the seed by construction. */
  private[graft] def minhashPermA: Array[Long] = permA.clone()
  private[graft] def minhashPermB: Array[Long] = permB.clone()

  @inline private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= (x >>> 33); x *= 0xff51afd7ed558ccdL
    x ^= (x >>> 33); x *= 0xc4ceb9fe1a85ec53L
    x ^= (x >>> 33)
    x
  }

  @inline private def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      h ^= (c & 0xffL); h *= 0x100000001b3L
      if (c > 0xff) { h ^= ((c >> 8) & 0xffL); h *= 0x100000001b3L }
      i += 1
    }
    h
  }

  /** Whitespace tokens of the trimmed text with SPARK's semantics for
    * BOTH steps of `split(trim(text), "\\s+")`: trim strips the ASCII
    * space (U+0020) ONLY (`UTF8String.trim`, ≡ SQL TRIM ≡ DuckDB trim
    * on ASCII — Java's `String.trim` strips every char ≤ U+0020, which
    * made the kernels tokenize "\tx" as ["x"] where the composed form
    * and the DuckDB oracles both see ["", "x"]), and split KEEPS
    * trailing empty fields (Spark's `split` passes limit -1; Java's
    * default limit 0 drops them, turning "x\t" into ["x"] instead of
    * ["x", ""]). The kernel ≡ Spark-composed alignment holds for ALL
    * of Java-regex \s; the ≡ DuckDB leg holds for [\t\n\f\r ] only —
    * DuckDB's RE2 \s does NOT match vertical tab U+000B where Java/
    * Spark's does, so VT joins non-ASCII whitespace on the documented
    * corpus-exclusion list (MinhashOracle's header). The generated
    * fixtures never exercise any of these edges (pure ASCII, no
    * leading/trailing control chars) but a real scraped corpus does —
    * KernelFuzzSpec pins the kernel-vs-Spark alignment on randomized
    * control-char text. Empty after trim → no tokens here; kernels
    * that need Spark's one-empty-token shape add it at the call site. */
  private def toks(s: UTF8String): Array[String] = {
    val t = s.trim.toString
    if (t.isEmpty) Array.empty else t.split("\\s+", -1)
  }

  /** 64-long MinHash signature over word-trigram shingles of the text.
    * Shingle hash = mixed combination of the three token FNV hashes
    * (no intermediate gram strings are built); duplicates need no
    * dedup — min over a multiset equals min over its set. */
  def minhashSig(text: UTF8String): ArrayData = {
    val tk = toks(text)
    val nTok = tk.length
    val sig = new Array[Long](MinHashK)
    java.util.Arrays.fill(sig, Long.MaxValue)
    // Empty/whitespace-only text has no shingles: the all-MaxValue
    // signature stands in (any two empty docs agree fully — they ARE
    // duplicates — and an empty doc never beats a real min).
    if (nTok == 0) return new GenericArrayData(sig)
    val th = new Array[Long](nTok)
    var i = 0
    while (i < nTok) { th(i) = fnv64(tk(i)); i += 1 }
    val nSh = math.max(nTok - 2, 1) // <3 tokens → one clamped shingle
    var s = 0
    while (s < nSh) {
      var h = th(s)
      if (s + 1 < nTok) h = h * 0x100000001b3L ^ th(s + 1)
      if (s + 2 < nTok) h = h * 0x100000001b3L ^ th(s + 2)
      val base = fmix64(h)
      var j = 0
      while (j < MinHashK) {
        val v = base * permA(j) + permB(j)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      s += 1
    }
    new GenericArrayData(sig)
  }

  /** Fraction of agreeing positions between two equal-length signatures —
    * the unbiased Jaccard estimate for MinHash. */
  def sigAgree(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    if (n == 0) return 0.0
    var same = 0
    var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) same += 1; i += 1 }
    same.toDouble / n
  }

  // ---- SimHash -----------------------------------------------------------

  /** 64-bit SimHash over whitespace tokens (sign-sum of token FNV-hash
    * bits) — identical math to the round-1 UDF, minus the Seq[String]
    * conversion cost. */
  def simhash64(text: UTF8String): Long = {
    val tk = toks(text)
    val counts = new Array[Int](64)
    var i = 0
    while (i < tk.length) {
      val h = fnv64(tk(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** One-pass term-frequency counter for a FIXED small term set:
    * returns [n_tokens, count(terms(0)), count(terms(1)), ...]. Replaces
    * K interpreted `size(filter(split(...)))` HOF chains (each its own
    * split + traversal + array allocation) with one tokenize + one
    * traversal per row. Tokenization matches `split(trim(text), "\\s+")`
    * EXACTLY, including the empty-text edge (trimmed-empty → one empty
    * token, so n_tokens is 1, same as Spark's split and DuckDB's
    * regexp_split_to_array). */
  def termCounts(text: UTF8String, terms: Array[String]): ArrayData = {
    // Spark-trim (space only) + split keeping trailing empties: see toks
    val t = text.trim.toString
    val tk: Array[String] = if (t.isEmpty) Array("") else t.split("\\s+", -1)
    val out = new Array[Long](terms.length + 1)
    out(0) = tk.length.toLong
    var i = 0
    while (i < tk.length) {
      val tok = tk(i)
      var j = 0
      while (j < terms.length) {
        if (terms(j) == tok) out(j + 1) += 1L
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  val TextQualityType: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("stop_ratio", DoubleType, nullable = false),
    StructField("chars_per_token", DoubleType, nullable = false),
    StructField("quality", DoubleType, nullable = false)))

  /** The full quality-signal tuple in ONE tokenize pass — the fused form
    * of the TermCounts + arithmetic composition TextQualityScorer used
    * to emit column-by-column. Fusion here is not a micro-optimization:
    * after ProjectCollapse inlines the scorer's withColumns into a
    * downstream FILTER (the curation pipelines' `quality >= 0.3`), the
    * composed form re-evaluates TermCounts once per element_at REFERENCE
    * (~10 tokenizations per row — FilterExec has no subexpression
    * elimination, unlike ProjectExec/HashAggregateExec), measured 31 s
    * vs 7 s for the identical logical work at the 100× fixture. A single
    * struct-returning expression makes one-tokenize-per-row hold BY
    * CONSTRUCTION under any inlining.
    *
    * Field-for-field bit parity with the composed form (KernelFuzzSpec):
    * tokens are `split(trim, "\s+")` (see [[toks]]); chars_per_token
    * divides the UNTRIMMED char count (Spark `length()` = numChars);
    * quality = least(n/64, 1) * (1 - stop_ratio) in the same double
    * operation order. n_tokens ≥ 1 always (trimmed-empty → one empty
    * token), so the n>0 guards only document the composed `when`s.
    *
    * NULL text is the ONE deliberate divergence from the composed form:
    * the kernel null-propagates (null text → null struct → null
    * stop_ratio/chars_per_token/quality, so a `quality >= t` filter
    * DROPS null-text docs), where the composed
    * TermCounts+when/otherwise+least chain yielded stop_ratio = 0.0,
    * chars_per_token = 0.0 and quality = 1.0 — `least()` skips null
    * operands, so a null document scored PERFECT quality and sailed
    * through every curation bar. Null-propagation is the correct
    * semantics for a quality signal over a document that does not
    * exist; KernelFuzzSpec pins the divergence explicitly. */
  def textQuality(text: UTF8String, stops: Array[String]): org.apache.spark.sql.catalyst.InternalRow = {
    val nChars = text.numChars().toDouble
    // Spark-trim (space only) + split keeping trailing empties: see toks
    val t = text.trim.toString
    val tk: Array[String] = if (t.isEmpty) Array("") else t.split("\\s+", -1)
    var stopHits = 0L
    var i = 0
    while (i < tk.length) {
      val tok = tk(i)
      var j = 0
      while (j < stops.length) {
        if (stops(j) == tok) stopHits += 1L
        j += 1
      }
      i += 1
    }
    val nTokD = tk.length.toDouble
    val stopRatio = if (tk.length > 0) stopHits.toDouble / nTokD else 0.0
    val charsPerTok = if (tk.length > 0) nChars / nTokD else 0.0
    val quality = math.min(nTokD / 64.0, 1.0) * (1.0 - stopRatio)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](tk.length.toLong, stopRatio, charsPerTok, quality))
  }

  /** Distinct sorted 64-bit FNV hashes of word n-grams. Gram identity is
    * the SPACE-JOINED token string (same as `concat_ws(" ", slice(...))`
    * in the composed wordNgrams column), so Jaccard over these hashes
    * equals Jaccard over the gram strings — the DuckDB oracle's view —
    * modulo 64-bit collisions. Fewer than n tokens → one clamped gram. */
  def sortedGramHashes(text: UTF8String, n: Int): ArrayData = {
    val tk = toks(text)
    val nTok = tk.length
    val nGr = math.max(nTok - (n - 1), 1)
    val hs = new Array[Long](nGr)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < nGr) {
      sb.setLength(0)
      var j = i
      val end = math.min(i + n, nTok)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(tk(j))
        j += 1
      }
      hs(i) = fnv64(sb.toString)
      i += 1
    }
    java.util.Arrays.sort(hs)
    // dedup in place (array is sorted)
    var w = 0
    i = 0
    while (i < nGr) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, w))
  }

  /** Unicode NFC canonicalization (`java.text.Normalizer`) — the
    * curation normalization that collapses decomposed sequences
    * (e + U+0301 → é) before hashing/dedup, so byte-different renderings
    * of the same text cannot defeat digest-based dedup. Cross-engine
    * parity with utf8proc-based `nfc_normalize` (DuckDB) is pinned by
    * the registered query's oracle. */
  def nfcNormalize(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  /** Distinct word n-gram STRINGS in first-occurrence order — semantics
    * identical to the composed
    * `array_distinct(transform(sequence(1, max(nTok-(n-1),1)), i ->
    * concat_ws(" ", slice(toks, i, n))))`, including the fewer-than-n-
    * tokens clamp (one short gram; empty text → [""]). The composed form
    * is interpreted AND its lambda re-evaluates the token-array subtree
    * per element — O(tokens²) per row, measured 188 s for the 20×
    * cluster-dedup probe; this is one native O(tokens) pass. */
  def wordNgrams(text: UTF8String, n: Int): ArrayData = {
    val tk = toks(text)
    val nTok = tk.length
    val nGr = math.max(nTok - (n - 1), 1)
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < nGr) {
      sb.setLength(0)
      var j = i
      val end = math.min(i + n, nTok)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(tk(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var w = 0
    while (it.hasNext) { out(w) = UTF8String.fromString(it.next()); w += 1 }
    new GenericArrayData(out)
  }

  /** ALL word n-grams in order WITH repeats — the occurrence view (what
    * BPE-style pair counting needs), where [[wordNgrams]] is the distinct
    * membership view (what Jaccard/decontamination need). Same
    * tokenization and clamping. */
  def wordNgramsAll(text: UTF8String, n: Int): ArrayData = {
    val tk = toks(text)
    val nTok = tk.length
    val nGr = math.max(nTok - (n - 1), 1)
    val out = new Array[Any](nGr)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < nGr) {
      sb.setLength(0)
      var j = i
      val end = math.min(i + n, nTok)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(tk(j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Jaccard similarity of two SORTED long arrays (distinct elements) via
    * linear merge — zero allocation per pair, the exact-verifier inner
    * loop for LSH candidate sets. */
  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0 && m == 0) return 0.0
    var i = 0
    var j = 0
    var inter = 0
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (n + m - inter)
  }

  // ---- vector math -------------------------------------------------------

  // Element-kind codes for numeric arrays (resolved once at analysis
  // time, inlined as a constant into generated code).
  val ElemDouble = 0; val ElemFloat = 1; val ElemInt = 2
  val ElemLong = 3; val ElemShort = 4; val ElemByte = 5

  @inline private def elemAt(a: ArrayData, i: Int, kind: Int): Double = kind match {
    case 0 => a.getDouble(i)
    case 1 => a.getFloat(i).toDouble
    case 2 => a.getInt(i).toDouble
    case 3 => a.getLong(i).toDouble
    case 4 => a.getShort(i).toDouble
    case _ => a.getByte(i).toDouble
  }

  /** L2-normalized copy of a numeric array, widened to double. */
  def unitVector(a: ArrayData, kind: Int): ArrayData = {
    val n = a.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = elemAt(a, i, kind); i += 1 }
    var ss = 0.0
    i = 0
    while (i < n) { ss += out(i) * out(i); i += 1 }
    val norm = math.sqrt(ss)
    i = 0
    while (i < n) { out(i) /= norm; i += 1 }
    new GenericArrayData(out)
  }

  /** Sign-bit LSH bucket id of a numeric array under `bits` hyperplanes
    * (flattened row-major into `planes`, length bits × dim). One tight
    * pass; replaces a boxing Seq[Float] UDF that blocked whole-stage
    * codegen on every LSH bucket projection. */
  def hyperplaneBucket(v: ArrayData, kind: Int, planes: Array[Double], bits: Int): Int = {
    val dim = planes.length / bits
    val n = math.min(dim, v.numElements())
    var bucket = 0
    var b = 0
    while (b < bits) {
      var dot = 0.0
      val base = b * dim
      var i = 0
      while (i < n) { dot += planes(base + i) * elemAt(v, i, kind); i += 1 }
      if (dot > 0) bucket |= (1 << b)
      b += 1
    }
    bucket
  }

  /** Cosine similarity in one fused pass; formula matches the round-1
    * composed version exactly (dot / (sqrt(aa) * sqrt(bb)) in double)
    * so oracle-checked outputs rounded to 6 dp are unchanged. */
  def cosine(a: ArrayData, aKind: Int, b: ArrayData, bKind: Int): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var aa = 0.0
    var bb = 0.0
    var i = 0
    while (i < n) {
      val x = elemAt(a, i, aKind)
      val y = elemAt(b, i, bKind)
      dot += x * y; aa += x * x; bb += y * y
      i += 1
    }
    dot / (math.sqrt(aa) * math.sqrt(bb))
  }

  // ---- int8 quantization ---------------------------------------------

  val Int8QuantizeType: StructType = StructType(Seq(
    StructField("maxabs", DoubleType, nullable = true),
    StructField("codes", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("code_sum", LongType, nullable = false),
    StructField("code_abs_sum", LongType, nullable = false),
    StructField("recon_cos", DoubleType, nullable = true)))

  /** Spark's round(col, 0) semantics for doubles, verbatim: NaN/Inf pass
    * through, everything else goes through scala BigDecimal HALF_UP —
    * the same code path RoundBase executes, so the kernel's codes are
    * bit-identical to `transform(v, x -> round(x*scale, 0))`. */
  @inline private def roundHalfUp0(y: Double): Double =
    if (java.lang.Double.isNaN(y) || java.lang.Double.isInfinite(y)) y
    else scala.math.BigDecimal(y)
      .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Per-vector int8 quantization in ONE fused pass: maxabs, HALF_UP
    * codes at scale 127/maxabs, integer code sums, and the
    * reconstruction cosine — replacing four interpreted `transform`
    * HOFs plus two interpreted `aggregate` folds per row (the composed
    * form measured 23 s for 200 k vectors at the 100× fixture; every
    * millisecond of it interpreted-dispatch, none of it math). Formula
    * parity: same maxabs (abs/max over doubles), same rounding
    * ([[roundHalfUp0]]), same dequantized cosine
    * (dot/(sqrt·sqrt) — [[cosine]]'s formula) over c/(127/maxabs).
    * Edges mirror the composed form: empty vector → null maxabs/cos,
    * empty codes, zero sums; all-zero vector → zero codes, null cos; a
    * NaN element → NaN maxabs (array_max orders NaN largest), zero
    * codes (NaN rounds to int 0), NaN cos. */
  def int8Quantize(v: ArrayData, kind: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val n = v.numElements()
    val codes = new Array[Int](n)
    var maxabs = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(elemAt(v, i, kind))
      // NaN propagates like the composed form's array_max (which orders
      // NaN largest): maxabs = NaN. Once NaN, `a > maxabs` is false for
      // every a, so it sticks.
      if (a > maxabs || java.lang.Double.isNaN(a)) maxabs = a
      i += 1
    }
    var codeSum = 0L
    var codeAbsSum = 0L
    var reconCos: Any = null
    // NaN maxabs takes the scaled branch like the composed form, where
    // Spark's `maxabs > 0` is TRUE for NaN (SQL comparison orders NaN
    // above everything, unlike Java's): scale = 127/NaN = NaN, every
    // code rounds NaN → 0 (Java Double.toInt — the kernels' IEEE
    // contract; an ANSI SQL cast of NaN would THROW, which is why the
    // composed parity reference routes its cast through nanvl), and the
    // reconstruction cosine comes out NaN — PipelineOpsSpec and
    // KernelFuzzSpec pin the whole row against the composed reference
    // under the session's pinned ANSI mode.
    if (n > 0 && (maxabs > 0 || java.lang.Double.isNaN(maxabs))) {
      val scale = 127.0 / maxabs
      var dot = 0.0; var aa = 0.0; var bb = 0.0
      i = 0
      while (i < n) {
        val x = elemAt(v, i, kind)
        val c = roundHalfUp0(x * scale).toInt
        codes(i) = c
        codeSum += c
        codeAbsSum += math.abs(c).toLong
        val dq = c / scale
        dot += x * dq; aa += x * x; bb += dq * dq
        i += 1
      }
      reconCos = dot / (math.sqrt(aa) * math.sqrt(bb))
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](if (n == 0) null else maxabs, new GenericArrayData(codes),
        codeSum, codeAbsSum, reconCos))
  }

  // ---- content-defined chunking ------------------------------------------

  /** One-pass content-defined chunking: a chunk ends AFTER every anchor
    * token (fnv64(token) ≡ 0 mod divisor). Per chunk, emits
    * struct(clen, fp) where fp = fnv64 of the chunk's tokens joined by
    * a single space — computed INCREMENTALLY over the chars (separator
    * included), so no chunk string is ever materialized. The HOF
    * composition of the same math (filter/sequence/slice + per-token
    * kernel calls) ran interpreted per element: measured 95 s at sf0.1
    * vs this kernel's sub-second scan. */
  def cdcChunks(text: UTF8String, divisor: Int): ArrayData = {
    val tk = toks(text)
    val out = new scala.collection.mutable.ArrayBuffer[Any]
    val seed = 0xcbf29ce484222325L
    var h = seed
    var clen = 0
    var i = 0
    while (i < tk.length) {
      val t = tk(i)
      var j = if (clen > 0) -1 else 0 // -1 = emit the joiner space first
      while (j < t.length) {
        val c = if (j < 0) ' ' else t.charAt(j)
        h ^= (c & 0xffL); h *= 0x100000001b3L
        if (c > 0xff) { h ^= ((c >> 8) & 0xffL); h *= 0x100000001b3L }
        j += 1
      }
      clen += 1
      if (java.lang.Math.floorMod(fnv64(t), divisor.toLong) == 0L) {
        out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](clen, h))
        h = seed; clen = 0
      }
      i += 1
    }
    if (clen > 0)
      out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](clen, h))
    new GenericArrayData(out.toArray)
  }
  // ---- Language ID ---------------------------------------------------

  /** Stopword profiles for the language-ID heuristic (public
    * function-word lists). THE source of truth: TextFunctions' UDF
    * parity reference and every oracle SQL literal list replay these. */
  val LangProfiles: Seq[(String, Set[String])] = Seq(
    "de" -> Set("der", "die", "das", "und", "ist", "von", "mit", "ein", "eine", "zu", "den", "im"),
    "en" -> Set("the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "on", "with", "as"),
    "es" -> Set("el", "la", "de", "que", "y", "en", "un", "una", "es", "los", "las", "por", "con"),
    "fr" -> Set("le", "la", "les", "de", "des", "et", "est", "un", "une", "du", "en", "que", "pour"),
    "it" -> Set("il", "la", "di", "che", "e", "un", "una", "per", "con", "del", "sono", "non"),
    "pt" -> Set("o", "a", "de", "que", "e", "do", "da", "em", "um", "uma", "com", "para", "os"))

  private val langNames: Array[UTF8String] =
    LangProfiles.map(p => UTF8String.fromString(p._1)).toArray
  private val langUnd = UTF8String.fromString("und")
  // one hash lookup per token: stopword → bitmask of profile indexes
  // (many function words are shared across Romance languages)
  private val langMask: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    for (((_, stops), i) <- LangProfiles.zipWithIndex; w <- stops) {
      val prev = m.get(w)
      m.put(w, Integer.valueOf((if (prev == null) 0 else prev.intValue()) | (1 << i)))
    }
    m
  }

  /** Language ID by stopword-profile hit counting, as ONE kernel pass:
    * tokenize (split(trim, "\\s+") semantics, same as [[termCounts]]),
    * one hash lookup per token, argmax with strictly-greater updates in
    * lang-name order — bit-identical to the Seq[String] UDF it replaced
    * (kept in TextFunctions as the parity reference; KernelsSpec pins
    * equality on real documents). The UDF paid a Catalyst-array →
    * Seq[String] conversion per row ON TOP of the split array; this pass
    * allocates the token array once and nothing else. */
  def langId(text: UTF8String): UTF8String = {
    // Spark-trim (space only) + split keeping trailing empties: see toks
    val t = text.trim.toString
    val tk: Array[String] = if (t.isEmpty) Array("") else t.split("\\s+", -1)
    val hits = new Array[Int](langNames.length)
    var i = 0
    while (i < tk.length) {
      val m = langMask.get(tk(i))
      if (m != null) {
        var mask = m.intValue()
        while (mask != 0) {
          val b = java.lang.Integer.numberOfTrailingZeros(mask)
          hits(b) += 1
          mask &= mask - 1
        }
      }
      i += 1
    }
    var best = -1
    var bestHits = 0
    var j = 0
    while (j < hits.length) {
      if (hits(j) > bestHits) { bestHits = hits(j); best = j }
      j += 1
    }
    if (best < 0) langUnd else langNames(best)
  }

  // ---- per-document token entropy --------------------------------------

  val TokenEntropyType: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("slc", DoubleType, nullable = false)))

  /** Per-document unigram statistics for the information-density score:
    * (n_tokens, n_distinct, Σ c·log2(c)) in ONE local pass with a
    * per-row hash map. Entropy is a PURE per-row function of the text —
    * the composed groupBy form exploded every token and shuffled the
    * (doc, token) pairs twice (≈50 M rows twice at the 100× fixture)
    * to compute what one scan computes locally; at 100 TB that is the
    * difference between a shuffle-free projection and a corpus-wide
    * exchange. The caller finishes with
    * round(log2(n_tokens) − slc/n_tokens, 4) in Catalyst; 4-dp rounding
    * absorbs summation-order ulps (the shuffled form's own sum order
    * was partition-dependent for the same reason). Tokenization matches
    * split(trim, "\\s+") including the trimmed-empty → one-empty-token
    * edge. */
  def tokenEntropy(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    // Spark-trim (space only) + split keeping trailing empties: see toks
    val t = text.trim.toString
    val tk: Array[String] = if (t.isEmpty) Array("") else t.split("\\s+", -1)
    val counts = new java.util.HashMap[String, Int](tk.length * 2)
    var i = 0
    while (i < tk.length) {
      counts.put(tk(i), counts.getOrDefault(tk(i), 0) + 1)
      i += 1
    }
    var slc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toDouble
      slc += c * (math.log(c) / math.log(2.0))
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](tk.length.toLong, counts.size().toLong, slc))
  }

  // ---- PII audit + redaction ---------------------------------------------

  /** PII patterns (ASCII, RE2-compatible so a DuckDB oracle replays them
    * exactly; java.util.regex is what Spark's own regexp_* use, so the
    * kernel and the composed form are engine-identical). Curation's
    * public vals alias these. */
  val PiiEmailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val PiiPhoneRe = """\b\d{3}-\d{3}-\d{4}\b"""
  val PiiIpv4Re = """\b\d{1,3}(\.\d{1,3}){3}\b"""
  private val piiPats = Array(PiiEmailRe, PiiPhoneRe, PiiIpv4Re)
    .map(java.util.regex.Pattern.compile)
  private val piiRepl = Array("<EMAIL>", "<PHONE>", "<IP>")

  val PiiStatsType: StructType = StructType(Seq(
    StructField("n_emails", IntegerType, nullable = false),
    StructField("n_phones", IntegerType, nullable = false),
    StructField("n_ips", IntegerType, nullable = false),
    StructField("redacted", StringType, nullable = false)))

  /** One-kernel PII audit: per-pattern match COUNTS over the original
    * text plus the sequentially redacted text (email → phone → IP, the
    * same chain as Curation.redactPii), in a single toString of the row.
    *
    * Why: the composed form (3 × regexp_extract_all + 3 × regexp_replace)
    * materializes the full document ~13 times per row across
    * UTF8String→String conversions, match arrays, and replace buffers —
    * at the 100× fixture that allocation (not the regex scans) dominated
    * q_pii_redact and its excess-over-linear was pure GC. This kernel
    * allocates ONE String per row, counts with buffer-free matchers, and
    * only builds a replace buffer for patterns that actually matched
    * (most rows match at most one); a no-PII row allocates nothing past
    * the toString and returns the input UTF8String unchanged.
    * KernelsSpec pins count-and-redaction equality with the composed
    * regexp_extract_all / regexp_replace form. */
  def piiStats(u: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = u.toString
    val counts = new Array[Int](3)
    var cur = s
    var i = 0
    while (i < 3) {
      if (cur eq s) {
        // nothing redacted yet: count and redact in ONE matcher pass
        val m = piiPats(i).matcher(s)
        if (m.find()) {
          val sb = new java.lang.StringBuilder(s.length)
          do { counts(i) += 1; m.appendReplacement(sb, piiRepl(i)) } while (m.find())
          m.appendTail(sb)
          cur = sb.toString
        }
      } else {
        // counts are over the ORIGINAL text (the audit face); redaction
        // chains over the already-redacted text, exactly like the
        // sequential regexp_replace form
        val mc = piiPats(i).matcher(s)
        while (mc.find()) counts(i) += 1
        if (counts(i) > 0) {
          val mr = piiPats(i).matcher(cur)
          if (mr.find()) {
            val sb = new java.lang.StringBuilder(cur.length)
            do mr.appendReplacement(sb, piiRepl(i)) while (mr.find())
            mr.appendTail(sb)
            cur = sb.toString
          }
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](counts(0), counts(1), counts(2),
        if (cur eq s) u else UTF8String.fromString(cur)))
  }


}

/** Catalyst wrappers: `nullSafeEval` for the interpreted path and a
  * one-line static-call `doGenCode` so whole-stage codegen stays intact. */
object KernelExpressions {

  // Integral element types are accepted and widened to double inside the
  // kernel (integer-typed embeddings worked in the round-1 composed
  // versions via implicit cast; the kernels keep that contract).
  private def elemKind(e: Expression): Int = e.dataType match {
    case ArrayType(DoubleType, _) => Kernels.ElemDouble
    case ArrayType(FloatType, _) => Kernels.ElemFloat
    case ArrayType(IntegerType, _) => Kernels.ElemInt
    case ArrayType(LongType, _) => Kernels.ElemLong
    case ArrayType(ShortType, _) => Kernels.ElemShort
    case ArrayType(ByteType, _) => Kernels.ElemByte
    case dt => throw new IllegalArgumentException(s"need array of a numeric type, got $dt")
  }

  case class MinHashSig(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(v: Any): Any =
      Kernels.minhashSig(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.Kernels.minhashSig($c);")
    override protected def withNewChildInternal(c: Expression): MinHashSig = copy(c)
  }

  case class SigAgree(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(a: Any, b: Any): Any =
      Kernels.sigAgree(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.Kernels.sigAgree($a, $b);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): SigAgree =
      copy(l, r)
  }

  case class SortedGramHashes(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(v: Any): Any =
      Kernels.sortedGramHashes(v.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.Kernels.sortedGramHashes($c, $n);")
    override protected def withNewChildInternal(c: Expression): SortedGramHashes =
      copy(child = c)
  }

  case class TermCounts(child: Expression, terms: Array[String]) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(v: Any): Any =
      Kernels.termCounts(v.asInstanceOf[UTF8String], terms)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("terms", terms, "java.lang.String[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.Kernels.termCounts($c, $ref);")
    }
    override protected def withNewChildInternal(c: Expression): TermCounts =
      copy(child = c)
  }

  case class TextQuality(child: Expression, stops: Array[String]) extends UnaryExpression {
    override def dataType: DataType = Kernels.TextQualityType
    override protected def nullSafeEval(v: Any): Any =
      Kernels.textQuality(v.asInstanceOf[UTF8String], stops)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("stops", stops, "java.lang.String[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.Kernels.textQuality($c, $ref);")
    }
    override protected def withNewChildInternal(c: Expression): TextQuality =
      copy(child = c)
  }

  case class NfcNormalize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override protected def nullSafeEval(v: Any): Any =
      Kernels.nfcNormalize(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.Kernels.nfcNormalize($c);")
    override protected def withNewChildInternal(c: Expression): NfcNormalize =
      copy(child = c)
  }

  case class TokenEntropy(child: Expression) extends UnaryExpression {
    override def dataType: DataType = Kernels.TokenEntropyType
    override protected def nullSafeEval(v: Any): Any =
      Kernels.tokenEntropy(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.Kernels.tokenEntropy($c);")
    override protected def withNewChildInternal(c: Expression): TokenEntropy =
      copy(child = c)
  }

  case class LangId(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override protected def nullSafeEval(v: Any): Any =
      Kernels.langId(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.Kernels.langId($c);")
    override protected def withNewChildInternal(c: Expression): LangId =
      copy(child = c)
  }

  case class PiiStats(child: Expression) extends UnaryExpression {
    override def dataType: DataType = Kernels.PiiStatsType
    override protected def nullSafeEval(v: Any): Any =
      Kernels.piiStats(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.Kernels.piiStats($c);")
    override protected def withNewChildInternal(c: Expression): PiiStats =
      copy(child = c)
  }

  case class CdcChunks(child: Expression, divisor: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("clen", IntegerType, nullable = false),
      StructField("fp", LongType, nullable = false))), containsNull = false)
    override protected def nullSafeEval(v: Any): Any =
      Kernels.cdcChunks(v.asInstanceOf[UTF8String], divisor)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.Kernels.cdcChunks($c, $divisor);")
    override protected def withNewChildInternal(c: Expression): CdcChunks =
      copy(child = c)
  }

  case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override protected def nullSafeEval(v: Any): Any =
      Kernels.wordNgrams(v.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.Kernels.wordNgrams($c, $n);")
    override protected def withNewChildInternal(c: Expression): WordNgrams =
      copy(child = c)
  }

  case class WordNgramsAll(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override protected def nullSafeEval(v: Any): Any =
      Kernels.wordNgramsAll(v.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.Kernels.wordNgramsAll($c, $n);")
    override protected def withNewChildInternal(c: Expression): WordNgramsAll =
      copy(child = c)
  }

  case class JaccardSorted(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(a: Any, b: Any): Any =
      Kernels.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.Kernels.jaccardSorted($a, $b);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSorted =
      copy(l, r)
  }

  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(v: Any): Any =
      Kernels.simhash64(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.Kernels.simhash64($c);")
    override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
  }

  case class UnitVector(child: Expression) extends UnaryExpression {
    private lazy val kind = elemKind(child)
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override protected def nullSafeEval(v: Any): Any =
      Kernels.unitVector(v.asInstanceOf[ArrayData], kind)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.Kernels.unitVector($c, $kind);")
    override protected def withNewChildInternal(c: Expression): UnitVector = copy(c)
  }

  case class Int8QuantizeStats(child: Expression) extends UnaryExpression {
    private lazy val kind = elemKind(child)
    override def dataType: DataType = Kernels.Int8QuantizeType
    override protected def nullSafeEval(v: Any): Any =
      Kernels.int8Quantize(v.asInstanceOf[ArrayData], kind)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.Kernels.int8Quantize($c, $kind);")
    override protected def withNewChildInternal(c: Expression): Int8QuantizeStats =
      copy(c)
  }

  case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
    private lazy val lKind = elemKind(left)
    private lazy val rKind = elemKind(right)
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(a: Any, b: Any): Any =
      Kernels.cosine(a.asInstanceOf[ArrayData], lKind, b.asInstanceOf[ArrayData], rKind)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.Kernels.cosine($a, $lKind, $b, $rKind);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
      copy(l, r)
  }

  /** LSH bucket id under a fixed hyperplane matrix. The planes ride along
    * as a referenced object (not a child expression), so the generated
    * code is a single static call and the projection stays inside
    * whole-stage codegen. */
  case class HyperplaneBucket(child: Expression, planes: Array[Double], bits: Int)
      extends UnaryExpression {
    private lazy val kind = elemKind(child)
    override def dataType: DataType = IntegerType
    override protected def nullSafeEval(v: Any): Any =
      Kernels.hyperplaneBucket(v.asInstanceOf[ArrayData], kind, planes, bits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.Kernels.hyperplaneBucket($c, $kind, $planesRef, $bits);")
    }
    override protected def withNewChildInternal(c: Expression): HyperplaneBucket =
      copy(child = c)
  }

  // ---- Column-facing API -------------------------------------------------

  def minhash_sig(text: Column): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(text)))

  def sig_agree(a: Column, b: Column): Column =
    ColumnBridge.column(SigAgree(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def simhash64(text: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(text)))

  def jaccard_sorted(a: Column, b: Column): Column =
    ColumnBridge.column(JaccardSorted(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def sorted_gram_hashes(text: Column, n: Int): Column =
    ColumnBridge.column(SortedGramHashes(ColumnBridge.expression(text), n))

  def nfc_normalize(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))

  /** struct<n_emails,n_phones,n_ips,redacted> in one kernel pass — see
    * [[Kernels.piiStats]]. */
  def pii_stats(text: Column): Column =
    ColumnBridge.column(PiiStats(ColumnBridge.expression(text)))

  /** Best-profile language code ("und" when nothing hits) in one kernel
    * pass over the RAW text — see [[Kernels.langId]]. */
  def lang_id(text: Column): Column =
    ColumnBridge.column(LangId(ColumnBridge.expression(text)))

  /** struct<n_tokens,n_distinct,slc> for per-doc unigram entropy in one
    * local pass — see [[Kernels.tokenEntropy]]. */
  def token_entropy_stats(text: Column): Column =
    ColumnBridge.column(TokenEntropy(ColumnBridge.expression(text)))

  /** struct<maxabs,codes,code_sum,code_abs_sum,recon_cos> in one fused
    * pass — see [[Kernels.int8Quantize]]. */
  def int8_quantize(vec: Column): Column =
    ColumnBridge.column(Int8QuantizeStats(ColumnBridge.expression(vec)))

  def word_ngrams(text: Column, n: Int): Column =
    ColumnBridge.column(WordNgrams(ColumnBridge.expression(text), n))

  /** array<struct<clen,fp>> of content-defined chunks (anchor rule:
    * fnv64(token) ≡ 0 mod divisor; fp = fnv64 of space-joined chunk). */
  def cdc_chunks(text: Column, divisor: Int): Column = {
    require(divisor > 1, s"divisor must be > 1, got $divisor")
    ColumnBridge.column(CdcChunks(ColumnBridge.expression(text), divisor))
  }

  /** ALL n-grams with repeats (occurrence view, for pair counting). */
  def word_ngrams_all(text: Column, n: Int): Column =
    ColumnBridge.column(WordNgramsAll(ColumnBridge.expression(text), n))

  /** [n_tokens, tf(terms(0)), tf(terms(1)), ...] in one tokenize pass. */
  def term_counts(text: Column, terms: Seq[String]): Column = {
    require(terms.nonEmpty, "term_counts needs at least one term")
    ColumnBridge.column(TermCounts(ColumnBridge.expression(text), terms.toArray))
  }

  /** struct<n_tokens, stop_ratio, chars_per_token, quality> in one
    * tokenize pass; see [[Kernels.textQuality]] for why fusion (not just
    * a shared column) is what survives filter inlining. */
  def text_quality(text: Column, stops: Seq[String]): Column = {
    require(stops.nonEmpty, "text_quality needs at least one stopword")
    ColumnBridge.column(TextQuality(ColumnBridge.expression(text), stops.toArray))
  }

  def unit_vector(a: Column): Column =
    ColumnBridge.column(UnitVector(ColumnBridge.expression(a)))

  def cosine_sim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** `planes`: bits × dim hyperplane matrix (row per bit). */
  def hyperplane_bucket(v: Column, planes: Array[Array[Double]]): Column = {
    require(planes.nonEmpty, "need at least one hyperplane")
    val dim = planes(0).length
    require(planes.forall(_.length == dim), "ragged hyperplane matrix")
    val flat = new Array[Double](planes.length * dim)
    var b = 0
    while (b < planes.length) {
      System.arraycopy(planes(b), 0, flat, b * dim, dim)
      b += 1
    }
    ColumnBridge.column(HyperplaneBucket(ColumnBridge.expression(v), flat, planes.length))
  }
}

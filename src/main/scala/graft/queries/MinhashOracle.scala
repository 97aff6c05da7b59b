package graft.queries

import graft.functions.Kernels

/** Shared HUGEINT SQL fragments for the DuckDB oracles that replay the
  * 64-bit wrap-around hash kernels (FNV-1a, SimHash, MinHash).
  *
  * HUGEINT technique notes:
  *   - values are carried UNSIGNED in [0, 2^64); signed Java longs map
  *     back at the end (and for min(), which Java takes over SIGNED longs);
  *   - xor has no HUGEINT form, so operands round-trip through signed
  *     BIGINT (a bijection mod 2^64);
  *   - a*b mod 2^64 with both factors up to 2^64 would overflow HUGEINT
  *     (2^127): b splits into 32-bit halves — a*(b mod 2^32) and
  *     ((a*(b div 2^32)) mod 2^32) << 32 both stay under 2^97.
  *
  * Corpus assumption, checked on the generated test data: text is ASCII
  * (the token kernels hash UTF-16 chars low-byte-first, the oracles hash
  * code points — identical only below U+0100; and DuckDB's trim strips
  * Unicode spaces like U+00A0 where Spark's strips U+0020 only). The
  * former second assumption — no leading/trailing CONTROL characters —
  * NARROWED in round 14: the kernels now tokenize with Spark's exact
  * trim/split semantics (space-only trim, trailing empty fields kept).
  * Round 16 CLOSED the last separator divergence: every generated and
  * hand-written oracle now tokenizes with the EXPLICIT class
  * `[\t\n\x0B\f\r ]+` — exactly Java's `\s` on ASCII — instead of RE2's
  * `\s`, which excludes vertical tab U+000B (Java splits "" + "x"
  * to ["", "x"]; RE2 \s kept it one token). VT is therefore off the
  * corpus-exclusion list: q_text_ws_specials plants VT/FF/CR separators
  * and hash-matches the DuckDB replay, and KernelFuzzSpec generates VT.
  * Empty, whitespace-only, and NULL text are handled exactly: tokenless
  * docs get the kernel's all-MaxValue minhash signature / zero simhash,
  * NULL text propagates NULL (OracleEdgeSpec pins the Spark side of
  * these fixtures).
  */
private[queries] object HashSqlParts {

  /** Double-array SQL literal via java.lang.Double.toString — the
    * shortest-round-trip form DuckDB parses back to the identical IEEE
    * bits; the whole bit-exact vector-replay story rests on it. ONE
    * definition (was four copies before the r17 review). */
  def arr(p: Array[Double]): String =
    p.map(java.lang.Double.toString).mkString("[", ", ", "]")

  val M64 = "CAST('18446744073709551616' AS HUGEINT)" // 2^64
  val HALF = "CAST('9223372036854775808' AS HUGEINT)" // 2^63

  def hu(v: Long): String =
    s"CAST('${java.lang.Long.toUnsignedString(v)}' AS HUGEINT)"

  /** Unsigned [0,2^64) → signed Java long (as HUGEINT-valued expression). */
  def toSigned(x: String): String =
    s"(CASE WHEN ($x) >= $HALF THEN ($x) - $M64 ELSE ($x) END)"

  /** Signed → unsigned [0,2^64). */
  def toUnsigned(x: String): String =
    s"(CASE WHEN ($x) < 0 THEN CAST(($x) AS HUGEINT) + $M64 ELSE CAST(($x) AS HUGEINT) END)"

  /** 64-bit xor of two unsigned HUGEINT expressions. */
  def xor64(a: String, b: String): String =
    toUnsigned(s"xor(CAST(${toSigned(a)} AS BIGINT), CAST(${toSigned(b)} AS BIGINT))")

  /** a * FNV prime mod 2^64 (prime < 2^41 — direct multiply is safe). */
  def mulP(a: String): String = s"((($a) * 1099511628211) % $M64)"

  /** a*b mod 2^64 for a,b < 2^64 via 32-bit splitting of b. */
  def mul64(a: String, b: String): String =
    s"(((($a) * (($b) % 4294967296)) + " +
      s"(((($a) * (($b) // 4294967296)) % 4294967296) * 4294967296)) % $M64)"

  /** logical >>> 33 on an unsigned value. */
  def shr33(x: String): String = s"(($x) // 8589934592)"

  /** FNV-1a fold over the code points of column `t` (token-level hash —
    * matches the char-based [[Kernels]] fnv64 on ASCII text). */
  def fnvFold: String =
    s"""list_reduce(list_prepend(${hu(0xcbf29ce484222325L)},
        list_transform(string_split(t, ''), ch -> ord(ch))),
        (h, c) -> ((h // 256) * 256 + xor(CAST(h % 256 AS BIGINT), c)) * 1099511628211 % $M64)"""

  /** CTEs `toks0`/`tokpos`/`thr`: (doc_id, pos, hu) per-token FNV hashes.
    * NULL and tokenless docs are excluded here; each oracle adds them back
    * with its kernel's exact semantics. */
  def tokenHashCtes: String =
    s"""toks0 AS (SELECT doc_id, regexp_split_to_array(trim(text), '[\\t\\n\\x0B\\f\\r ]+') AS tk
             FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0),
      tokpos AS (SELECT doc_id, unnest(tk) AS t, unnest(range(1, len(tk)+1)) AS pos FROM toks0),
      thr AS (SELECT doc_id, pos, $fnvFold AS hu FROM tokpos)"""
}

/** Generated DuckDB oracle SQL for the SimHash queries: per-token FNV,
  * per-bit sign-sum majority vote via a 64-power cross join, bits
  * reassembled with HUGEINT arithmetic. Tokenless docs get simhash 0 like
  * the kernel; NULL text propagates NULL (and is excluded from pairs,
  * like the null-safe kernel expression in the join predicate).
  */
object SimhashOracle {
  import HashSqlParts._

  /** CTE chain ending in shd(doc_id, hu) over ALL documents (hu NULL for
    * NULL text, 0 for tokenless text). */
  private def coreCtes: String =
    s"""${tokenHashCtes},
      bits AS (SELECT doc_id, p,
                 (2 * sum(CASE WHEN (hu // p) % 2 = 1 THEN 1 ELSE 0 END) > count(*)) AS bset
               FROM thr CROSS JOIN
                 (SELECT CAST(1 AS HUGEINT) << CAST(b AS INTEGER) AS p FROM range(64) r(b)) pw
               GROUP BY doc_id, p),
      shu AS (SELECT doc_id, sum(CASE WHEN bset THEN p ELSE CAST(0 AS HUGEINT) END) AS hu
              FROM bits GROUP BY doc_id),
      shd AS (SELECT d.doc_id,
                CASE WHEN d.text IS NULL THEN NULL
                     ELSE coalesce(s.hu, CAST(0 AS HUGEINT)) END AS hu
              FROM documents d LEFT JOIN shu s USING (doc_id))"""

  /** Oracle for q_dedup_simhash: (doc_id, simhash, seg0..seg3). */
  lazy val tableSql: String =
    s"""WITH $coreCtes
      SELECT doc_id,
        CAST(${toSigned("hu")} AS BIGINT) AS simhash,
        CAST((hu // (CAST(1 AS HUGEINT) << 0))  % 65536 AS BIGINT) AS seg0,
        CAST((hu // (CAST(1 AS HUGEINT) << 16)) % 65536 AS BIGINT) AS seg1,
        CAST((hu // (CAST(1 AS HUGEINT) << 32)) % 65536 AS BIGINT) AS seg2,
        CAST((hu // (CAST(1 AS HUGEINT) << 48)) % 65536 AS BIGINT) AS seg3
      FROM shd ORDER BY doc_id"""

  /** Oracle for q_dedup_simhash_pairs: all pairs at hamming <= 3. The
    * segment join is candidate-COMPLETE for the radius (pigeonhole), and
    * the hot-bucket guard (>10000 docs per (seg, value)) cannot trigger
    * at oracle scale, so the operator's output IS the plain hamming cut. */
  lazy val pairsSql: String =
    s"""WITH $coreCtes,
      sh AS (SELECT doc_id, CAST(${toSigned("hu")} AS BIGINT) AS simhash
             FROM shd WHERE hu IS NOT NULL)
      SELECT x.doc_id AS a, y.doc_id AS b, bit_count(xor(x.simhash, y.simhash)) AS hamming
      FROM sh x JOIN sh y ON x.doc_id < y.doc_id
      WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
      ORDER BY a, b"""
}

/** Generated DuckDB oracle SQL for the MinHash/LSH dedup family.
  *
  * The operator pipeline (tokens → per-token FNV → chained trigram shingle
  * hash → fmix64 → 64 LCG permutations → per-band equality → estimated
  * jaccard) is deterministic 64-bit integer math, so DuckDB can replay it
  * EXACTLY. The SQL is generated, not hand-written: the permutation
  * constants come from the same seeded arrays the kernel uses
  * ([[Kernels.minhashPermA]]), so a seed change cannot desynchronize
  * query and oracle.
  *
  * Candidate generation mirrors the operator's band-bucket join (equality
  * on a per-band key, never an all-pairs product), so the oracle's cost
  * profile scales like the engine's: O(docs·64) signature rows plus only
  * the colliding pairs, not O(docs²·64).
  */
object MinhashOracle {
  import HashSqlParts._

  /** Shared CTE chain ending in pair(a, b, agree) over band-bucket
    * candidates. Tokenless docs get the kernel's all-Long.MaxValue
    * signature (they pair as duplicates by design, Kernels.scala:79-82);
    * NULL text has no signature and so no pairs, like the null-safe
    * kernel expression. */
  private def coreCtes: String = {
    val permRows = (0 until Kernels.MinHashK).map { j =>
      s"($j, ${hu(Kernels.minhashPermA(j))}, ${hu(Kernels.minhashPermB(j))})"
    }.mkString(",\n        ")
    val x1 = mul64(xor64("h2", shr33("h2")), hu(0xff51afd7ed558ccdL))
    val x2 = mul64(xor64("x1", shr33("x1")), hu(0xc4ceb9fe1a85ec53L))
    val base = xor64("x2", shr33("x2"))
    val sv = toSigned(s"((${mul64("base", "pa")}) + pb) % $M64")
    s"""perm(j, pa, pb) AS (VALUES $permRows),
      ${tokenHashCtes},
      thl AS (SELECT doc_id, list(hu ORDER BY pos) AS th, count(*) AS n FROM thr GROUP BY doc_id),
      sh0 AS (SELECT doc_id, n, th, unnest(range(1, greatest(n-2, 1)+1)) AS s FROM thl),
      sh1 AS (SELECT doc_id, n, th, s,
                CASE WHEN s+1 <= n THEN ${xor64(mulP("th[s]"), "th[s+1]")} ELSE th[s] END AS h1
              FROM sh0),
      sh2 AS (SELECT doc_id, CASE WHEN s+2 <= n THEN ${xor64(mulP("h1"), "th[s+2]")} ELSE h1 END AS h2
              FROM sh1),
      fm1 AS (SELECT doc_id, $x1 AS x1 FROM sh2),
      fm2 AS (SELECT doc_id, $x2 AS x2 FROM fm1),
      fb  AS (SELECT doc_id, $base AS base FROM fm2),
      vals AS (SELECT doc_id, j, $sv AS sv FROM fb CROSS JOIN perm),
      sigj AS (SELECT doc_id, j, min(sv) AS sg FROM vals GROUP BY doc_id, j
               UNION ALL
               SELECT d.doc_id, p2.j, CAST('9223372036854775807' AS HUGEINT) AS sg
               FROM documents d CROSS JOIN perm p2
               WHERE d.text IS NOT NULL AND length(trim(d.text)) = 0),
      sigl AS (SELECT doc_id, list(sg ORDER BY j) AS sig FROM sigj GROUP BY doc_id),
      bandrow AS (SELECT doc_id, b,
                    list_aggregate(list_transform(sig[4*b+1 : 4*b+4], v -> CAST(v AS VARCHAR)),
                                   'string_agg', ',') AS bkey
                  FROM sigl CROSS JOIN (SELECT unnest(range(16)) AS b) bands),
      cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
               FROM bandrow x JOIN bandrow y
                 ON x.b = y.b AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
      pair AS (SELECT c.a, c.b,
                 len(list_filter(range(1, 65), i -> xa.sig[i] = xb.sig[i])) AS agree
               FROM cand c JOIN sigl xa ON xa.doc_id = c.a JOIN sigl xb ON xb.doc_id = c.b)"""
  }

  /** Oracle for q_dedup_minhash: LSH candidate pairs with estimated jaccard. */
  lazy val candidatesSql: String =
    s"""WITH $coreCtes
      SELECT a, b, round(agree / 64.0, 4) AS est_jaccard
      FROM pair WHERE agree / 64.0 >= 0.35
      ORDER BY a, b"""

  /** Oracle for q_dedup_minhash_verified: candidates re-scored with exact
    * word-trigram jaccard (distinct gram strings — equal to the kernel's
    * gram-hash jaccard modulo 64-bit collisions, same as the
    * q_dedup_ngram_jaccard oracle). */
  lazy val verifiedSql: String =
    s"""WITH $coreCtes,
      candp AS (SELECT a, b FROM pair WHERE agree / 64.0 >= 0.35),
      vids AS (SELECT a AS doc_id FROM candp UNION SELECT b FROM candp),
      g AS (SELECT doc_id, list_distinct([list_aggregate(gt[i:i+2], 'string_agg', ' ')
              for i in range(1, greatest(len(gt) - 1, 2))]) AS grams
            FROM (SELECT d.doc_id, regexp_split_to_array(trim(d.text), '[\\t\\n\\x0B\\f\\r ]+') AS gt
                  FROM documents d JOIN vids USING (doc_id)))
      SELECT c.a, c.b,
        round(len(list_intersect(ga.grams, gb.grams)) * 1.0 /
          len(list_distinct(list_concat(ga.grams, gb.grams))), 4) AS jaccard
      FROM candp c JOIN g ga ON ga.doc_id = c.a JOIN g gb ON gb.doc_id = c.b
      WHERE round(len(list_intersect(ga.grams, gb.grams)) * 1.0 /
          len(list_distinct(list_concat(ga.grams, gb.grams))), 4) >= 0.5
      ORDER BY a, b"""
}

package graft.queries

import graft.functions.Kernels

/** DuckDB oracle SQL for the MinHash/LSH dedup family.
  *
  * The operator pipeline (tokens → per-token FNV → chained trigram shingle
  * hash → fmix64 → 64 LCG permutations → per-band equality → estimated
  * jaccard) is deterministic 64-bit integer math, so DuckDB can replay it
  * EXACTLY in HUGEINT arithmetic with explicit mod-2^64 wraps. The SQL is
  * generated, not hand-written: the permutation constants come from the
  * same seeded arrays the kernel uses ([[Kernels.minhashPermA]]), so a
  * seed change cannot desynchronize query and oracle.
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
  * The LSH band join is replayed as per-band signature equality (the
  * engine's xxhash64 band key equals band equality modulo hash collisions,
  * which is also exactly the operator's intent); the hot-bucket guard
  * (buckets > 10000 docs) cannot trigger on the test corpus sizes the
  * oracle runs at.
  */
object MinhashOracle {

  private val M64 = "CAST('18446744073709551616' AS HUGEINT)" // 2^64
  private val HALF = "CAST('9223372036854775808' AS HUGEINT)" // 2^63

  private def hu(v: Long): String =
    s"CAST('${java.lang.Long.toUnsignedString(v)}' AS HUGEINT)"

  /** Unsigned [0,2^64) → signed Java long (as HUGEINT-valued expression). */
  private def toSigned(x: String): String =
    s"(CASE WHEN ($x) >= $HALF THEN ($x) - $M64 ELSE ($x) END)"

  /** Signed → unsigned [0,2^64). */
  private def toUnsigned(x: String): String =
    s"(CASE WHEN ($x) < 0 THEN CAST(($x) AS HUGEINT) + $M64 ELSE CAST(($x) AS HUGEINT) END)"

  /** 64-bit xor of two unsigned HUGEINT expressions. */
  private def xor64(a: String, b: String): String =
    toUnsigned(s"xor(CAST(${toSigned(a)} AS BIGINT), CAST(${toSigned(b)} AS BIGINT))")

  /** a * FNV prime mod 2^64 (prime < 2^41 — direct multiply is safe). */
  private def mulP(a: String): String = s"((($a) * 1099511628211) % $M64)"

  /** a*b mod 2^64 for a,b < 2^64 via 32-bit splitting of b. */
  private def mul64(a: String, b: String): String =
    s"(((($a) * (($b) % 4294967296)) + " +
      s"(((($a) * (($b) // 4294967296)) % 4294967296) * 4294967296)) % $M64)"

  /** logical >>> 33 on an unsigned value. */
  private def shr33(x: String): String = s"(($x) // 8589934592)"

  /** Shared CTE chain ending in pair(a, b, agree, cand). */
  private def coreCtes: String = {
    val permRows = (0 until Kernels.MinHashK).map { j =>
      s"($j, ${hu(Kernels.minhashPermA(j))}, ${hu(Kernels.minhashPermB(j))})"
    }.mkString(",\n        ")
    val fnvInit = hu(0xcbf29ce484222325L)
    val x1 = mul64(xor64("h2", shr33("h2")), hu(0xff51afd7ed558ccdL))
    val x2 = mul64(xor64("x1", shr33("x1")), hu(0xc4ceb9fe1a85ec53L))
    val base = xor64("x2", shr33("x2"))
    val sv = toSigned(s"((${mul64("base", "pa")}) + pb) % $M64")
    s"""perm(j, pa, pb) AS (VALUES $permRows),
      toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk
               FROM documents WHERE length(trim(text)) > 0),
      tokpos AS (SELECT doc_id, unnest(tk) AS t, unnest(range(1, len(tk)+1)) AS pos FROM toks),
      thr AS (SELECT doc_id, pos, list_reduce(list_prepend($fnvInit,
                list_transform(string_split(t, ''), ch -> ord(ch))),
                (h, c) -> ((h // 256) * 256 + xor(CAST(h % 256 AS BIGINT), c)) * 1099511628211 % $M64) AS hu
              FROM tokpos),
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
      sig AS (SELECT doc_id, j, min(sv) AS sg FROM vals GROUP BY doc_id, j),
      bandagg AS (SELECT x.doc_id AS a, y.doc_id AS b, x.j // 4 AS band,
                    sum(CASE WHEN x.sg = y.sg THEN 1 ELSE 0 END) AS nagree
                  FROM sig x JOIN sig y ON x.j = y.j AND x.doc_id < y.doc_id
                  GROUP BY 1, 2, 3),
      pair AS (SELECT a, b, sum(nagree) AS agree,
                 max(CASE WHEN nagree = 4 THEN 1 ELSE 0 END) AS cand
               FROM bandagg GROUP BY a, b)"""
  }

  /** Oracle for q_dedup_minhash: LSH candidate pairs with estimated jaccard. */
  lazy val candidatesSql: String =
    s"""WITH $coreCtes
      SELECT a, b, round(agree / 64.0, 4) AS est_jaccard
      FROM pair WHERE cand = 1 AND agree / 64.0 >= 0.35
      ORDER BY a, b"""

  /** Oracle for q_dedup_minhash_verified: candidates re-scored with exact
    * word-trigram jaccard (distinct gram strings — equal to the kernel's
    * gram-hash jaccard modulo 64-bit collisions, same as the
    * q_dedup_ngram_jaccard oracle). */
  lazy val verifiedSql: String =
    s"""WITH $coreCtes,
      candp AS (SELECT a, b FROM pair WHERE cand = 1 AND agree / 64.0 >= 0.35),
      ids AS (SELECT a AS doc_id FROM candp UNION SELECT b FROM candp),
      g AS (SELECT doc_id, list_distinct([list_aggregate(gt[i:i+2], 'string_agg', ' ')
              for i in range(1, greatest(len(gt) - 1, 2))]) AS grams
            FROM (SELECT d.doc_id, regexp_split_to_array(trim(d.text), '\\s+') AS gt
                  FROM documents d JOIN ids USING (doc_id)))
      SELECT c.a, c.b,
        round(len(list_intersect(ga.grams, gb.grams)) * 1.0 /
          len(list_distinct(list_concat(ga.grams, gb.grams))), 4) AS jaccard
      FROM candp c JOIN g ga ON ga.doc_id = c.a JOIN g gb ON gb.doc_id = c.b
      WHERE round(len(list_intersect(ga.grams, gb.grams)) * 1.0 /
          len(list_distinct(list_concat(ga.grams, gb.grams))), 4) >= 0.5
      ORDER BY a, b"""
}

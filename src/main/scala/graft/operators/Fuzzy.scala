package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate STRING matching: the edit-distance self-join (ED-Join
  * style) — find every pair of rows whose string values are within
  * Levenshtein distance `maxDist`, without the O(n²) all-pairs scan.
  *
  * The entity-resolution primitive (product titles, author names, URLs
  * with typos) that neither Spark nor the reference ships as an operator:
  * Spark plans a bare `levenshtein(a,b) <= k` join predicate as a
  * cartesian product.
  *
  * Why it scales — the q-gram count filter: one edit operation (insert /
  * delete / substitute) can destroy at most `q` of a string's character
  * q-grams, so two strings within edit distance k share at least
  * `|grams(x)| - k*q` distinct grams. Candidate generation therefore only
  * needs each string's PREFIX — its `k*q + 1` rarest grams in the global
  * (df, gram) order: two strings overlapping that much must collide
  * inside those prefixes (pigeonhole on the shared total order). The
  * candidate join runs on rare grams by construction (popular grams never
  * enter a prefix), so there is no hot-bucket blowup; exact
  * `levenshtein` verification then removes false candidates — recall is
  * 1.0, precision exact.
  *
  * Strings too short for the count filter to bite (fewer than `k*q + 1`
  * distinct grams — e.g. "ab" vs "cd" at k=2 share NO bigram) fall back
  * to a broadcast length-band block: the short set is tiny by definition
  * at corpus scale, and a length band `||x|-|y|| <= k` is the only sound
  * prefilter left, so they pair against everything within band via one
  * broadcast — never a shuffle of the big side.
  */
object Fuzzy {

  /** Distinct character q-grams of `s`, as an array column. Strings
    * shorter than q yield the whole string as a single gram so that
    * "a" vs "b" still participates (their distance is still verified
    * exactly). */
  private def charGrams(s: Column, q: Int): Column =
    array_distinct(when(length(s) < q, array(s)).otherwise(
      transform(sequence(lit(1), length(s) - (q - 1)),
        i => s.substr(i, lit(q)))))

  /** All pairs `(a, b, dist)` with `levenshtein <= maxDist`, `a < b` in
    * `idCol` order. `idCol` values must be unique (they are the pair
    * identity); callers dedup identical strings first if they want
    * set-level pairs (the same exact-collapse discipline as
    * [[Dedup.prefixFilteredJaccardJoin]]).
    */
  def editDistanceSelfJoin(strs: DataFrame, idCol: String, strCol: String,
      maxDist: Int, q: Int = 2): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    require(q >= 2, s"q must be >= 2, got $q")
    val minGrams = maxDist * q + 1

    val d = strs.select(col(idCol).as("id"), col(strCol).as("s"),
        length(col(strCol)).as("len"),
        charGrams(col(strCol), q).as("grams"))
      .withColumn("ng", size(col("grams")))
      .persist()

    // --- main tier: prefix-filtered candidates over count-filterable rows
    val big = d.where(col("ng") >= minGrams)
    val posting = big.select(col("id"), explode(col("grams")).as("gram"))
    val dfTab = posting.groupBy(col("gram")).agg(count(lit(1)).as("df"))
    // constant-length prefix (k*q + 1 rarest grams) — unlike the Jaccard
    // join's size-dependent prefix, the ED bound is absolute
    val prefix = posting.join(dfTab, "gram")
      .groupBy(col("id"))
      .agg(collect_list(struct(col("df"), col("gram"))).as("pg"))
      .select(col("id"),
        explode(slice(array_sort(col("pg")), 1, minGrams)).as("p"))
      .select(col("id"), col("p.gram").as("gram"))
    val mainCands = prefix.alias("x")
      .join(prefix.alias("y"),
        col("x.gram") === col("y.gram") && col("x.id") < col("y.id"))
      .select(col("x.id").as("ia"), col("y.id").as("ib"))

    // --- short tier: rows the count filter cannot bound, paired against
    // every row within the length band via broadcast (short is tiny)
    val short = d.where(col("ng") < minGrams)
      .select(col("id").as("sid"), col("len").as("slen"))
    val shortCands = d.select(col("id"), col("len"))
      .join(broadcast(short),
        col("id") =!= col("sid") &&
          abs(col("len") - col("slen")) <= maxDist)
      .select(least(col("id"), col("sid")).as("ia"),
        greatest(col("id"), col("sid")).as("ib"))

    // --- verify candidates with the exact distance (threshold form
    // early-exits rows that blow past maxDist mid-DP)
    val s = d.select(col("id"), col("s"), col("len"))
    mainCands.unionByName(shortCands)
      .dropDuplicates("ia", "ib")
      .join(s.select(col("id").as("ia"), col("s").as("sa"), col("len").as("la")), "ia")
      .join(s.select(col("id").as("ib"), col("s").as("sb"), col("len").as("lb")), "ib")
      .where(abs(col("la") - col("lb")) <= maxDist)
      .select(col("ia").as("a"), col("ib").as("b"),
        levenshtein(col("sa"), col("sb"), maxDist).as("dist"))
      .where(col("dist").between(0, maxDist))
  }
}

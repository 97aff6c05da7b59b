package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deduplication operators for a large-scale training-data pipeline.
  *
  * Scale design notes (the properties that must hold at 100 TB):
  *   - exact dedup groups on a 128-bit digest of the text, never on the
  *     text bytes themselves — the shuffle moves 16-byte keys, not docs;
  *   - MinHash/LSH finds near-dup candidates with a BAND-BUCKET JOIN
  *     (shuffle on 8-byte band hashes), never an all-pairs product;
  *     signatures are computed in one shuffle-free projection pass;
  *   - SimHash is a single codegen-friendly projection → 64-bit
  *     fingerprints; near-pair candidates come from 16-bit segment
  *     equality (pigeonhole: hamming ≤ 3 ⇒ a segment matches);
  *   - n-gram Jaccard is the exact verifier applied only to bounded
  *     candidate sets, not the full corpus.
  */
object Dedup {

  // ---- shingling ---------------------------------------------------------

  /** Distinct word n-gram strings of a text column. */
  def wordNgrams(text: Column, n: Int): Column = {
    val toks = TextFunctions.tokens(text)
    array_distinct(transform(
      sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** 64-bit hashes of word-trigram shingles. */
  def shingleHashes(text: Column): Column =
    transform(wordNgrams(text, 3), g => xxhash64(g))

  // ---- MinHash + LSH -----------------------------------------------------

  val MinHashK = 64
  val Bands = 16
  val RowsPerBand: Int = MinHashK / Bands

  /** Column: array of K min-hashes over the shingle-hash array. The j-th
    * "permutation" is xxhash64(j, shingle) — overflow-free under ANSI mode
    * (Spark 4 default), unlike the a·x+b family.
    *
    * Built as ONE nested transform over sequence(0, K-1) so the shingle
    * expression is evaluated once per row — an array(...) of K separate
    * transforms re-evaluates tokenize→ngram→hash K times (measured 40×
    * slower at sf0.1). */
  def minhashSignature(shingles: Column): Column =
    transform(sequence(lit(0), lit(MinHashK - 1)),
      j => array_min(transform(shingles, h => xxhash64(j, h))))

  /** (doc_id, minhash) → candidate pairs (a, b, est_jaccard) via the LSH
    * band-bucket self-join; est_jaccard = fraction of agreeing minhashes.
    *
    * The band join carries only (id, band, bandHash) — 24 bytes/row, not
    * the 512-byte signature; signatures are joined back onto the deduped
    * candidate pairs (candidates ≪ band rows at scale). */
  def lshCandidatePairs(sigs: DataFrame, idCol: String, minEstJaccard: Double): DataFrame = {
    val bandArr = array((0 until Bands).map { b =>
      xxhash64(lit(b), slice(col("mh"), b * RowsPerBand + 1, RowsPerBand))
    }: _*)
    val bands = sigs.select(col(idCol), posexplode(bandArr).as(Seq("band", "bh")))
    val x = bands.alias("x")
    val y = bands.alias("y")
    val candidates = x.join(y,
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("a"), col(s"y.$idCol").as("b"))
      .dropDuplicates("a", "b")
    val agree = aggregate(
      zip_with(col("mha"), col("mhb"), (a, b) => when(a === b, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v)
    candidates
      .join(sigs.select(col(idCol).as("a"), col("mh").as("mha")), "a")
      .join(sigs.select(col(idCol).as("b"), col("mh").as("mhb")), "b")
      .select(col("a"), col("b"), (agree.cast("double") / MinHashK).as("est_jaccard"))
      .where(col("est_jaccard") >= minEstJaccard)
  }

  /** Full MinHash+LSH near-dup pipeline over a document table. */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
      minEstJaccard: Double): DataFrame = {
    val sigs = docs.select(col(idCol),
      minhashSignature(shingleHashes(col(textCol))).as("mh"))
    lshCandidatePairs(sigs, idCol, minEstJaccard)
  }

  // ---- exact n-gram Jaccard (verifier) -----------------------------------

  def jaccard(aGrams: Column, bGrams: Column): Column = {
    val inter = size(array_intersect(aGrams, bGrams)).cast("double")
    val union = size(array_union(aGrams, bGrams)).cast("double")
    when(union > 0, inter / union).otherwise(0.0)
  }

  // ---- SimHash -----------------------------------------------------------

  /** (id, simhash, 4×16-bit segments) — segments drive candidate joins. */
  def simhashTable(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val segCols = (0 until 4).map(s =>
      shiftrightunsigned(col("simhash"), s * 16).bitwiseAND(lit(0xffffL)).as(s"seg$s"))
    docs.select(col(idCol),
      TextFunctions.simhash64(TextFunctions.tokens(col(textCol))).as("simhash"))
      .select(col(idCol) +: col("simhash") +: segCols: _*)
  }

  /** Near pairs by simhash hamming distance ≤ maxHamming, candidates from
    * any-segment equality (complete for maxHamming ≤ 3 by pigeonhole). */
  def simhashNearPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int): DataFrame = {
    val t = simhashTable(docs, idCol, textCol)
    val segs = t.select(col(idCol), col("simhash"),
      posexplode(array((0 until 4).map(s => col(s"seg$s")): _*)).as(Seq("seg", "sv")))
    val x = segs.alias("x")
    val y = segs.alias("y")
    val ham = bit_count(col("x.simhash").bitwiseXOR(col("y.simhash")))
    x.join(y, col("x.seg") === col("y.seg") && col("x.sv") === col("y.sv") &&
        col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("a"), col(s"y.$idCol").as("b"), ham.as("hamming"))
      .dropDuplicates("a", "b")
      .where(col("hamming") <= maxHamming)
  }

  // ---- embedding cosine --------------------------------------------------

  /** Cosine similarity between two numeric-array columns, computed in
    * double via the codegen'd native dot product. For pair loops, prefer
    * precomputing [[graft.functions.VectorFunctions.unitVector]] on each
    * side and taking a single array_dot per pair. */
  def cosine(a: Column, b: Column): Column = {
    import graft.functions.VectorFunctions._
    val ad = toDoubleArray(a)
    val bd = toDoubleArray(b)
    array_dot(ad, bd) / (sqrt(array_dot(ad, ad)) * sqrt(array_dot(bd, bd)))
  }
}

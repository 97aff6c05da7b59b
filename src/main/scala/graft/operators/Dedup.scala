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
  *     fingerprints; near-pair candidates come from segment equality with
  *     maxHamming+1 segments (pigeonhole: hamming ≤ maxHamming ⇒ some
  *     segment matches), so candidates are complete for the radius;
  *   - n-gram Jaccard is the exact verifier applied only to bounded
  *     candidate sets, not the full corpus.
  */
object Dedup {

  // ---- exact-duplicate text classes --------------------------------------

  /** The text-CLASS digest: the first 16 bytes of SHA-256(text), as a
    * true BinaryType value. Two properties the whole dedup/collapse
    * surface keys on, both of which the previous `md5()` key failed:
    *   - WIDTH: Spark's `md5()` returns a 32-char lowercase-hex STRING —
    *     32 bytes of UTF8 plus offsets riding every exchange and join;
    *     this key is a real 16-byte binary value, halving key bytes
    *     across every collapse-first and dedup shuffle (CollapsePlanSpec
    *     pins the type and width);
    *   - STRENGTH: MD5 chosen-prefix collisions are practical, and the
    *     collapse-first rewrite routes every corpus statistic (quality,
    *     OOV, bigram scores, decontamination, jaccard verification)
    *     through this key over adversarial web-crawl text — a crafted
    *     collision would silently merge two different texts into one
    *     class. A 128-bit truncation of SHA-256 has no known structural
    *     attacks; accidental collisions stay birthday-bounded (~2⁻⁶⁴ at
    *     corpus scale).
    * NULL text digests to NULL (sha2/unhex/substring all null-propagate)
    * — exactly the semantics of the md5 key it replaces, so the
    * null-safe class joins are unchanged. */
  def classDigest(text: Column): Column =
    substring(unhex(sha2(text, 256)), 1, 16)

  /** Session conf: collapse tier selection for the text-class family.
    * `"always"` — collapse regardless (the r15 behavior; what Verify
    * pins so the scale path stays oracle-gated); `"never"` — identity
    * mapping regardless (differential testing); `"auto"` (default) —
    * collapse unless [[DuplicationRatioConf]] says the corpus is ~all
    * distinct. */
  val CollapseModeConf = "spark.graft.collapse.mode"

  /** Session conf: measured corpus duplication ratio (rows / distinct
    * texts), set per fixture by [[graft.Tables.documents]] from the
    * staged [[graft.CorpusProfile]] — a frozen offline measurement, so
    * reading it keeps plan construction job-free (the same contract as
    * ivfScreenAuto's Catalyst-stats tier choice). Absent ⇒ collapse:
    * the safe default for the duplication-heavy population these
    * operators exist for. */
  val DuplicationRatioConf = "spark.graft.collapse.duplicationRatio"

  /** Below this measured duplication ratio the class mapping's two
    * small shuffles cannot pay for themselves (an all-distinct corpus
    * maps one class per doc — pure overhead, the measured +0.07–0.2 s
    * per sf0.1 query). 1.05 leaves margin for the profile's ±1%
    * approx-distinct error; near the boundary both tiers are
    * row-identical anyway (CollapseDifferentialSpec), so the choice is
    * purely a plan-shape decision. */
  val MinCollapseDuplication = 1.05

  /** The collapse-or-identity tier decision. The IDENTITY tier maps
    * every doc to its own class (rep = id, m = 1): that is a valid
    * text-class partition — every consumer reduces additively over
    * (rep, m), so the identity mapping computes exactly the uncollapsed
    * doc-level form, row-identically — with the fp aggregate and both
    * mapping shuffles GONE from the plan. */
  private[graft] def collapseWorthwhile(docs: DataFrame): Boolean = {
    val conf = docs.sparkSession.conf
    conf.getOption(CollapseModeConf).getOrElse("auto") match {
      case "always" => true
      case "never" => false
      case _ =>
        // Resolve from the plan's OWN scan provenance first: the corpus
        // this DataFrame actually reads carries its measured ratio in
        // the CorpusProfile registry, so two corpora with different
        // duplication in one session each tier off their own
        // measurement regardless of load order. The session conf is the
        // fallback for externally-constructed inputs (in-memory test
        // frames, non-fixture paths) — absent ⇒ collapse, the safe
        // default for the duplication-heavy population these operators
        // exist for.
        graft.CorpusProfile.ratioForPlan(docs)
          .orElse(conf.getOption(DuplicationRatioConf)
            .flatMap(v => scala.util.Try(v.toDouble).toOption))
          .forall(_ >= MinCollapseDuplication)
    }
  }

  /** The ONE aggregate that defines "text class": the per-doc
    * `(doc, fp)` digest projection and its grouped form
    * `(fp, rep = min id, m = copies)`. Every class consumer —
    * [[textClasses]], [[classReps]], [[perClassValue]], the registered
    * collapse-first queries — derives from THIS pair, so the definition
    * exists once and a plan using both the mapping and the reps carries
    * ONE physical digest aggregate (the consumers share the identical
    * subtree; AQE's ReuseExchange deduplicates it — CollapsePlanSpec).
    *
    * DETERMINISM CONTRACT: `docs` must re-evaluate to the same rows.
    * The mapping join and the rep selection are separate consumers of
    * the same logical subtree; a non-deterministic input (`sample()`,
    * an uncheckpointed shuffle ordering feeding `min()`) could make the
    * independently evaluated sides disagree on reps and silently drop
    * rows at the rep equi-joins. Materialize such inputs first
    * (localCheckpoint) — every registered query reads deterministic
    * parquet. */
  private def classAggregate(docs: DataFrame, idCol: String,
      textCol: String): (DataFrame, DataFrame) = {
    val fp = docs.select(col(idCol).as("doc"), classDigest(col(textCol)).as("fp"))
    val classes = fp.groupBy(col("fp"))
      .agg(min(col("doc")).as("rep"), count(lit(1)).as("m"))
    (fp, classes)
  }

  /** doc → exact-duplicate TEXT-CLASS mapping: one row per input doc with
    * its class representative (`rep` = min doc id sharing the text) and
    * the class size (`m`). The collapse-first primitive for corpus-wide
    * text statistics: any per-document value that is a pure function of
    * (text, corpus aggregates) can be computed once per DISTINCT text —
    * weight corpus aggregates by `m`, reduce per `rep`, and expand each
    * doc to its class row through this mapping. On a duplication-heavy
    * corpus (the population a curation pipeline actually processes) that
    * divides the token-explode, the count shuffles, and the probe joins
    * by the duplication factor, while the mapping itself shuffles only
    * 24-byte (digest, id) pairs — never text.
    *
    * Null text forms its own class (the digest-null group survives the
    * null-safe self-join), so the mapping is TOTAL over the input.
    * Determinism contract: see [[classAggregate]]. Tier: on a measured
    * ~all-distinct corpus ([[collapseWorthwhile]]) the mapping is the
    * IDENTITY (rep = id, m = 1) — a valid class partition that turns
    * every consumer into its uncollapsed doc-level form with zero
    * mapping shuffles; outputs are row-identical either way. */
  def textClasses(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    if (!collapseWorthwhile(docs))
      return docs.select(col(idCol).as("doc"), col(idCol).as("rep"),
        lit(1L).as("m"))
    val (fp, classes) = classAggregate(docs, idCol, textCol)
    fp.alias("d").join(classes.alias("c"), col("d.fp") <=> col("c.fp"))
      .select(col("d.doc").as("doc"), col("c.rep").as("rep"), col("c.m").as("m"))
  }

  /** One row per text class: (rep, m, <textCol> of the representative).
    * Companion to [[textClasses]] — the input to the collapsed per-class
    * computation. The id equi-join selects exactly the representative
    * rows (rep is a real doc id, unique by construction). */
  def classReps(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    if (!collapseWorthwhile(docs))
      return docs.select(col(idCol).as("rep"), lit(1L).as("m"), col(textCol))
    val (_, classes) = classAggregate(docs, idCol, textCol)
    docs.join(classes.select(col("rep"), col("m")), col(idCol) === col("rep"))
      .select(col("rep"), col("m"), col(textCol))
  }

  /** (id, <valueName>) where `kernel(text)` is evaluated ONCE per
    * DISTINCT text and expanded through the class mapping — the
    * collapse-first move for expensive pure-of-text kernels (minhash
    * signatures, simhash fingerprints). Totality and null semantics
    * follow [[textClasses]]: every input doc gets a row, and a null
    * text's class carries the kernel's null result. Both internal
    * consumers (the mapping join and the rep-text selection) derive
    * from one [[classAggregate]] call, so the digest aggregate is
    * physically computed once (ReusedExchange). */
  private def perClassValue(docs: DataFrame, idCol: String, textCol: String,
      kernel: Column => Column, valueName: String): DataFrame = {
    // identity tier: kernel straight per row — the uncollapsed form
    if (!collapseWorthwhile(docs))
      return docs.select(col(idCol), kernel(col(textCol)).as(valueName))
    // m-less aggregate ON PURPOSE: the mapping join needs (fp, rep) and
    // the rep selection needs (rep) — with count(m) in the aggregate,
    // column pruning gives the rep-selection consumer a min-only
    // aggregate while the mapping keeps min+count, the partial
    // aggregates (and so the exchanges) diverge, and ReuseExchange's
    // canonical-equality check can no longer dedup them: the digest
    // scan would physically run twice (observed in CollapsePlanSpec
    // before this form). With both consumers pruning to the same
    // min-only aggregate, the plan carries ONE fp exchange + a
    // ReusedExchange.
    val fp = docs.select(col(idCol).as("doc"), classDigest(col(textCol)).as("fp"))
    val classes = fp.groupBy(col("fp")).agg(min(col("doc")).as("rep"))
    val repVal = docs.join(classes.select(col("rep")), col(idCol) === col("rep"))
      .select(col("rep"), kernel(col(textCol)).as(valueName))
    fp.alias("d").join(classes.alias("c"), col("d.fp") <=> col("c.fp"))
      .select(col("d.doc").as("doc"), col("c.rep").as("rep"))
      .join(repVal, "rep")
      .select(col("doc").as(idCol), col(valueName))
  }

  // ---- shingling ---------------------------------------------------------

  /** Distinct word n-gram strings of a text column. */
  /** Distinct word n-grams in first-occurrence order, as one codegen'd
    * native pass ([[graft.functions.Kernels.wordNgrams]]). The composed
    * `array_distinct(transform(sequence, i -> concat_ws(slice(toks...))))`
    * form this replaces is interpreted and re-evaluates the token array
    * per gram — O(tokens²)/row: the 20× cluster probe went 188 s → 12 s
    * with this kernel (→ 4.9 s once the candidate set was also cached;
    * see SCALE.md). KernelsSpec pins the two forms equal. */
  def wordNgrams(text: Column, n: Int): Column =
    graft.functions.KernelExpressions.word_ngrams(text, n)

  // ---- MinHash + LSH -----------------------------------------------------

  val MinHashK: Int = graft.functions.Kernels.MinHashK
  val Bands = 16
  val RowsPerBand: Int = MinHashK / Bands

  /** Column: array of K min-hashes over word-trigram shingles of the text,
    * computed by the native [[graft.functions.KernelExpressions.MinHashSig]]
    * expression — one tight JVM pass per row inside whole-stage codegen.
    * (The round-1 nested-transform formulation was interpreted per element
    * and measured 356 s at sf0.1; the kernel does the same math in ~1 s.) */
  def minhashSignature(text: Column): Column =
    graft.functions.KernelExpressions.minhash_sig(text)

  /** (doc_id, minhash) → candidate pairs (a, b, est_jaccard) via the LSH
    * band-bucket self-join; est_jaccard = fraction of agreeing minhashes.
    *
    * The band join carries only (id, band, bandHash) — 24 bytes/row, not
    * the 512-byte signature; signatures are joined back onto the deduped
    * candidate pairs (candidates ≪ band rows at scale). */
  /** Skew guard: band buckets larger than this are dropped from the
    * self-join. A bucket of B identical/near-identical docs generates
    * B²/2 candidate pairs — at 100 TB a single viral boilerplate page
    * would otherwise dominate the whole job. Buckets this hot are
    * near-certainly exact-duplicate content, which the (cheaper) exact
    * dedup pass should collapse FIRST (the MinHashDeduper pipeline stage
    * composes after ExactDeduper for exactly this reason). */
  val MaxBucketSize = 10000

  def lshCandidatePairs(sigs: DataFrame, idCol: String, minEstJaccard: Double,
      maxBucket: Int = MaxBucketSize): DataFrame = {
    val bandArr = array((0 until Bands).map { b =>
      xxhash64(lit(b), slice(col("mh"), b * RowsPerBand + 1, RowsPerBand))
    }: _*)
    val allBands = sigs.select(col(idCol), posexplode(bandArr).as(Seq("band", "bh")))
    // aggregate on the 16-byte (band, bh) key — tiny shuffle — then
    // anti-join the hot buckets out before the quadratic self-join
    val hot = allBands.groupBy(col("band"), col("bh"))
      .agg(count(lit(1)).as("n")).where(col("n") > maxBucket)
      .select(col("band"), col("bh"))
    val bands = allBands.join(broadcast(hot), Seq("band", "bh"), "left_anti")
    val x = bands.alias("x")
    val y = bands.alias("y")
    val candidates = x.join(y,
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("a"), col(s"y.$idCol").as("b"))
      .dropDuplicates("a", "b")
    candidates
      .join(sigs.select(col(idCol).as("a"), col("mh").as("mha")), "a")
      .join(sigs.select(col(idCol).as("b"), col("mh").as("mhb")), "b")
      .select(col("a"), col("b"),
        graft.functions.KernelExpressions.sig_agree(col("mha"), col("mhb")).as("est_jaccard"))
      .where(col("est_jaccard") >= minEstJaccard)
  }

  /** Full MinHash+LSH near-dup pipeline over a document table.
    *
    * EXACT-COLLAPSE first (the same recipe as [[exactJaccardEdges]] and
    * [[simhashNearPairs]]): identical text ⇒ identical signature ⇒
    * identical banding and identical agreement against every other doc,
    * so docs sharing a signature VALUE collapse to one representative
    * before the band self-join and expand after (within-group pairs are
    * est 1.0 by definition; cross pairs inherit their reps' agreement).
    * On a k×-replicated corpus the band buckets otherwise pay k²
    * (measured 11.1 s → 2.9 s at the 20× probe); this also realizes the
    * MaxBucketSize scaladoc's intent — hot buckets of EXACT duplicates
    * are now collapsed by construction, and the guard only sees
    * distinct-content collisions. NULL-signature docs (NULL text) never
    * produced a surviving pair before (null agreement fails the
    * threshold) and are excluded up front now — same output. */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
      minEstJaccard: Double): DataFrame = {
    // signature kernel once per DISTINCT text (perClassValue) — the
    // mh-value groupBy below collapses the PAIR volume, but without this
    // every copy still paid the 64-hash-per-gram signature itself
    val sigs = perClassValue(docs, idCol, textCol, minhashSignature, "mh")
      .where(col("mh").isNotNull)
    val groups = sigs.groupBy(col("mh"))
      .agg(min(col(idCol)).as("rep"),
        sort_array(collect_list(col(idCol))).as("members"))
      .localCheckpoint(true) // three consumers; released with the plan
    val repPairs = lshCandidatePairs(
      groups.select(col("rep").as(idCol), col("mh")), idCol, minEstJaccard)
    expandMemberPairs(groups, repPairs, "est_jaccard")
  }

  /** Expand rep-level pairs to member level — ONE home for the
    * explode-members / least-greatest expansion (r18 review: this block
    * existed in three near-verbatim copies; a fix applied to one and
    * not the others is exactly how the r16 tokenizer divergence
    * landed). `groups` = (rep, members, …); `repPairs` = (a, b,
    * <scoreName>) at rep level. Within-group pairs (identical class
    * value by construction: same text, or same signature for the
    * minhash candidate tier) carry exactly 1.0 — for candidates that is
    * the estimate of an identical signature, for verified pairs the
    * exact Jaccard of identical text ([[sortedGramHashes]] is never
    * empty, so `jaccardSorted(g,g) ≡ 1.0`). */
  private def expandMemberPairs(groups: DataFrame, repPairs: DataFrame,
      scoreName: String): DataFrame = {
    val within = groups.where(size(col("members")) > 1)
      .select(explode(col("members")).as("a"), col("members"))
      .select(col("a"), explode(col("members")).as("b"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"), lit(1.0).as(scoreName))
    val cross = repPairs
      .join(groups.select(col("rep").as("ra"), col("members").as("mx")),
        col("a") === col("ra"))
      .join(groups.select(col("rep").as("rb"), col("members").as("my")),
        col("b") === col("rb"))
      .select(explode(col("mx")).as("a0"), col("my"), col(scoreName))
      .select(col("a0"), explode(col("my")).as("b0"), col(scoreName))
      .select(least(col("a0"), col("b0")).as("a"),
        greatest(col("a0"), col("b0")).as("b"), col(scoreName))
    within.unionByName(cross)
  }

  /** MinHash/LSH candidate generation + EXACT n-gram Jaccard verification,
    * fused as ONE text-class collapse — the full near-dup pipeline that
    * runs at 100 TB (reference: sparkdl near-dup composition; candidates
    * via [[lshCandidatePairs]], verification via [[sortedGramHashes]] +
    * the sorted-merge kernel).
    *
    * Verification happens on CLASS pairs BEFORE member expansion. The
    * composed form ([[minhashNearDups]] → rescore) expands candidates to
    * member level (quadratic in duplicate-group size: 27.3 M rows at the
    * 100× fixture), then must re-collapse that fact table through two
    * text-class joins to score each distinct (text, text) pair once.
    * Here the expansion is the LAST step and carries the verified score
    * with it, so the member-level volume is never joined, deduped, or
    * re-collapsed — it is only produced, filtered-by-construction
    * (survivor classes only), and emitted:
    *
    *   - ONE digest aggregate carries rep id, sorted members, and the rep
    *     TEXT via `min_by` (the r17 verifier recipe — no join-based rep
    *     selection, which SMJ-ships corpus text; see [[gramClassesPlan]]);
    *     the signature AND gram kernels run once per DISTINCT text in the
    *     aggregate's output projection — the 100×-replicated corpus text
    *     is scanned exactly once end to end (the composed form scanned it
    *     a second time to build verification grams).
    *   - LSH band self-join over class reps only; hot-bucket guard and
    *     `est >= minEstJaccard` apply at class level (same candidate set:
    *     identical text ⇒ identical signature, so member-level banding
    *     adds only within-class pairs, handled exactly below).
    *   - Exact Jaccard scores each surviving class PAIR once; pairs below
    *     `minJaccard` die before any member expansion.
    *   - Within-class pairs (identical text) score exactly 1.0 through
    *     the same kernel ([[sortedGramHashes]] is never empty — empty
    *     text yields the single hash of "" — so `jaccardSorted(g, g)` is
    *     identically 1.0); they are emitted as `lit(1.0)` without paying
    *     the kernel, which `MinhashVerifiedSpec` pins equal.
    *
    * Collapse-tier contract: ONE plan regardless of
    * [[collapseWorthwhile]] — the composed form always paid a
    * signature-value groupBy whatever the tier, so the aggregate here
    * is not avoidable cost, and a doc-level "identity" tier would band
    * every member of a large identical-text group as its own rep,
    * driving the group straight into [[lshCandidatePairs]]' hot-bucket
    * guard (10 001 identical docs → all pairs silently dropped — a
    * latent tier divergence the single-plan form cannot have; r18
    * review). On a ~all-distinct corpus the aggregate degenerates to
    * one doc per class at the same cost class as the old groupBy.
    *
    * Divergence bound vs the composed form: a pair of DISTINCT texts
    * whose signatures collide in all 64 positions is found here only via
    * banding (identical signatures co-bucket in all 16 bands), so it is
    * lost only if every one of its 16 buckets is hot-guarded away —
    * strictly narrower than the composed form's own hot-bucket carve-out
    * at member level, and void for identical-gram-set texts (where the
    * verified score is 1.0 regardless of which path found the pair). */
  def minhashVerifiedPairs(docs: DataFrame, idCol: String, textCol: String,
      minEstJaccard: Double, minJaccard: Double, gramN: Int = 3): DataFrame = {
    require(minJaccard > 0 && minJaccard <= 1.0,
      s"minJaccard must be in (0, 1], got $minJaccard (the within-class " +
        "fast path emits identical-text pairs at exactly 1.0)")
    // gram arrays ride the class table: the gram kernel is ~1/64 the work
    // of the signature kernel already paid per distinct text, and keeping
    // them here (instead of re-deriving from text per candidate) makes
    // the scoring joins checkpoint-local — no second text scan, no
    // semi-join staging. NULL text ⇒ NULL signature ⇒ no pairs, exactly
    // the composed form's `where(mh.isNotNull)` screen.
    val classes = docs
      .select(classDigest(col(textCol)).as("fp"), col(idCol).as("doc"),
        col(textCol).as("__t"))
      .groupBy(col("fp"))
      .agg(min(col("doc")).as("rep"),
        sort_array(collect_list(col("doc"))).as("members"),
        min_by(col("__t"), col("doc")).as("__t"))
      .select(col("rep"), col("members"),
        minhashSignature(col("__t")).as("mh"),
        sortedGramHashes(col("__t"), gramN).as("grams"))
      .where(col("mh").isNotNull)
      .localCheckpoint(true) // six consumers; released with the plan
    val repPairs = lshCandidatePairs(
      classes.select(col("rep").as(idCol), col("mh")), idCol, minEstJaccard)
    // class-pair scoring: candidates are small vs classes, so AQE
    // broadcasts the candidate side and the gram arrays never shuffle
    val scored = repPairs
      .join(classes.select(col("rep").as("a"), col("grams").as("ga")), "a")
      .join(classes.select(col("rep").as("b"), col("grams").as("gb")), "b")
      .select(col("a"), col("b"),
        round(graft.functions.KernelExpressions.jaccard_sorted(
          col("ga"), col("gb")), 4).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
    expandMemberPairs(classes, scored, "jaccard")
  }

  // ---- exact n-gram Jaccard (verifier) -----------------------------------

  def jaccard(aGrams: Column, bGrams: Column): Column = {
    val inter = size(array_intersect(aGrams, bGrams)).cast("double")
    val union = size(array_union(aGrams, bGrams)).cast("double")
    when(union > 0, inter / union).otherwise(0.0)
  }

  /** Distinct sorted 64-bit hashes of word n-grams — the pair-loop-ready
    * shingle form: Jaccard over these equals Jaccard over the gram strings
    * (modulo 64-bit collisions), and the sorted-merge kernel
    * [[graft.functions.KernelExpressions.jaccard_sorted]] scores a pair in
    * O(|a|+|b|) with zero allocation, vs hash-set array_intersect/union.
    * One native pass (tokenize → gram-string hash → sort-dedup) — the
    * composed transform/distinct/sort chain was interpreted. */
  def sortedGramHashes(text: Column, n: Int): Column =
    graft.functions.KernelExpressions.sorted_gram_hashes(text, n)

  // ---- SimHash -----------------------------------------------------------

  /** (shift, width) layout splitting the 64 simhash bits into
    * `numSegments` near-equal segments (first `64 % n` segments get the
    * extra bit). */
  private[operators] def segmentLayout(numSegments: Int): Seq[(Int, Int)] = {
    require(numSegments >= 1 && numSegments <= 64, s"numSegments must be in [1,64], got $numSegments")
    val base = 64 / numSegments
    val rem = 64 % numSegments
    var shift = 0
    (0 until numSegments).map { s =>
      val w = base + (if (s < rem) 1 else 0)
      val out = (shift, w)
      shift += w
      out
    }
  }

  /** (id, simhash, per-segment columns) — segments drive candidate joins.
    * Pigeonhole: a pair at hamming ≤ numSegments−1 must agree on at least
    * one whole segment. */
  def simhashTable(docs: DataFrame, idCol: String, textCol: String,
      numSegments: Int = 4): DataFrame = {
    val segCols = segmentLayout(numSegments).zipWithIndex.map { case ((sh, w), s) =>
      val mask = if (w >= 64) -1L else (1L << w) - 1
      shiftrightunsigned(col("simhash"), sh).bitwiseAND(lit(mask)).as(s"seg$s")
    }
    // fingerprint once per DISTINCT text (perClassValue); the bit-slicing
    // projections stay per-doc (free) and null text keeps its null row
    perClassValue(docs, idCol, textCol,
      graft.functions.KernelExpressions.simhash64, "simhash")
      .select(col(idCol) +: col("simhash") +: segCols: _*)
  }

  /** Near pairs by simhash hamming distance ≤ maxHamming. The segment
    * count DERIVES from the radius — maxHamming+1 segments — so by
    * pigeonhole every pair within the radius shares at least one whole
    * segment: candidate generation is COMPLETE for the requested radius,
    * not just for a fixed small one. maxHamming is capped at 31 (below
    * 2-bit segments the "hash" join degenerates toward all-pairs — 32+
    * differing bits out of 64 is not a near-duplicate regime).
    * Same hot-bucket guard as the MinHash bands: a (seg, value) bucket of
    * B docs is B²/2 candidates, and buckets that hot (e.g. the all-zero
    * segments of near-empty docs) are exact-dedup territory.
    * `maxBucket`'s UNIT is distinct simhash VALUES per (seg, value)
    * bucket, not docs — exact-collapse runs first, so replication never
    * trips the guard, and hamming-0 (identical-hash) pairs are emitted
    * unconditionally even when every shared segment bucket is hot.
    * Callers tuning the old docs-per-bucket threshold get strictly
    * higher recall under the same number. */
  def simhashNearPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int, maxBucket: Int = MaxBucketSize): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 31,
      s"maxHamming must be in [0, 31], got $maxHamming")
    val nSeg = maxHamming + 1
    // EXACT-COLLAPSE first, like [[exactJaccardEdges]]: identical text ⇒
    // identical simhash, so every doc sharing a simhash VALUE has the
    // same hamming distance to everything — collapse to one
    // representative per distinct simhash, run the segment join over
    // representatives, expand after. On a k×-replicated corpus (the
    // CC-crawl shape the 20× probe models) the candidate join otherwise
    // pays k² per bucket: measured 47 s → the collapsed form's pair
    // probe volume is distinct-content-bounded. NULL simhash (NULL
    // text) stays excluded from pairing, as the null-safe predicate
    // already guaranteed.
    val groups = perClassValue(docs, idCol, textCol,
        graft.functions.KernelExpressions.simhash64, "simhash")
      .where(col("simhash").isNotNull)
      .groupBy(col("simhash"))
      .agg(min(col(idCol)).as("rep"),
        sort_array(collect_list(col(idCol))).as("members"))
      .localCheckpoint(true) // three consumers; released with the plan
    val segCols = segmentLayout(nSeg).zipWithIndex.map { case ((sh, w), s) =>
      val mask = if (w >= 64) -1L else (1L << w) - 1
      shiftrightunsigned(col("simhash"), sh).bitwiseAND(lit(mask)).as(s"seg$s")
    }
    val t = groups.select(col("rep") +: col("simhash") +: segCols: _*)
    val allSegs = t.select(col("rep"), col("simhash"),
      posexplode(array((0 until nSeg).map(s => col(s"seg$s")): _*)).as(Seq("seg", "sv")))
    val hot = allSegs.groupBy(col("seg"), col("sv"))
      .agg(count(lit(1)).as("n")).where(col("n") > maxBucket)
      .select(col("seg"), col("sv"))
    val segs = allSegs.join(broadcast(hot), Seq("seg", "sv"), "left_anti")
    val x = segs.alias("x")
    val y = segs.alias("y")
    val ham = bit_count(col("x.simhash").bitwiseXOR(col("y.simhash")))
    // The hamming cut sits IN the join predicate: real simhashes cluster
    // (correlated bits), so chance segment collisions can dwarf the true
    // near pairs — pre-filter volume must die inside the join stage, not
    // ride through a dropDuplicates aggregate first. (hamming is a pure
    // function of the pair, so filtering before pair-dedup is identical.)
    val repPairs = x.join(y,
        col("x.seg") === col("y.seg") && col("x.sv") === col("y.sv") &&
        col("x.rep") < col("y.rep") && ham <= maxHamming)
      .select(col("x.rep").as("ra"), col("y.rep").as("rb"), ham.as("hamming"))
      .dropDuplicates("ra", "rb")
    // expand: within-group pairs are hamming 0 (identical simhash —
    // always within any radius ≥ 0); cross-group pairs inherit their
    // representatives' hamming. Each doc lives in exactly one group, so
    // the expanded pairs are disjoint — no pair-level dedup needed.
    val within = groups.where(size(col("members")) > 1)
      .select(explode(col("members")).as("a"), col("members"))
      .select(col("a"), explode(col("members")).as("b"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"), lit(0).as("hamming"))
    val cross = repPairs
      .join(groups.select(col("rep").as("ra"), col("members").as("mx")), "ra")
      .join(groups.select(col("rep").as("rb"), col("members").as("my")), "rb")
      .select(explode(col("mx")).as("a0"), col("my"), col("hamming"))
      .select(col("a0"), explode(col("my")).as("b0"), col("hamming"))
      .select(least(col("a0"), col("b0")).as("a"),
        greatest(col("a0"), col("b0")).as("b"), col("hamming"))
    within.unionByName(cross)
  }

  /** EXACT set-similarity self-join via prefix filtering (ppjoin-style):
    * every pair with word-n-gram Jaccard >= `threshold`, with a
    * completeness GUARANTEE — the deterministic alternative to the
    * probabilistic MinHash path, for when recall must be 1.0.
    *
    * Why it scales: each document contributes only its PREFIX grams to
    * the candidate join — the first `|x| - ceil(t*|x|) + 1` grams in the
    * global (df, gram) order. Correctness: J(x,y) >= t implies
    * |x∩y| >= t*|x∪y| >= ceil(t*|x|), and two sets overlapping that much
    * must share an element inside those prefixes (pigeonhole on the
    * shared total order), so every qualifying pair surfaces as a
    * candidate; the exact Jaccard verification then removes false
    * candidates. Rare-first ordering makes prefixes hit the LOW-df grams,
    * so the candidate join is self-limiting — no hot-bucket blowup by
    * construction (the popular grams never enter prefixes).
    *
    * Plan — built for corpora where duplication is the POINT (CC-style
    * crawls duplicate heavily): (1) EXACT-COLLAPSE first on the 16-byte
    * TEXT digest ([[classDigest]]) — r17: the pre-r17 form grouped on
    * the full gram ARRAY, which ran the gram kernel on every copy and
    * shuffled each doc's whole hash array as both grouping key and
    * value; the digest collapse shuffles 24-byte (digest, id) rows and
    * runs the kernel once per DISTINCT text (two texts with equal
    * gram-sets but different bytes now verify as a 1.0-scoring cross
    * pair instead of pre-collapsing — same output); (2) run the
    * prefix-filter candidate join over REPRESENTATIVES only, so the
    * quadratic candidate cost scales with distinct content, never with
    * raw row count — with the ppjoin POSITION and LENGTH bounds in the
    * join condition (see below); (3) expand class-level results back to
    * doc pairs: within-class pairs are J = 1.0 by construction
    * (identical texts), cross-class pairs inherit their
    * representatives' kernel-verified score. Stage (2) computes gram df
    * by hash aggregation (map-side partials) and per-rep prefix
    * selection as collect_list → array_sort → slice — no global sort
    * anywhere. Docs with empty gram-sets score 0.0 against everything
    * (kernel semantics) and are dropped up front, which a positive
    * threshold makes exact. Tier: on a measured ~all-distinct corpus
    * ([[collapseWorthwhile]]) the digest aggregate is skipped — every
    * doc is its own representative (CollapseTierQuerySpec pins output
    * identity between the tiers).
    *
    * Candidate-join bounds (both safe-by-margin against IEEE rounding —
    * the 1e-9 slack only ever KEEPS a borderline candidate):
    *   - LENGTH: J ≥ t ⟹ min(|x|,|y|) ≥ t·max(|x|,|y|);
    *   - POSITION (ppjoin): for the FIRST common gram g in the global
    *     rare-first order, every gram before g in x is non-common, so
    *     |x∩y| ≤ 1 + min(|x|−pos_x(g), |y|−pos_y(g)); J ≥ t needs
    *     |x∩y| ≥ ⌈t/(1+t)·(|x|+|y|)⌉. g provably sits inside both
    *     prefixes, so pruning every shared-gram row that fails the
    *     bound keeps recall 1.0 (the pair survives if ANY row passes,
    *     and g's row passes). */
  def prefixFilteredJaccardJoin(docs: DataFrame, idCol: String,
      textCol: String, n: Int, threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"bad threshold $threshold")
    // 1. text-digest collapse (tier-aware), one checkpointed row per
    //    class: (rep, docs, grams). Eager localCheckpoint, not
    //    persist(): the materialized copy is owned by the returned
    //    plan's RDD lineage and released by the ContextCleaner when it
    //    goes out of scope — no CacheManager entry survives the call
    //    for callers to know about.
    val classes = gramClassReps(docs, idCol, textCol, n)
    val r = classes.where(size(col("grams")) > 0)
      .select(col("rep").as("doc"), col("grams"))
    // 2. prefix-filtered candidate join over representatives, with
    //    per-gram rare-first positions for the ppjoin bound
    val (posting, prefix) = postingAndPrefix(r, threshold)
    val cands = prefix.alias("x")
      .join(prefix.alias("y"),
        col("x.gram") === col("y.gram") && col("x.doc") < col("y.doc") &&
          jaccardCandidateBounds(threshold))
      .select(col("x.doc").as("a"), col("y.doc").as("b"))
      .dropDuplicates("a", "b")
    val setPairs = cands
      .join(r.select(col("doc").as("a"), col("grams").as("ga")), "a")
      .join(r.select(col("doc").as("b"), col("grams").as("gb")), "b")
      .select(col("a"), col("b"),
        round(graft.functions.KernelExpressions.jaccard_sorted(
          col("ga"), col("gb")), 4).as("jaccard"))
      .where(col("jaccard") >= threshold)
    // 3. expand: identical-text pairs at exactly 1.0 (classes whose text
    //    yields NO grams are excluded — they score 0.0 against
    //    everything, including their own copies), cross-class pairs at
    //    their representatives' score (same text ⇒ same jaccard)
    val gramClasses = classes.where(size(col("grams")) > 0)
      .select(col("rep"), col("docs"))
    val within = gramClasses.where(size(col("docs")) > 1)
      .select(col("docs"))
      .select(explode(col("docs")).as("a"), col("docs"))
      .select(col("a"), explode(col("docs")).as("b"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"), lit(1.0).as("jaccard"))
    val cross = setPairs
      .join(gramClasses.select(col("rep").as("a"), col("docs").as("da")), "a")
      .join(gramClasses.select(col("rep").as("b"), col("docs").as("db")), "b")
      .select(explode(col("da")).as("x"), col("db"), col("jaccard"))
      .select(col("x"), explode(col("db")).as("y"), col("jaccard"))
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"), col("jaccard"))
    within.unionByName(cross)
  }

  /** Shared collapse stage of the exact set-similarity joins: ONE row
    * per text class — (rep, docs, grams of the representative's text) —
    * eagerly materialized via localCheckpoint (it feeds the posting,
    * the verification joins, and both expansions; uncheckpointed, the
    * gram kernel would re-run per consumer AND per global-sort sampling
    * pass). The representative's text rides the digest aggregate itself
    * as `min_by(text, id)` — map-side partial aggregation keeps ONE
    * text per (class × partition) on the exchange, so text never
    * shuffles at row volume and no rep-selection join is needed (a join
    * against the checkpoint is statless ⇒ Spark picks a sort-merge join
    * and shuffles the whole corpus's text by id — measured +6 s at the
    * 100× fixture). The gram kernel runs inside the same job, once per
    * class. Identity tier: no aggregate, every doc its own class.
    * Classes whose text yields no grams stay in the frame — consumers
    * filter `size(grams) > 0` per their own semantics. */
  private def gramClassReps(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    gramClassesPlan(docs, idCol, textCol, n).localCheckpoint(true)

  /** The UNCHECKPOINTED collapse plan behind [[gramClassReps]], exposed
    * for plan pinning: the collapsed tier must be ONE digest aggregate
    * carrying the rep text via min_by, with NO JOIN anywhere — the
    * join-based rep-text selection is the measured dead end (a stat-less
    * checkpoint side makes Spark plan a sort-merge join that ships the
    * whole corpus's text by id; +6 s at the 100× fixture, SCALE.md r17).
    * CollapsePlanSpec pins join-freedom and the single aggregate. */
  private[operators] def gramClassesPlan(docs: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    if (!collapseWorthwhile(docs))
      docs.select(col(idCol).as("rep"), array(col(idCol)).as("docs"),
        sortedGramHashes(col(textCol), n).as("grams"))
    else
      docs
        .select(classDigest(col(textCol)).as("fp"), col(idCol).as("doc"),
          col(textCol).as("__t"))
        .groupBy(col("fp"))
        .agg(min(col("doc")).as("rep"),
          sort_array(collect_list(col("doc"))).as("docs"),
          min_by(col("__t"), col("doc")).as("__t"))
        .select(col("rep"), col("docs"),
          sortedGramHashes(col("__t"), n).as("grams"))
  }

  /** Shared prefix stage: posting = (doc, sz, gram) exploded rep grams;
    * prefix = the rare-first prefix rows with each gram's 1-based
    * position in the doc's (df, gram) order — the input to the ppjoin
    * position bound. */
  /** Slack subtracted inside every ceil/≥ candidate bound: IEEE products
    * like 100 × 0.07 land a half-ulp HIGH of the exact integer, and a
    * bound that rounds up over-prunes — the slack can only ever KEEP a
    * borderline candidate (verification stays exact). */
  private val BoundEps = 1e-9

  /** The ppjoin candidate bounds for the SYMMETRIC Jaccard join, shared
    * verbatim by [[prefixFilteredJaccardJoin]] and [[incrementalDedup]]
    * (one home so a bound-math fix cannot drift between them):
    * LENGTH — J ≥ t ⟹ min(|x|,|y|) ≥ t·max(|x|,|y|); POSITION — the
    * first common gram g satisfies |x∩y| ≤ 1 + min(|x|−pos_x, |y|−pos_y)
    * and J ≥ t needs |x∩y| ≥ ⌈t/(1+t)·(|x|+|y|)⌉ (recall argument on
    * [[prefixFilteredJaccardJoin]]). Expects the join sides aliased
    * `x`/`y` with (sz, pos) from [[postingAndPrefix]]. */
  private def jaccardCandidateBounds(threshold: Double): Column = {
    val alpha = ceil((col("x.sz") + col("y.sz")) * lit(threshold / (1 + threshold)) - lit(BoundEps))
    least(col("x.sz"), col("y.sz")).cast("double") >=
      greatest(col("x.sz"), col("y.sz")) * lit(threshold) - lit(BoundEps) &&
      (lit(1) + least(col("x.sz") - col("x.pos"), col("y.sz") - col("y.pos"))) >= alpha
  }

  private def postingAndPrefix(r: DataFrame, threshold: Double,
      extra: Seq[String] = Nil): (DataFrame, DataFrame) = {
    val ex = extra.map(col)
    val posting = r.select(col("doc") +: ex :+ size(col("grams")).as("sz")
      :+ explode(col("grams")).as("gram"): _*)
    val dfTab = posting.groupBy(col("gram")).agg(count(lit(1)).as("df"))
    // 1e-9 slack like every other bound: an IEEE-inflated product
    // (e.g. 100 × 0.07 = 7.000000000000001) would ceil one too high and
    // SHORTEN the prefix by one — silently dropping exactly-at-threshold
    // pairs (JaccardBoundarySpec pins the t = 0.07 adversarial case)
    val prefixLen = (col("sz") - ceil(col("sz") * lit(threshold) - lit(BoundEps)) + 1).cast("int")
    val prefix = posting.join(dfTab, "gram")
      .groupBy(col("doc") +: ex :+ col("sz"): _*)
      .agg(collect_list(struct(col("df"), col("gram"))).as("pg"))
      .select(col("doc") +: ex :+ col("sz")
        :+ posexplode(slice(array_sort(col("pg")), lit(1), prefixLen)): _*)
      .select(col("doc") +: ex :+ col("sz") :+ (col("pos") + 1).as("pos")
        :+ col("col.gram").as("gram"): _*)
    (posting, prefix)
  }

  /** EXACT Jaccard edge list by COUNT AGGREGATION: every undirected pair
    * `(u < v)` with word-n-gram Jaccard >= `threshold`, in ONE gram
    * self-join + ONE grouped count — no candidate/verify split at all.
    *
    * The intersection size falls out of the shuffle: posting rows are
    * DISTINCT (doc, gram), so grouping the gram-equality self-join by
    * (u, v) counts |A∩B| exactly, and one narrow size join turns it into
    * `J = c / (|A| + |B| - c)`. Recall is trivially complete for any
    * t > 0 — a qualifying pair shares at least one gram — so unlike
    * df-capped candidate generators there is no rare-gram recall carve-
    * out, and unlike the kernel-verified form no doc's gram array is
    * ever re-scanned per pair: the comparison cost per co-occurring pair
    * is one counter bump, not an O(|A|+|B|) array merge.
    *
    * Scale envelope: the self-join emits Σ_g C(df_g, 2) rows, which is
    * the honest cost of EXACT similarity under boilerplate-free gram
    * profiles (df spread over many low-df grams — the shape after
    * normalization strips templates). A corpus with mega-df boilerplate
    * grams needs the prefix-filtered tier ([[prefixFilteredJaccardJoin]],
    * whose rare-first prefixes never post hot grams) or the MinHash tier
    * ([[minhashNearDups]]); this form is the low-threshold workhorse
    * where prefixes stop pruning (at t = 0.35 a prefix still posts 66%
    * of each doc's grams, so the filter buys little).
    *
    * "Exact" caveat (ADVICE r17 #4): since r17 the Jaccard is computed
    * over 64-bit xxhash GRAM HASHES ([[gramClassReps]]), not gram
    * strings — exact up to hash injectivity. A cross-gram collision can
    * only INFLATE an intersection count (never deflate), and the
    * probability any collision exists among G distinct grams is
    * birthday-bounded at ~G²/2⁶⁵ (~3·10⁻⁸ for a billion-gram corpus) —
    * below the rounding noise of the 4-decimal output. Consumers that
    * need string-exact semantics must re-score pairs over the raw
    * grams. */
  def exactJaccardEdges(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"bad threshold $threshold")
    // EXACT-COLLAPSE first via the SAME digest stage the prefix joins
    // use ([[gramClassReps]] — r17: this operator still grouped on the
    // full gram ARRAY, the measured dead-end shape: gram kernel per copy
    // plus the array riding the exchange as both key and value; the
    // digest aggregate shuffles 24-byte rows and runs the kernel once
    // per DISTINCT text). Text classes are FINER than gram-set classes:
    // two different texts with equal gram-sets become a cross pair the
    // count aggregation scores at J = c/(su+sv−c) = 1.0 ≥ t — output
    // identical. Pair J values are over the distinct HASHED grams
    // (injective at corpus scale, like dup_gram_coverage's df).
    val classes = gramClassReps(docs, idCol, textCol, n)
    val gramClasses = classes.where(size(col("grams")) > 0)
    val r = gramClasses.select(col("rep").as("doc"), col("grams"))
    val sz = r.select(col("doc"), size(col("grams")).as("sz"))
    val eg = r.select(col("doc"), explode(col("grams")).as("gram"))
    val inter = eg.as("x").join(eg.as("y"),
        col("x.gram") === col("y.gram") && col("x.doc") < col("y.doc"))
      .groupBy(col("x.doc").as("u"), col("y.doc").as("v"))
      .agg(count(lit(1)).as("c"))
    val repEdges = inter
      .join(sz.select(col("doc").as("u"), col("sz").as("su")), "u")
      .join(sz.select(col("doc").as("v"), col("sz").as("sv")), "v")
      .where(col("c").cast("double") /
        (col("su") + col("sv") - col("c")).cast("double") >= threshold)
      .select(col("u"), col("v"))
    // expand class-level edges back to doc pairs: within-class pairs are
    // J = 1.0 (identical texts, always >= t; empty-gram classes excluded
    // — the kernel scores them 0.0), cross-class pairs inherit their
    // representatives' decision
    val within = gramClasses.where(size(col("docs")) > 1)
      .select(explode(col("docs")).as("u"), col("docs"))
      .select(col("u"), explode(col("docs")).as("v"))
      .where(col("u") < col("v"))
    val cross = repEdges
      .join(gramClasses.select(col("rep").as("u"), col("docs").as("du")), "u")
      .join(gramClasses.select(col("rep").as("v"), col("docs").as("dv")), "v")
      .select(explode(col("du")).as("x"), col("dv"))
      .select(col("x"), explode(col("dv")).as("y"))
      .select(least(col("x"), col("y")).as("u"),
        greatest(col("x"), col("y")).as("v"))
    within.unionByName(cross)
  }

  /** Asymmetric CONTAINMENT self-join: every directed pair (a, b) with
    * `|grams(a) ∩ grams(b)| / |grams(a)| >= threshold` — the doc-in-doc
    * detector. Jaccard misses subset duplication by construction (a
    * paragraph quoted inside a 10× longer article has tiny Jaccard but
    * containment ~1.0); this is the screen that catches quotation,
    * boilerplate wrapping, and partial scrapes.
    *
    * Same scale skeleton as [[prefixFilteredJaccardJoin]] — exact
    * collapse, prefix-filtered candidates, kernel verification, expansion
    * — with the asymmetric twist: only the CONTAINED side can be
    * prefix-pruned (overlap >= ceil(t*|A|) bounds a prefix of
    * `|A| - ceil(t*|A|) + 1` rare-first grams), while the container side
    * must post ALL its grams (nothing bounds B's size from A's
    * threshold). Candidate volume is still self-limiting: it is
    * Σ_{g ∈ prefix(A)} df(g), and prefixes hit low-df grams first.
    * Recall is 1.0 by the pigeonhole argument; exact verification makes
    * precision exact. */
  def containmentJoin(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"bad threshold $threshold")
    // r17: text-digest collapse + shared prefix stage (see
    // prefixFilteredJaccardJoin — same kernel-once-per-distinct-text and
    // 24-byte-shuffle wins). The container side posts ALL its grams, so
    // only two bounds apply here: the x-prefix itself (position bound
    // degenerates to the prefix length when the y position is unknown)
    // and the LENGTH bound |B| ≥ ⌈t·|A|⌉ (overlap ≥ ⌈t·|A|⌉ needs at
    // least that many grams in B) — 1e-9 slack keeps IEEE-borderline
    // candidates rather than ever dropping one.
    val classes = gramClassReps(docs, idCol, textCol, n)
    val r = classes.where(size(col("grams")) > 0)
      .select(col("rep").as("doc"), col("grams"))
    val (posting, prefix) = postingAndPrefix(r, threshold)
    val cands = prefix.alias("x")
      .join(posting.select(col("doc"), col("sz"), col("gram")).alias("y"),
        col("x.gram") === col("y.gram") && col("x.doc") =!= col("y.doc") &&
          col("y.sz").cast("double") >= ceil(col("x.sz") * lit(threshold) - lit(BoundEps)))
      .select(col("x.doc").as("a"), col("y.doc").as("b"))
      .dropDuplicates("a", "b")
    val repPairs = cands
      .join(r.select(col("doc").as("a"), col("grams").as("ga")), "a")
      .join(r.select(col("doc").as("b"), col("grams").as("gb")), "b")
      .select(col("a"), col("b"),
        round(size(array_intersect(col("ga"), col("gb"))).cast("double") /
          size(col("ga")), 4).as("containment"))
      .where(col("containment") >= threshold)
    // identical texts contain each other fully, in both directions
    // (classes with empty gram-sets excluded — kernel scores them 0.0)
    val gramClasses = classes.where(size(col("grams")) > 0)
      .select(col("rep"), col("docs"))
    val within = gramClasses.where(size(col("docs")) > 1)
      .select(explode(col("docs")).as("a"), col("docs"))
      .select(col("a"), explode(col("docs")).as("b"))
      .where(col("a") =!= col("b"))
      .select(col("a"), col("b"), lit(1.0).as("containment"))
    val cross = repPairs
      .join(gramClasses.select(col("rep").as("a"), col("docs").as("da")), "a")
      .join(gramClasses.select(col("rep").as("b"), col("docs").as("db")), "b")
      .select(explode(col("da")).as("x"), col("db"), col("containment"))
      .select(col("x").as("a"), explode(col("db")).as("b"), col("containment"))
    within.unionByName(cross)
  }

  /** The ASYMMETRIC prefix screen of [[incrementalDedup]], exposed for
    * the candidate-volume pin (IncrementalAsymmetrySpec): only
    * batch-touching classes (`isB`) post prefixes on the probe side, so
    * candidate volume scales with the BATCH prefixes' document
    * frequency — corpus×corpus work is structurally absent, which the
    * output alone cannot witness (corpus-internal pairs never reach the
    * output either way; the 10%-batch fixture moves only 2.27→2.00 s,
    * so a regression re-admitting the corpus side would be invisible to
    * both, VERDICT r17 #5). Input `r` = (doc, isB, grams) class rows. */
  private[operators] def incrementalCandidatePairs(r: DataFrame,
      threshold: Double): DataFrame = {
    val (_, prefix) = postingAndPrefix(r, threshold, extra = Seq("isB"))
    // x side: batch-touching classes only; y side: everyone (the corpus
    // partner class need not touch the batch)
    prefix.where(col("isB")).alias("x")
      .join(prefix.alias("y"),
        col("x.gram") === col("y.gram") && col("x.doc") =!= col("y.doc") &&
          jaccardCandidateBounds(threshold))
      .select(least(col("x.doc"), col("y.doc")).as("a"),
        greatest(col("x.doc"), col("y.doc")).as("b"))
      .dropDuplicates("a", "b")
  }

  /** Incremental dedup: screen a NEW batch against an existing corpus —
    * the shape every production ingest runs (the corpus is already clean;
    * only arrivals need checking). For each batch doc: the smallest
    * corpus doc with identical text (`exact_dup_of`), the smallest corpus
    * doc at word-n-gram Jaccard ≥ threshold (`near_dup_of`), and the
    * combined `is_dup` verdict. Id sets must be disjoint across the two
    * inputs (they are row identities, not join keys).
    *
    * Exact tier: 16-byte digest join — text never shuffles. Near tier
    * (r17, ASYMMETRIC): classes are collapsed over corpus ∪ batch with
    * per-class batch membership and min-corpus-id riding the digest
    * aggregate, and only BATCH-TOUCHING classes post prefixes into the
    * candidate join — corpus×corpus candidates never form, so the
    * screen scales with the batch (×gram df), not the corpus², which is
    * the whole point of incremental ingest against a 100 TB clean
    * corpus (the pre-r17 form ran the full self-join and DISCARDED the
    * corpus-side pairs). Recall: a qualifying (batch, corpus) pair's
    * first common gram sits in both prefixes (see
    * [[prefixFilteredJaccardJoin]]), and the batch side's prefix row is
    * always posted. Partners reduce CLASS-level (min corpus id of each
    * verified partner class, plus the own class for identical texts
    * with non-empty grams), so no doc-pair relation ever materializes —
    * each batch doc gets its min partner through one class join. */
  def incrementalDedup(corpus: DataFrame, batch: DataFrame, idCol: String,
      textCol: String, n: Int, threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"bad threshold $threshold")
    val corpusMin = corpus
      .select(classDigest(col(textCol)).as("digest"), col(idCol).as("cid"))
      .groupBy(col("digest")).agg(min(col("cid")).as("exact_dup_of"))
    val exact = batch.select(col(idCol).as("doc"), classDigest(col(textCol)).as("digest"))
      .join(corpusMin, Seq("digest"), "left")
      .select(col("doc"), col("exact_dup_of"))

    // side-tagged union → one digest aggregate carrying per-class batch
    // docs + min corpus id + the representative's text (min_by — see
    // gramClassReps for why the text rides the aggregate)
    val tagged = corpus.select(col(idCol).as("doc"), col(textCol).as("__t"),
        lit(false).as("isB"))
      .unionByName(batch.select(col(idCol).as("doc"), col(textCol).as("__t"),
        lit(true).as("isB")))
    val classes =
      if (!collapseWorthwhile(corpus)) // identity tier: one class per doc
        tagged.select(col("doc").as("rep"),
          when(!col("isB"), col("doc")).as("minCorpus"),
          when(col("isB"), array(col("doc")))
            .otherwise(slice(array(col("doc")), 1, 0)).as("batchDocs"),
          sortedGramHashes(col("__t"), n).as("grams"))
          .localCheckpoint(true)
      else
        tagged
          .select(classDigest(col("__t")).as("fp"), col("doc"), col("__t"), col("isB"))
          .groupBy(col("fp"))
          .agg(min(when(!col("isB"), col("doc"))).as("minCorpus"),
            sort_array(collect_list(when(col("isB"), col("doc")))).as("batchDocs"),
            min_by(col("__t"), col("doc")).as("__t"),
            min(col("doc")).as("rep"))
          .select(col("rep"), col("minCorpus"), col("batchDocs"),
            sortedGramHashes(col("__t"), n).as("grams"))
          .localCheckpoint(true)

    val r = classes.where(size(col("grams")) > 0)
      .select(col("rep").as("doc"), (size(col("batchDocs")) > 0).as("isB"),
        col("grams"))
    val cands = incrementalCandidatePairs(r, threshold)
    val g = r.select(col("doc"), col("grams"))
    val verified = cands
      .join(g.select(col("doc").as("a"), col("grams").as("ga")), "a")
      .join(g.select(col("doc").as("b"), col("grams").as("gb")), "b")
      .where(round(graft.functions.KernelExpressions.jaccard_sorted(
        col("ga"), col("gb")), 4) >= threshold)
      .select(col("a"), col("b"))
    // class-level partner reduction: min corpus id per batch-touching class
    val info = classes.select(col("rep"), col("minCorpus"), col("batchDocs"),
      (size(col("grams")) > 0).as("hasG"))
    val within = info
      .where(col("hasG") && size(col("batchDocs")) > 0 && col("minCorpus").isNotNull)
      .select(col("rep"), col("minCorpus").as("partner"))
    val crossA = verified
      .join(info.select(col("rep").as("b"), col("minCorpus")), "b")
      .select(col("a").as("rep"), col("minCorpus").as("partner"))
    val crossB = verified
      .join(info.select(col("rep").as("a"), col("minCorpus")), "a")
      .select(col("b").as("rep"), col("minCorpus").as("partner"))
    val nearClass = within.unionByName(crossA).unionByName(crossB)
      .where(col("partner").isNotNull)
      .groupBy(col("rep")).agg(min(col("partner")).as("near_dup_of"))
    val near = info.where(size(col("batchDocs")) > 0)
      .join(nearClass, "rep")
      .select(explode(col("batchDocs")).as("doc"), col("near_dup_of"))

    exact.join(near, Seq("doc"), "left")
      .select(col("doc"), col("exact_dup_of"), col("near_dup_of"),
        (col("exact_dup_of").isNotNull || col("near_dup_of").isNotNull)
          .as("is_dup"))
  }

  // ---- embedding cosine --------------------------------------------------

  /** Cosine similarity between two numeric-array columns — one fused
    * codegen'd pass ([[graft.functions.KernelExpressions.CosineSim]]).
    * For pair loops, precomputing
    * [[graft.functions.KernelExpressions.unit_vector]] on each side and
    * taking a single array_dot per pair is cheaper still. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.KernelExpressions.cosine_sim(a, b)

  /** Default row cap for [[exactEmbeddingTopPairs]] — ~5·10⁷ scored
    * pairs, a few seconds of cluster work. Override per call or with
    * `spark.graft.dedup.exactPairsMaxRows`. */
  val ExactPairsDefaultMaxRows = 10000L

  /** Exact all-pairs embedding similarity, top-N pairs — the ORACLE
    * BASELINE tier for the LSH path, O(N²) by construction (broadcast
    * cross product; every pair is scored). That cost is fine on a gate
    * fixture and catastrophic on a corpus: at a mere 20× probe this one
    * query was 522 s of a 673 s suite. The operator therefore refuses
    * input past a row cap instead of silently launching a cluster-melting
    * cross product — a scale-killer that cannot fire by accident stops
    * being a scale-killer. The 100 TB path is
    * [[Similarity.embeddingNearDupPairs]] (`q_dedup_embedding_lsh`),
    * whose bucket self-join stays near-linear in N. */
  def exactEmbeddingTopPairs(df: DataFrame, idCol: String, vecCol: String,
      topN: Int, maxRows: Long = ExactPairsDefaultMaxRows): DataFrame = {
    val cap = df.sparkSession.conf.getOption("spark.graft.dedup.exactPairsMaxRows")
      .map(_.toLong).getOrElse(maxRows)
    val n = df.count()
    require(n <= cap,
      s"exact all-pairs embedding tier is O(N²): n=$n rows would score " +
        s"~${n * (n - 1) / 2} pairs (cap $cap rows). This tier exists as the " +
        "oracle baseline for small fixtures; for large corpora use the LSH " +
        "bucket path Similarity.embeddingNearDupPairs (q_dedup_embedding_lsh) " +
        "or raise spark.graft.dedup.exactPairsMaxRows explicitly.")
    val e = df.select(col(idCol), col(vecCol))
    val a = e.alias("a")
    val b = e.alias("b")
    a.crossJoin(broadcast(b))
      .where(col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("a"), col(s"b.$idCol").as("b"),
        round(cosine(col(s"a.$vecCol"), col(s"b.$vecCol")), 6).as("cos"))
      .orderBy(col("cos").desc, col("a"), col("b"))
      .limit(topN)
  }
}

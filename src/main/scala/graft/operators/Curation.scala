package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{KernelExpressions, TextFunctions}

/** Corpus-curation operators a large-scale training-data pipeline needs
  * beyond near-dup detection: text normalization (case/punctuation
  * variants collapse to one canonical form), embedding outlier scoring
  * (distance to the label centroid — the standard mislabeled-example
  * screen), deterministic stratified sampling (data-mixing ratios that
  * are reproducible across runs and engines), and per-group term
  * profiling.
  *
  * Scale notes: normalization+dedup shuffles 16-byte digests of the
  * NORMALIZED text, never documents; centroids reduce to
  * (labels × dim) doubles — broadcast back, no second shuffle of the
  * vectors; stratified sampling is a pure filter (no shuffle, no rand()
  * non-determinism — modulo on the id is reproducible and
  * partition-order-independent); top-terms is explode → partial-agg →
  * tiny per-group top-k.
  */
object Curation {

  /** Canonical text form: lowercase, non-alphanumerics collapse to single
    * spaces, trimmed. Mirrors `regexp_replace(lower(x),'[^a-z0-9]+',' ','g')`
    * so a DuckDB oracle can replay it exactly. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  /** Duplicate groups ON THE NORMALIZED text: (keep = min id, copies).
    * Groups by the 16-byte binary class digest ([[Dedup.classDigest]])
    * of the canonical form — the shuffle moves 16-byte keys, not
    * documents. */
  def normalizedDupGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), Dedup.classDigest(normalizeText(col(textCol))).as("nfp"))
      .groupBy(col("nfp"))
      .agg(min(col(idCol)).as("keep"), count(lit(1)).as("copies"))
      .where(col("copies") > 1)
      .select(col("keep"), col("copies"))

  /** Per-label element-wise mean of an array<float> embedding column,
    * as array<double>. Two aggregations over (label, pos) pairs — the
    * shuffled data is labels × dim scalars, independent of row count. */
  def labelCentroids(df: DataFrame, labelCol: String, vecCol: String): DataFrame =
    df.select(col(labelCol), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col(labelCol), col("pos"))
      .agg(avg(col("v")).as("m"))
      .groupBy(col(labelCol))
      // tiny post-agg rows (one per label): the interpreted transform here
      // touches labels × dim values once, not the corpus
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("centroid"))

  /** Bottom-k cosine-to-label-centroid rows per label — the standard
    * embedding screen for mislabeled/outlier training examples. Ranks on
    * the ROUNDED cosine (ties by id) so results are stable across
    * engines. */
  def centroidOutliers(df: DataFrame, idCol: String, labelCol: String,
      vecCol: String, k: Int): DataFrame = {
    val cents = labelCentroids(df, labelCol, vecCol)
    val cos = round(KernelExpressions.cosine_sim(col(vecCol), col("centroid")), 6)
    val w = Window.partitionBy(col(labelCol)).orderBy(col("cos").asc, col(idCol))
    df.join(broadcast(cents), labelCol)
      .select(col(labelCol), col(idCol), cos.as("cos"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(labelCol), col("rank"), col(idCol), col("cos"))
  }

  /** Deterministic stratified sample for corpus mixing: keeps a row iff
    * `id % 100 < 100·fraction(stratum)`. Reproducible across runs,
    * engines, and partitionings (unlike `sample()`/`rand()`), and a pure
    * scan-level filter — no shuffle. Fractions are percent-resolution. */
  def stratifiedModuloSample(df: DataFrame, idCol: String, keyCol: String,
      fractions: Map[String, Double], defaultFraction: Double): DataFrame = {
    val pct = fractions.foldLeft(lit(math.round(defaultFraction * 100).toInt)) {
      case (acc, (k, f)) => when(col(keyCol) === k, lit(math.round(f * 100).toInt)).otherwise(acc)
    }
    df.where(pmod(col(idCol), lit(100)) < pct)
  }

  /** Content-defined chunking (CDC) at token granularity: a chunk
    * boundary falls AFTER every anchor token (fnv64(token) ≡ 0 mod
    * `divisor`), so boundaries move WITH the content — after an
    * insertion or deletion the chunk stream re-synchronizes at the next
    * anchor, where fixed-width chunking shifts every subsequent chunk
    * (the rsync/LBFS boundary trick, applied to sub-document text dedup:
    * shared boilerplate passages fingerprint identically across docs
    * regardless of position). Expected chunk length = `divisor` tokens.
    *
    * One codegen'd kernel pass per row
    * ([[graft.functions.Kernels.cdcChunks]]: tokenize → anchor test →
    * incremental chunk fingerprint, no chunk string materialized) —
    * ZERO shuffle to chunk; only the (id, fingerprint) chunk rows
    * (|chunks| ≈ |tokens|/divisor) ever leave the row. The HOF
    * composition of the same math ran INTERPRETED per token: 95 s at
    * sf0.1 vs sub-second for the kernel. Returns one row per chunk:
    * (doc, chunk_idx, chunk_len, fp). */
  def contentDefinedChunks(df: DataFrame, idCol: String, textCol: String,
      divisor: Int): DataFrame = {
    require(divisor > 1, s"divisor must be > 1, got $divisor")
    df.where(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc"),
        posexplode(KernelExpressions.cdc_chunks(col(textCol), divisor))
          .as(Seq("i", "ch")))
      .select(col("doc"), (col("i") + 1).as("chunk_idx"),
        col("ch.clen").as("chunk_len"), col("ch.fp").as("fp"))
  }

  /** Priority sampling (Duffield–Lund–Thorup, JACM 54(6) 2007): weighted
    * sampling WITHOUT replacement by priority q_i = w_i / u_i with
    * u_i ~ U(0,1]; the k highest priorities form the sample, giving
    * unbiased subset-sum estimates under quality/length weights — the
    * principled way to take a quality-weighted corpus subsample.
    *
    * u_i is a bounded-factor integer hash of the id mapped into
    * (0, 1] — no rand() (reproducible across runs, engines, and
    * partitionings) and no ln()/pow() (the Efraimidis–Spirakis
    * exponential-key form would hang the cross-engine replay on
    * transcendental ULPs; w·c/h is one multiply and one divide of
    * integer-derived doubles, so the priority ORDER is bit-stable).
    * Top-k via orderBy+limit ⇒ TakeOrderedAndProject: per-partition
    * heaps then one k-row merge, no global sort at any scale. */
  def prioritySample(df: DataFrame, idCol: String, weight: Column,
      k: Int): DataFrame = {
    // pmod-bound the id BEFORE the large multiply (like spanCorrupt):
    // (id·c) mod m ≡ ((id mod m)·c) mod m exactly, and the raw product
    // overflows int64 under the session's pinned ANSI mode for ids past
    // ~3.47e9 — billion-row corpora are this operator's whole use case
    // (r17 review). Bounded: 1000002 × 2654435761 ≈ 2.7e15, safe.
    val uNum = pmod(pmod(col(idCol), lit(1000003L)) * 2654435761L + 12345L,
      lit(1000003L)) + 1L
    val priority = weight.cast("double") * lit(1000004.0) / uNum.cast("double")
    df.select(col(idCol), weight.as("wt"), priority.as("pr"))
      .orderBy(col("pr").desc, col(idCol))
      .limit(k)
  }

  /** Exact AUC (Mann–Whitney U with midrank tie credit) in the SCALABLE
    * level-based form: rows reduce to their distinct score levels with
    * per-level positive/negative counts (one map-side-combinable
    * shuffle), then U = Σ_level p_l · (cum_neg_below + n_l/2) folds over
    * the tiny level table — the only window runs over levels, never the
    * corpus. Returns one row: (n_pos, n_neg, auc). AUC is NULL when
    * either class is empty (0/0). */
  def exactAuc(df: DataFrame, score: Column, positive: Column): DataFrame = {
    val lv = df.select(score.as("sc"), positive.cast("long").as("pos"))
      .groupBy(col("sc"))
      .agg(sum(col("pos")).as("p"), sum(lit(1L) - col("pos")).as("n"))
    val below = Window.orderBy(col("sc"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // U counts (pos, neg) pairs where the positive scores HIGHER, with
    // half credit on score ties
    lv.withColumn("cn", coalesce(sum(col("n")).over(below), lit(0L)))
      .agg(sum(col("p")).as("n_pos"), sum(col("n")).as("n_neg"),
        sum(col("p").cast("double") * (col("cn") + col("n") / lit(2.0))).as("u"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("u") / (col("n_pos") * col("n_neg")), 6)).as("auc"))
  }

  /** Content-addressed deterministic train/val split: the split key is
    * the md5 of the TEXT, not the row id, so exact duplicates always land
    * in the SAME split — the property that stops train/val contamination
    * through duplicated documents (an id- or rand()-keyed split scatters
    * copies across both sides). `valSixteenths` of the 16 first-nibble
    * values route to "val" (k/16 fraction). No rand(): reproducible
    * across runs, engines, and partitionings, and a pure scan-level
    * projection at any scale. */
  def contentHashSplit(textCol: Column, valSixteenths: Int): Column = {
    require(valSixteenths >= 0 && valSixteenths <= 15,
      s"valSixteenths must be in [0, 15], got $valSixteenths")
    val boundary = java.lang.Integer.toHexString(valSixteenths)
    when(substring(md5(textCol), 1, 1) < lit(boundary), "val").otherwise("train")
  }

  /** PII patterns (ASCII, RE2-compatible so a DuckDB oracle can replay
    * them exactly): email, NNN-NNN-NNNN phone, dotted-quad IPv4.
    * Aliased from [[graft.functions.Kernels]] so the single-pass kernel
    * ([[graft.functions.KernelExpressions.pii_stats]]) and this composed
    * form can never drift apart. */
  val EmailRe: String = graft.functions.Kernels.PiiEmailRe
  val PhoneRe: String = graft.functions.Kernels.PiiPhoneRe
  val Ipv4Re: String = graft.functions.Kernels.PiiIpv4Re

  /** Redact PII in place: emails → <EMAIL>, phones → <PHONE>, IPv4 →
    * <IP>. Email first so an address is consumed whole before the
    * digit-oriented patterns see its local part. Pure codegen'd
    * regexp_replace chain — a single-scan projection at any scale. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  /** Top-k most frequent tokens per group (length ≥ minLen, stopwords
    * excluded), ranked (count desc, token asc) for determinism. */
  def topTerms(df: DataFrame, groupCol: String, textCol: String,
      k: Int, minLen: Int, stopwords: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col("n").desc, col("tok"))
    df.select(col(groupCol), explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .where(length(col("tok")) >= minLen && !col("tok").isin(stopwords: _*))
      .groupBy(col(groupCol), col("tok"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(groupCol), col("rank"), col("tok"), col("n"))
  }

  /** Top-k DISTINCTIVE tokens per group by tf-idf with a linear
    * (rational) idf: `score = tf * nGroups / df` where df = number of
    * groups containing the token. The linear idf keeps every score an
    * exact small-integer ratio — one IEEE division, bit-identical across
    * engines — where `log(N/df)` would hang correctness on library `ln`
    * ulp differences; the RANKING it induces is the same as log-idf's for
    * fixed tf (both monotone decreasing in df).
    *
    * Plan shape: tokenize+explode → per-(group, token) count (map-side
    * partial agg absorbs the token Zipf skew) → per-token df (second agg
    * over the ALREADY-aggregated tf table, tiny) → join back on token,
    * co-partitioned with the df agg so no extra exchange on the big side.
    */
  def tfidfTerms(df: DataFrame, groupCol: String, textCol: String,
      k: Int, minLen: Int, stopwords: Seq[String]): DataFrame = {
    // N as a broadcast one-row aggregate, NOT an eager count(): building
    // the plan must not trigger a corpus scan, and the real scan happens
    // once at execution
    val nGroups = df.agg(countDistinct(col(groupCol)).cast("double").as("__ng"))
    val tf = df.select(col(groupCol), explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .where(length(col("tok")) >= minLen && !col("tok").isin(stopwords: _*))
      .groupBy(col(groupCol), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("score").desc, col("tok"))
    tf.join(dfreq, "tok")
      .crossJoin(broadcast(nGroups))
      .withColumn("score", col("tf") * col("__ng") / col("df"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(groupCol), col("rank"), col("tok"), col("tf"), col("df"),
        round(col("score"), 4).as("score"))
  }

  /** Sequence packing (pretraining concat-then-chunk): documents are
    * concatenated per group in a deterministic order and cut into
    * fixed-token-budget training sequences; each document is assigned to
    * the sequence containing its FIRST token (`seq_id = floor(tokens
    * before it / budget)`). Returns the input plus `seq_id`.
    *
    * The running total is a window sum partitioned by the group columns,
    * so the operator parallelizes across groups — pass a SHARD column
    * (not just the corpus/source) as part of the key: real packing jobs
    * pack each input shard independently with no global coordination,
    * and that is what keeps the window's per-partition state bounded at
    * 100 TB (a source-only key would serialize a whole corpus into one
    * task).
    */
  def packSequences(df: DataFrame, groupCols: Seq[String], orderCol: String,
      tokensCol: String, budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(groupCols.nonEmpty, "need at least one group column")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("seq_id",
      (coalesce(sum(col(tokensCol)).over(w), lit(0L)) / budget).cast("long"))
  }

  /** Per-group document cap (the "max K docs per domain" rule of web-scale
    * curation): keeps at most `k` documents per group, selected by
    * content-hash order — uniform-random in effect but fully reproducible
    * (no rand(), no seed state), and stable under repartitioning. Ties on
    * identical text fall back to the id.
    *
    * Two-phase distributed top-k: phase 1 caps each (group, shard) to k
    * rows — the group's true top-k is always a subset of the union of
    * its per-shard top-ks — so phase 2's per-group window sorts at most
    * k x shards rows, never the group's full document set. A single
    * per-group window would serialize each group into one task (a 25 TB
    * sort per domain at corpus scale); this shape ships ≤ k rows per
    * shard into the final cut. */
  def domainCap(df: DataFrame, groupCol: String, textCol: String,
      idCol: String, k: Int, shards: Int = 32): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val local = Window
      .partitionBy(col(groupCol), pmod(hash(col(idCol)), lit(shards)))
      .orderBy(md5(col(textCol)), col(idCol))
    val global = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(textCol)), col(idCol))
    df.withColumn("__rn1", row_number().over(local))
      .where(col("__rn1") <= k)
      .withColumn("__rn", row_number().over(global))
      .where(col("__rn") <= k)
      .drop("__rn1", "__rn")
  }

  /** Soft dedup: instead of dropping exact duplicates, weight each copy
    * 1/cluster-size so the CLUSTER contributes one document's worth of
    * training signal. Shuffles 16-byte binary digests
    * ([[Dedup.classDigest]]), not text. Returns the input plus
    * `n_copies` and `weight`. */
  def softDedupWeights(df: DataFrame, textCol: String): DataFrame = {
    val counts = df.select(Dedup.classDigest(col(textCol)).as("__digest"))
      .groupBy(col("__digest")).agg(count(lit(1)).as("n_copies"))
    // null-SAFE join like the rest of the text-class family
    // (Dedup.textClasses): classDigest null-propagates and NULL != NULL
    // under a plain equi-join, so null-text rows silently vanished from
    // the output — violating the TOTAL contract above (r17 review; the
    // q_soft_dedup oracle now replays the null class symmetrically)
    df.withColumn("__digest", Dedup.classDigest(col(textCol)))
      .alias("d")
      .join(counts.alias("c"), col("d.__digest") <=> col("c.__digest"))
      .withColumn("weight", lit(1.0) / col("n_copies"))
      .drop("__digest")
  }

  /** Frequency-built vocabulary + per-document out-of-vocabulary rate —
    * the tokenizer-sizing diagnostic: pick `vocabSize`, see what fraction
    * of each document's token OCCURRENCES falls outside the vocabulary.
    * The vocabulary is the top-`vocabSize` tokens by (count desc, token)
    * — a deterministic tie-break, so the boundary is reproducible.
    *
    * Scale notes: token counts aggregate with map-side partials; the
    * vocabulary cut is TakeOrderedAndProject (per-partition heads, driver
    * merge of vocabSize·partitions rows — never a full sort); the
    * vocabulary is then BOUNDED BY PARAMETER, so broadcasting it to the
    * occurrence scan is justified at any corpus size. One occurrence
    * shuffle total (the count), and the per-doc reduce ships narrow
    * integer rows.
    *
    * NULL-text docs are ABSENT from the output by contract (adjudicated
    * r17 review): they have no token occurrences and an OOV rate is
    * 0/0-undefined for them — unlike [[NgramLm.bigramCorpusScore]],
    * whose zero defaults are meaningful, a total form here would
    * manufacture NaN/NULL rate rows. Whitespace-only and empty texts DO
    * appear (space-only trim keeps one empty token, Spark semantics).
    * The q_vocab_oov oracle drops NULL texts identically (unnest of the
    * NULL token array). */
  def vocabOovRate(docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    // exact-dup collapse first (Dedup.textClasses): the vocabulary is the
    // top-K of MULTIPLICITY-WEIGHTED token counts (Σm ≡ the count over
    // all copies, so the cut and its n-then-token tie-break are identical
    // to the uncollapsed form), and each doc's (n_tokens, oov) is a pure
    // function of (text, vocab) — computed once per distinct text, then
    // expanded through the (doc → rep) mapping. Tokenize/explode and the
    // vocab shuffle run over distinct texts only.
    val mapping = Dedup.textClasses(docs, idCol, textCol)
    val occ = Dedup.classReps(docs, idCol, textCol)
      .select(col("rep"), col("m"),
        explode(graft.functions.TextFunctions.tokens(col(textCol))).as("tok"))
    val vocab = occ.groupBy(col("tok")).agg(sum(col("m")).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(vocabSize)
      .select(col("tok"), lit(1).as("in_vocab"))
    val perRep = occ.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("rep"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("oov"))
    mapping.select(col("doc"), col("rep")).join(perRep, Seq("rep"))
      .select(col("doc"), col("n_tokens"), col("oov"),
        round(col("oov").cast("double") / col("n_tokens"), 6).as("oov_rate"))
  }

  /** T5-style SPAN CORRUPTION: deterministic masking of fixed-width
    * token blocks, producing the (corrupted input, extraction target)
    * pair a denoising pretrainer consumes. Tokens are grouped into
    * `spanLen`-wide blocks; block b of document d is masked iff
    * `pmod(((d*7919 + b) mod 1048573) * 2654435761, 2147483647) < p`
    * with `p = pctMasked·(2^31−1)/100` — an integer hash both engines
    * evaluate identically (each factor is bounded so the product stays
    * inside int64; no rand(), no partition-order dependence). Masked
    * blocks collapse to one `<extra>` sentinel in the input and are
    * concatenated (in order, `<extra>`-separated) into the target.
    *
    * Entirely per-row array expressions (`transform`/`filter`/`flatten`
    * over the token array) — zero shuffle, zero join: corruption
    * parallelizes embarrassingly, which is the property that matters at
    * 100 TB. The per-block hash is O(tokens); nothing is quadratic.
    * Returns the id column plus `n_tokens`, `n_spans` (masked blocks),
    * `n_masked` (masked tokens), `input_text`, `target_text`. */
  def spanCorrupt(df: DataFrame, idCol: String, textCol: String,
      spanLen: Int = 3, pctMasked: Int = 15): DataFrame = {
    require(spanLen >= 1, s"spanLen must be >= 1, got $spanLen")
    require(pctMasked >= 0 && pctMasked <= 100, s"bad pctMasked $pctMasked")
    val toks = TextFunctions.tokens(col(textCol))
    val nTok = size(toks)
    val nBlk = ceil(nTok.cast("double") / spanLen).cast("int")
    val cut = lit(2147483647L * pctMasked / 100)
    // per block: (masked?, tokens of the block)
    val blocks = transform(sequence(lit(0), nBlk - 1), b => {
      val h = pmod(pmod(col(idCol).cast("long") * 7919 + b.cast("long"), lit(1048573L)) *
        lit(2654435761L), lit(2147483647L))
      struct((h < cut).as("m"),
        slice(toks, b * spanLen + 1, lit(spanLen)).as("t"))
    })
    df.select(col(idCol), blocks.as("blocks"), nTok.as("n_tokens"))
      .select(col(idCol), col("n_tokens"),
        size(filter(col("blocks"), b => b.getField("m"))).as("n_spans"),
        aggregate(col("blocks"), lit(0),
          (acc, b) => acc + when(b.getField("m"), size(b.getField("t"))).otherwise(0))
          .cast("long").as("n_masked"),
        array_join(flatten(transform(col("blocks"),
          b => when(b.getField("m"), array(lit("<extra>")))
            .otherwise(b.getField("t")))), " ").as("input_text"),
        array_join(transform(filter(col("blocks"), b => b.getField("m")),
          b => array_join(b.getField("t"), " ")), " <extra> ").as("target_text"))
  }
}

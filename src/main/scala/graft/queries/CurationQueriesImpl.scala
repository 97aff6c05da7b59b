package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Curation

/** Corpus-curation queries (normalization dedup, embedding outliers,
  * stratified mixing, term profiling) — all four oracle-checked: each is
  * ANSI-SQL-expressible, so the DuckDB gate hashes real values, not just
  * row counts.
  */
object CurationQueriesImpl {

  /** Exact dedup AFTER text normalization: case/punctuation variants of
    * the same content collapse into one group. Shuffles 16-byte binary
    * digests of the canonical form (the oracle's md5 key groups the same
    * classes — the key is internal, only (keep, copies) is output). */
  val normalizedDedup = Q(
    "q_dedup_normalized",
    (s, dir) => {
      Curation.normalizedDupGroups(Tables.documents(s, dir), "doc_id", "text")
        .orderBy(col("keep"))
    },
    Some("""WITH n AS (SELECT doc_id,
        md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS nfp
        FROM documents)
      SELECT min(doc_id) AS keep, count(*) AS copies
      FROM n GROUP BY nfp HAVING count(*) > 1 ORDER BY keep"""))

  /** Embedding outlier screen: bottom-5 cosine-to-label-centroid per
    * label (the rows most likely mislabeled). Centroid = per-label
    * element-wise mean; both sides rank on the 6-dp-rounded cosine. */
  val embedOutliers = Q(
    "q_embed_outliers",
    (s, dir) => {
      Curation.centroidOutliers(Tables.embeddings(s, dir), "vec_id", "label", "embedding", 5)
        .orderBy(col("label"), col("rank"))
    },
    Some("""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      u AS (SELECT vec_id, label, generate_subscripts(v, 1) AS pos, unnest(v) AS val FROM e),
      m AS (SELECT label, pos, avg(val) AS m FROM u GROUP BY label, pos),
      c AS (SELECT label, array_agg(m ORDER BY pos) AS centroid FROM m GROUP BY label),
      s AS (SELECT e.vec_id, e.label,
              round(list_cosine_similarity(e.v, c.centroid), 6) AS cos
            FROM e JOIN c USING (label)),
      r AS (SELECT *, row_number() OVER (PARTITION BY label ORDER BY cos ASC, vec_id) AS rank
            FROM s)
      SELECT label, rank, vec_id, cos FROM r WHERE rank <= 5 ORDER BY label, rank"""))

  /** Deterministic stratified corpus mix: keep 50% of English, 20% of
    * everything else, by id-modulo (reproducible across engines — no
    * rand()), then composition stats. */
  val corpusMix = Q(
    "q_corpus_mix",
    (s, dir) => {
      Curation.stratifiedModuloSample(Tables.documents(s, dir), "doc_id", "lang",
          Map("en" -> 0.5), 0.2)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("source"))
    },
    Some("""SELECT lang, source, count(*) AS n FROM documents
      WHERE doc_id % 100 < CASE WHEN lang = 'en' THEN 50 ELSE 20 END
      GROUP BY lang, source ORDER BY lang, source"""))

  /** Content-hash train/val split (12.5% val) + per-split stats: exact
    * duplicate docs provably share a split, so dedup-sensitive eval
    * can't leak. Pure projection + one tiny aggregate. */
  val splitTrainVal = Q(
    "q_split_train_val",
    (s, dir) => {
      Tables.documents(s, dir)
        .select(Curation.contentHashSplit(col("text"), 2).as("split"),
          col("doc_id"), length(col("text")).as("len"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"), sum(col("len")).as("sum_chars"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy(col("split"))
    },
    Some("""SELECT CASE WHEN substr(md5(text), 1, 1) < '2' THEN 'val' ELSE 'train' END AS split,
        count(*) AS n, CAST(sum(length(text)) AS BIGINT) AS sum_chars,
        min(doc_id) AS min_id, max(doc_id) AS max_id
      FROM documents GROUP BY 1 ORDER BY split"""))

  private val stop = Seq("the", "a", "of", "and", "in", "to", "is", "that", "with")
  private val stopSql = stop.map(s => s"'$s'").mkString(", ")

  /** Per-source top-5 terms (len >= 4, stopwords excluded) — the classic
    * explode → partial-agg → per-group top-k profile. */
  val topTerms = Q(
    "q_text_top_terms",
    (s, dir) => {
      Curation.topTerms(Tables.documents(s, dir), "source", "text", 5, 4, stop)
        .orderBy(col("source"), col("rank"))
    },
    Some(s"""WITH t AS (SELECT source,
        unnest(regexp_split_to_array(trim(text), '[\\t\\n\\x0B\\f\\r ]+')) AS tok FROM documents),
      f AS (SELECT source, tok, count(*) AS n FROM t
            WHERE length(tok) >= 4 AND tok NOT IN ($stopSql)
            GROUP BY source, tok),
      r AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY n DESC, tok) AS rank
            FROM f)
      SELECT source, rank, tok, n FROM r WHERE rank <= 5 ORDER BY source, rank"""))

  /** Per-source top-5 DISTINCTIVE terms by tf-idf (linear idf — exact
    * rational scores, see [[Curation.tfidfTerms]]): where top_terms ranks
    * raw frequency, this downweights tokens common to every source. The
    * oracle recomputes tf, df and N entirely in SQL. */
  val tfidfTerms = Q(
    "q_text_tfidf",
    (s, dir) => {
      Curation.tfidfTerms(Tables.documents(s, dir), "source", "text", 5, 4, stop)
        .orderBy(col("source"), col("rank"))
    },
    Some(s"""WITH t AS (SELECT source,
        unnest(regexp_split_to_array(trim(text), '[\\t\\n\\x0B\\f\\r ]+')) AS tok FROM documents),
      f AS (SELECT source, tok, count(*) AS tf FROM t
            WHERE length(tok) >= 4 AND tok NOT IN ($stopSql)
            GROUP BY source, tok),
      d AS (SELECT tok, count(*) AS df FROM f GROUP BY tok),
      n AS (SELECT count(DISTINCT source) AS ng FROM documents),
      sc AS (SELECT f.source, f.tok, f.tf, d.df,
               f.tf * (SELECT CAST(ng AS DOUBLE) FROM n) / d.df AS score
             FROM f JOIN d USING (tok)),
      r AS (SELECT *, row_number() OVER (PARTITION BY source
              ORDER BY score DESC, tok) AS rank FROM sc)
      SELECT source, rank, tok, tf, df, round(score, 4) AS score
      FROM r WHERE rank <= 5 ORDER BY source, rank"""))

  /** Sequence packing ([[Curation.packSequences]]): concat-then-chunk
    * documents into 2048-token training sequences PER INPUT SHARD
    * (contiguous doc_id ranges stand in for the pipeline's input files) —
    * each shard packs independently, so parallelism grows with the data
    * instead of being capped at the handful of sources. The budget is a
    * power of two so the running-total division is EXACT in both
    * engines' float math. */
  val packSequences = Q(
    "q_pack_sequences",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("source"), col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text"))).as("toks"))
        .withColumn("shard", (col("doc_id") / 2000).cast("long"))
      Curation.packSequences(d, Seq("source", "shard"), "doc_id", "toks", 2048)
        .groupBy(col("source"), col("shard"), col("seq_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("toks")).as("sum_tokens"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
        .orderBy(col("source"), col("shard"), col("seq_id"))
    },
    Some("""WITH d AS (SELECT source, doc_id,
        CAST(floor(doc_id / 2000) AS BIGINT) AS shard,
        len(regexp_split_to_array(trim(text), '[\t\n\x0B\f\r ]+')) AS toks FROM documents),
      p AS (SELECT source, shard, doc_id, toks,
        CAST(floor(COALESCE(sum(toks) OVER (PARTITION BY source, shard ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2048) AS BIGINT) AS seq_id
        FROM d)
      SELECT source, shard, seq_id, count(*) AS n_docs,
        CAST(sum(toks) AS BIGINT) AS sum_tokens,
        min(doc_id) AS min_doc, max(doc_id) AS max_doc
      FROM p GROUP BY 1, 2, 3 ORDER BY source, shard, seq_id"""))

  /** Per-source document cap ([[Curation.domainCap]]): at most 40 docs
    * per source, chosen by content-hash order — reproducible sampling
    * with no rand(). The checksum columns pin WHICH docs were kept, not
    * just how many. */
  val domainCapQ = Q(
    "q_domain_cap",
    (s, dir) => {
      Curation.domainCap(Tables.documents(s, dir), "source", "text", "doc_id", 40)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("doc_id")).as("sum_ids"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("source"))
    },
    Some("""WITH r AS (SELECT source, doc_id, n_chars,
        row_number() OVER (PARTITION BY source ORDER BY md5(text), doc_id) AS rn
        FROM documents)
      SELECT source, count(*) AS n_kept,
        CAST(sum(doc_id) AS BIGINT) AS sum_ids,
        CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM r WHERE rn <= 40 GROUP BY source ORDER BY source"""))

  /** Soft dedup ([[Curation.softDedupWeights]]): duplicate-cluster-size
    * histogram per source with the effective (1/n-weighted) document
    * count — `n / n_copies` as ONE division, so the replay is exact with
    * no float-summation-order hazard. */
  val softDedup = Q(
    "q_soft_dedup",
    (s, dir) => {
      Curation.softDedupWeights(Tables.documents(s, dir), "text")
        .groupBy(col("source"), col("n_copies"))
        .agg(count(lit(1)).as("n"))
        .withColumn("effective", round(col("n").cast("double") / col("n_copies"), 4))
        .orderBy(col("source"), col("n_copies"))
    },
    Some("""WITH c AS (SELECT md5(text) AS digest, count(*) AS n_copies
        FROM documents GROUP BY 1),
      j AS (SELECT d.source, c.n_copies FROM documents d
            JOIN c ON md5(d.text) IS NOT DISTINCT FROM c.digest)
      SELECT source, n_copies, count(*) AS n,
        round(CAST(count(*) AS DOUBLE) / n_copies, 4) AS effective
      FROM j GROUP BY source, n_copies ORDER BY source, n_copies"""))

  /** Benchmark decontamination: flag corpus documents sharing any word
    * trigram with the "benchmark" set (docs with doc_id % 50 == 0 stand in
    * for an eval suite). The real-pipeline shape: eval grams are tiny →
    * broadcast; corpus grams are map-side semi-joined (never shuffled) and
    * only (doc_id, partial count) reaches the exchange. A doc that is a
    * near-copy of an eval doc lights up with a high n_shared. */
  val decontaminate = Q(
    "q_decontaminate",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      // the eval side is id-selected (doc_id % 50) so it cannot collapse,
      // but it is tiny by construction; the CORPUS side's n_shared is a
      // pure function of (text, eval gram set), so the heavy gram explode
      // + broadcast-semi hits run once per DISTINCT text
      // (Dedup.textClasses) and expand to the train docs through the
      // (doc → rep) mapping. Classes whose members are all eval docs
      // score too but drop in the id-filtered expansion.
      val evalGrams = docs.where(col("doc_id") % 50 === 0)
        .select(explode(graft.operators.Dedup.wordNgrams(col("text"), 3)).as("gram"))
        .distinct()
      val mapping = graft.operators.Dedup.textClasses(docs, "doc_id", "text")
      val repHits = graft.operators.Dedup.classReps(docs, "doc_id", "text")
        .select(col("rep"),
          explode(graft.operators.Dedup.wordNgrams(col("text"), 3)).as("gram"))
        .join(broadcast(evalGrams), "gram")
        .groupBy("rep").agg(count(lit(1)).as("n_shared"))
      docs.where(col("doc_id") % 50 =!= 0).select("doc_id")
        .join(mapping.select(col("doc").as("doc_id"), col("rep")), "doc_id")
        .join(repHits, Seq("rep"), "left")
        .select(col("doc_id"),
          coalesce(col("n_shared"), lit(0L)).as("n_shared"),
          (coalesce(col("n_shared"), lit(0L)) > 0).as("contaminated"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '[\t\n\x0B\f\r ]+') AS t FROM documents),
      g AS (SELECT doc_id,
          list_distinct([list_aggregate(t[i:i+2], 'string_agg', ' ')
            for i in range(1, greatest(len(t) - 1, 2))]) AS grams
        FROM toks),
      eg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 50 = 0),
      dg AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 50 <> 0),
      hit AS (SELECT dg.doc_id, count(*) AS n_shared
        FROM dg JOIN eg USING (gram) GROUP BY dg.doc_id)
      SELECT d.doc_id, coalesce(h.n_shared, 0) AS n_shared,
        coalesce(h.n_shared, 0) > 0 AS contaminated
      FROM (SELECT doc_id FROM documents WHERE doc_id % 50 <> 0) d
      LEFT JOIN hit h USING (doc_id)
      ORDER BY doc_id"""))

  /** Vocabulary sizing + OOV ([[Curation.vocabOovRate]]): top-20 tokens
    * by frequency (the synthetic corpus has 31 distinct tokens, so 11
    * types fall OOV — the boundary is exercised, not vacuous), then each
    * document's out-of-vocabulary occurrence rate. */
  val vocabOov = Q(
    "q_vocab_oov",
    (s, dir) =>
      graft.operators.Curation.vocabOovRate(
        Tables.documents(s, dir), "doc_id", "text", 20)
        .withColumnRenamed("doc", "doc_id")
        .orderBy(col("doc_id")),
    Some("""WITH o AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '[\t\n\x0B\f\r ]+')) AS tok
          FROM documents),
      v AS (SELECT tok FROM (SELECT tok, count(*) AS n FROM o GROUP BY tok
            ORDER BY n DESC, tok LIMIT 20)),
      p AS (SELECT o.doc_id,
          CAST(count(*) AS BIGINT) AS n_tokens,
          CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS oov
        FROM o LEFT JOIN v ON o.tok = v.tok
        GROUP BY o.doc_id)
      SELECT doc_id, n_tokens, oov,
        round(CAST(oov AS DOUBLE) / n_tokens, 6) AS oov_rate
      FROM p ORDER BY doc_id"""))

  /** Group-mean imputation — the numeric-feature cleaning step: fill a
    * customer's missing urgent-order spend (NULL from the left join, a
    * REAL missingness mechanism, not planted) with their market segment's
    * mean. Arithmetic discipline for cross-engine parity: per-customer
    * spend sums in exact DECIMAL, the segment mean is ONE
    * decimal-cast-to-double division, and the filled average recombines
    * scalar doubles per segment — token-identical in both engines, no
    * order-dependent double summation anywhere. */
  val imputeMissing = Q(
    "q_impute_segment_mean",
    (s, dir) => {
      val spend = Tables.orders(s, dir)
        .where(col("o_orderpriority") === "1-URGENT")
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast("decimal(8,2)")).as("spend"))
      Tables.customer(s, dir)
        .join(spend, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_customers"),
          sum(when(col("spend").isNull, 1L).otherwise(0L)).as("n_missing"),
          sum(col("spend")).as("ps"),
          count(col("spend")).as("pn"))
        .select(col("c_mktsegment"), col("n_customers"), col("n_missing"),
          round(col("ps").cast("double") / col("pn"), 4).as("seg_mean"),
          round((col("ps").cast("double") +
            col("n_missing") * (col("ps").cast("double") / col("pn"))) /
            col("n_customers"), 4).as("filled_avg"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""WITH spend AS (
        SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
        FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey),
      j AS (SELECT c.c_mktsegment, s.spend
        FROM customer c LEFT JOIN spend s ON c.c_custkey = s.o_custkey)
      SELECT c_mktsegment, count(*) AS n_customers,
        CAST(sum(CASE WHEN spend IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
        round(CAST(sum(spend) AS DOUBLE) / count(spend), 4) AS seg_mean,
        round((CAST(sum(spend) AS DOUBLE) +
          sum(CASE WHEN spend IS NULL THEN 1 ELSE 0 END) *
            (CAST(sum(spend) AS DOUBLE) / count(spend))) / count(*), 4)
          AS filled_avg
      FROM j GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** Length-bucket planning for training batches: bucket documents by
    * token count (width 8) and account the PADDING WASTE of batching
    * each bucket to its longest member — `max·n − Σlen` tokens of wasted
    * compute, the quantity length-bucketed batching exists to minimize.
    * Everything is integer arithmetic off one scan + one small groupBy;
    * the single rounded division per bucket row is the waste fraction. */
  val lengthBuckets = Q(
    "q_length_buckets",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(
        size(split(trim(col("text")), "\\s+")).as("n_tok"))
      d.select(expr("(n_tok - 1) div 8").as("bucket"), col("n_tok"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_tok")).as("min_tok"), max(col("n_tok")).as("max_tok"),
          sum(col("n_tok")).as("sum_tok"))
        .select(col("bucket"), col("n_docs"), col("min_tok"), col("max_tok"),
          (col("max_tok") * col("n_docs") - col("sum_tok")).as("pad_waste"),
          round((col("max_tok") * col("n_docs") - col("sum_tok")).cast("double") /
            (col("max_tok") * col("n_docs")), 6).as("waste_frac"))
        .orderBy(col("bucket"))
    },
    Some("""WITH d AS (SELECT len(regexp_split_to_array(trim(text), '[\t\n\x0B\f\r ]+')) AS n_tok
        FROM documents),
      b AS (SELECT (n_tok - 1) // 8 AS bucket, n_tok FROM d),
      g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
          min(n_tok) AS min_tok, max(n_tok) AS max_tok,
          CAST(sum(n_tok) AS BIGINT) AS sum_tok
        FROM b GROUP BY bucket)
      SELECT bucket, n_docs, min_tok, max_tok,
        CAST(max_tok * n_docs - sum_tok AS BIGINT) AS pad_waste,
        round(CAST(max_tok * n_docs - sum_tok AS DOUBLE) /
          (max_tok * n_docs), 6) AS waste_frac
      FROM g ORDER BY bucket"""))

  /** Deterministic corpus shuffle: a multiplicative-hash permutation
    * (`pos = (id·2654435761 + 12345) mod 2^20` — odd multiplier, so
    * bijective on the ring) assigns every document a reproducible
    * pseudo-random position, then positions are range-sharded into 32
    * output shards. The reproducible global shuffle a training pipeline
    * runs before epoch streaming: no `rand()`, identical order across
    * engines/runs/partitionings, and a pure projection at any scale.
    * The per-shard doc_id checksum pins WHICH docs landed where; the
    * near-uniform n per shard is the point of the multiplier. */
  val corpusShuffle = Q(
    "q_corpus_shuffle",
    (s, dir) => {
      val pos = pmod(col("doc_id") * lit(2654435761L) + lit(12345L),
        lit(1048576L))
      Tables.documents(s, dir).select(col("doc_id"), pos.as("pos"))
        .select(expr("pos div 32768").as("shard"), col("pos"), col("doc_id"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n"),
          min(col("pos")).as("min_pos"), max(col("pos")).as("max_pos"),
          sum(col("doc_id")).as("doc_checksum"))
        .orderBy(col("shard"))
    },
    Some("""WITH p AS (SELECT doc_id,
          (doc_id * 2654435761 + 12345) % 1048576 AS pos FROM documents)
      SELECT pos // 32768 AS shard, CAST(count(*) AS BIGINT) AS n,
        min(pos) AS min_pos, max(pos) AS max_pos,
        CAST(sum(doc_id) AS BIGINT) AS doc_checksum
      FROM p GROUP BY shard ORDER BY shard"""))

  /** Exact-count stratified sampling: ceil(20%) of each language stratum,
    * chosen by content-hash order (md5 — reproducible across engines, no
    * rand()). Where q_corpus_mix is the Bernoulli hash-threshold tier
    * (sample SIZE is binomial, membership needs no sort), this is the
    * exact-k tier: a per-stratum row_number over hash order guarantees
    * the quota exactly. Scale shape: the window sorts WITHIN each
    * stratum partition only — no global sort — but a stratum is one
    * task, so at 100 TB with few huge strata the hash-threshold tier is
    * the right default and this is the audit/repro path (or run it on
    * the reduced survivor set, as the ntile queries do). */
  val stratifiedSample = Q(
    "q_stratified_sample",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, dir)
      val w = Window.partitionBy(col("lang"))
        .orderBy(md5(col("text")), col("doc_id"))
      docs.select(col("lang"), col("doc_id"), col("text"))
        .withColumn("rk", row_number().over(w))
        .withColumn("n_stratum",
          count(lit(1)).over(Window.partitionBy(col("lang"))))
        .where(col("rk") <= ceil(col("n_stratum") * lit(0.2)))
        .select(col("lang"), col("rk"), col("doc_id"), col("n_stratum"))
        .orderBy(col("lang"), col("rk"))
    },
    Some("""WITH r AS (SELECT lang, doc_id,
          row_number() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS rk,
          count(*) OVER (PARTITION BY lang) AS n_stratum
        FROM documents)
      SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id, n_stratum
      FROM r WHERE rk <= ceil(n_stratum * 0.2)
      ORDER BY lang, rk"""))

  /** Quality-weighted corpus subsample via priority sampling
    * ([[Curation.prioritySample]]; weight = token count + 1, the
    * length-proportional weighting a token-budgeted subsample uses).
    * The top-k cut and the display order both ride the UNROUNDED
    * priority (bit-stable integer-derived arithmetic on both engines);
    * only the emitted column rounds. */
  val prioritySampleQ = Q(
    "q_priority_sample",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      Curation.prioritySample(d, "doc_id",
          (size(graft.functions.TextFunctions.tokens(col("text"))) + 1)
            .cast("long"), 100)
        .select(col("doc_id"), col("wt"), round(col("pr"), 4).as("priority"))
    },
    Some("""WITH w AS (SELECT doc_id,
          CAST(len(regexp_split_to_array(trim(text), '[\t\n\x0B\f\r ]+')) + 1 AS BIGINT) AS wt
        FROM documents),
      p AS (SELECT doc_id, wt,
          -- id pmod-bounded BEFORE the multiply, same as the operator:
          -- identical values for all ids, and neither engine can overflow
          wt * 1000004.0 / CAST(((((doc_id % 1000003 + 1000003) % 1000003) * 2654435761 + 12345) % 1000003 + 1000003) % 1000003 + 1 AS DOUBLE) AS pr
        FROM w)
      SELECT doc_id, wt, round(pr, 4) AS priority
      FROM p ORDER BY pr DESC, doc_id LIMIT 100"""))

  /** Temperature-reweighted corpus mixing (alpha = 0.5): the standard
    * multilingual/multi-source rebalancing — sampling weight proportional
    * to p_i^alpha, which upweights small sources relative to their
    * natural frequency. w_i = sqrt(n_i) / sum_j sqrt(n_j) (the 1/N
    * factors cancel; ONE division per source, so both engines run the
    * same float ops). Plan: one partial-aggregable groupBy to per-source
    * counts (20 rows), then a broadcast cross-join of the 1-row total —
    * the fact table shuffles only source counts. */
  val temperatureMix = Q(
    "q_temperature_mix",
    (s, dir) => {
      val counts = Tables.documents(s, dir)
        .groupBy(col("source")).agg(count(lit(1)).as("n"))
      val totals = counts.agg(
        sum(col("n")).as("tot"),
        sum(sqrt(col("n").cast("double"))).as("s_sqrt"))
      counts.crossJoin(broadcast(totals))
        .select(col("source"), col("n"),
          round(col("n").cast("double") / col("tot").cast("double"), 6).as("p_nat"),
          round(sqrt(col("n").cast("double")) / col("s_sqrt"), 6).as("w_temp"),
          round(sqrt(col("n").cast("double")) / col("s_sqrt") * lit(100000.0), 0)
            .cast("long").as("target_n"))
        .orderBy(col("source"))
    },
    Some("""WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
        t AS (SELECT sum(n) AS tot, sum(sqrt(n)) AS s_sqrt FROM c)
      SELECT source, n, round(n / tot, 6) AS p_nat,
        round(sqrt(n) / s_sqrt, 6) AS w_temp,
        CAST(round(sqrt(n) / s_sqrt * 100000.0, 0) AS BIGINT) AS target_n
      FROM c, t ORDER BY source"""))

  /** Per-document unigram token entropy — the information-density quality
    * signal (near-zero entropy = repeated-token spam). Computed in the
    * partial-aggregable form H = log2(n) - sum(c*log2(c))/n, so the plan
    * is explode -> (doc,token) count -> ONE groupBy(doc) carrying two
    * sums — no second window/join to bring n alongside c, which is what
    * keeps it two map-side-combinable shuffles at 100 TB.
    *
    * ACCEPTED transcendental hazard (r17 review, same class as
    * q_s10_scalar_udf): log2 is not correctly-rounded, so an entropy
    * landing within an ulp of a 4-dp boundary could round differently
    * per engine. Kept because log2 IS the entropy definition and the
    * inputs are small-integer counts (c, n ≤ tokens/doc) — log2 over
    * small integers is exact or near-exact in both libms, and the gate
    * re-checks the full fixture every round. */
  val tokenEntropy = Q(
    "q_token_entropy",
    (s, dir) => {
      // entropy is a PURE per-row function of the text: the kernel
      // computes (n_tokens, n_distinct, sum c*log2 c) in one local pass,
      // where the groupBy form it replaced exploded every token and
      // shuffled ~50M (doc, token) pairs TWICE at the 100x fixture.
      // Sort-first keeps the kernel above the range exchange.
      Tables.documents(s, dir).orderBy(col("doc_id"))
        .select(col("doc_id"),
          graft.functions.KernelExpressions.token_entropy_stats(col("text")).as("st"))
        .select(col("doc_id"),
          col("st.n_tokens").as("n_tokens"),
          col("st.n_distinct").as("n_distinct"),
          round(log2(col("st.n_tokens").cast("double"))
            - col("st.slc") / col("st.n_tokens").cast("double"), 4).as("entropy"))
    },
    Some("""WITH t AS (SELECT doc_id,
          unnest(regexp_split_to_array(trim(text), '[\t\n\x0B\f\r ]+')) AS tok FROM documents),
        c AS (SELECT doc_id, tok, count(*) AS cnt FROM t GROUP BY doc_id, tok)
      SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
        count(*) AS n_distinct,
        round(log2(sum(cnt)) - sum(cnt * log2(cnt)) / sum(cnt), 4) AS entropy
      FROM c GROUP BY doc_id ORDER BY doc_id"""))

  /** Filter-funnel attrition report: how many documents survive each
    * successive curation gate (length -> token count -> chars/token ->
    * stopword ratio), with drop counts and survival rate per stage.
    * The funnel is ONE scan with five conditional sums folded into a
    * single partial-aggregable aggregate row, unpivoted to a row per
    * stage via inline() (the q_table_stats pattern) — at 100 TB this
    * costs exactly one pass over the corpus, not one pass per stage. */
  val filterFunnel = Q(
    "q_filter_funnel",
    (s, dir) => {
      // one TermCounts kernel pass instead of split + interpreted
      // filter-HOF per row (same rewrite as q_text_quality)
      val tc = graft.functions.KernelExpressions.term_counts(col("text"), stop)
      val nTok = element_at(col("__tc"), 1).cast("double")
      val stopHits = stop.indices
        .map(i => element_at(col("__tc"), i + 2)).reduceLeft(_ + _).cast("double")
      val stopRatio = when(nTok > 0, stopHits / nTok).otherwise(0.0)
      val cpt = when(nTok > 0, length(col("text")).cast("double") / nTok)
        .otherwise(0.0)
      val g1 = length(col("text")) >= 200
      val g2 = g1 && nTok >= lit(40.0)
      val g3 = g2 && cpt <= lit(12.0)
      val g4 = g3 && stopRatio >= lit(0.02)
      val row = Tables.documents(s, dir).withColumn("__tc", tc).agg(
        count(lit(1)).as("s0"),
        sum(when(g1, 1L).otherwise(0L)).as("s1"),
        sum(when(g2, 1L).otherwise(0L)).as("s2"),
        sum(when(g3, 1L).otherwise(0L)).as("s3"),
        sum(when(g4, 1L).otherwise(0L)).as("s4"))
      val stages = Seq(
        ("0_total", "s0", "s0"), ("1_min_length", "s1", "s0"),
        ("2_min_tokens", "s2", "s1"), ("3_chars_per_token", "s3", "s2"),
        ("4_stopword_ratio", "s4", "s3"))
      row.select(inline(array(stages.map { case (nm, cur, prev) => struct(
          lit(nm).as("stage"),
          col(cur).as("n_pass"),
          (col(prev) - col(cur)).as("n_dropped"),
          // when() guard: empty corpus => s0 = 0 (ANSI divide would throw)
          round(when(col("s0") > 0,
            col(cur).cast("double") / col("s0").cast("double"))
            .otherwise(0.0), 4).as("survival"))
        }: _*)))
        .orderBy(col("stage"))
    },
    Some(s"""WITH d AS (SELECT length(text) AS len,
          CAST(len(regexp_split_to_array(trim(text), '[\\t\\n\\x0B\\f\\r ]+')) AS DOUBLE) AS n_tok,
          CAST(len(list_filter(regexp_split_to_array(trim(text), '[\\t\\n\\x0B\\f\\r ]+'),
            t -> t IN ($stopSql))) AS DOUBLE) AS stop_hits,
          length(text) AS n_chars
        FROM documents),
      f AS (SELECT len >= 200 AS g1,
          len >= 200 AND n_tok >= 40.0 AS g2,
          len >= 200 AND n_tok >= 40.0
            AND (CASE WHEN n_tok > 0 THEN n_chars / n_tok ELSE 0 END) <= 12.0 AS g3,
          len >= 200 AND n_tok >= 40.0
            AND (CASE WHEN n_tok > 0 THEN n_chars / n_tok ELSE 0 END) <= 12.0
            AND (CASE WHEN n_tok > 0 THEN stop_hits / n_tok ELSE 0 END) >= 0.02 AS g4
        FROM d),
      a AS (SELECT count(*) AS s0,
          sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS s1,
          sum(CASE WHEN g2 THEN 1 ELSE 0 END) AS s2,
          sum(CASE WHEN g3 THEN 1 ELSE 0 END) AS s3,
          sum(CASE WHEN g4 THEN 1 ELSE 0 END) AS s4
        FROM f)
      SELECT stage, CAST(n_pass AS BIGINT) AS n_pass,
        CAST(n_dropped AS BIGINT) AS n_dropped,
        round(CAST(n_pass AS DOUBLE) / s0, 4) AS survival
      FROM (
        SELECT '0_total' AS stage, s0 AS n_pass, 0 AS n_dropped, s0 FROM a
        UNION ALL SELECT '1_min_length', s1, s0 - s1, s0 FROM a
        UNION ALL SELECT '2_min_tokens', s2, s1 - s2, s0 FROM a
        UNION ALL SELECT '3_chars_per_token', s3, s2 - s3, s0 FROM a
        UNION ALL SELECT '4_stopword_ratio', s4, s3 - s4, s0 FROM a)
      ORDER BY stage"""))

  /** Contrastive negative sampling WITHOUT a cross join: K pseudo-random
    * negatives per anchor via a deterministic multiplicative-hash OFFSET
    * into the contiguous id space — `neg = (id + 1 + h(id,k) mod (N-1))
    * mod N` is never the anchor itself by construction, and the whole
    * assignment is per-row integer arithmetic (replayable in any engine,
    * no rand()). The naive formulation is a corpus×corpus cross join
    * sampled down — quadratic rows before the filter; this is K rows per
    * anchor then ONE equi-join on neg_id to fetch the negative's
    * features. At 100 TB: a K× map-side fan-out plus one hash join on a
    * uniformly-distributed key — no skew (offsets spread by the
    * multiplier), no broadcast needed on either side. N comes from a
    * 1-row count broadcast onto the anchor scan. */
  val negativePairs = Q(
    "q_negative_pairs",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val n = docs.agg(count(lit(1)).as("nn"))
      val assigned = docs.select(col("doc_id"))
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("nn"),
          explode(sequence(lit(1), lit(4))).as("k"))
        .select(col("doc_id"), col("k"),
          ((col("doc_id") + lit(1L)
            + ((col("doc_id") * lit(2654435761L) + col("k") * lit(40503L))
               % lit(2147483647L)) % (col("nn") - lit(1L)))
            % col("nn")).as("neg_id"))
      assigned.join(
          docs.select(col("doc_id").as("neg_id"), col("lang").as("neg_lang"),
            col("n_chars").as("neg_chars")),
          "neg_id")
        .select(col("doc_id"), col("k"), col("neg_id"), col("neg_lang"),
          col("neg_chars"))
        .orderBy(col("doc_id"), col("k"))
    },
    Some("""WITH n AS (SELECT count(*) AS nn FROM documents),
        ks AS (SELECT unnest([1, 2, 3, 4]) AS k),
        a AS (SELECT doc_id, k,
            (doc_id + 1 + ((doc_id * 2654435761 + k * 40503) % 2147483647)
              % (nn - 1)) % nn AS neg_id
          FROM documents, n, ks)
      SELECT a.doc_id, a.k, a.neg_id, d.lang AS neg_lang,
        d.n_chars AS neg_chars
      FROM a JOIN documents d ON d.doc_id = a.neg_id
      ORDER BY a.doc_id, a.k"""))

  /** Intra-document dedup (the C4/Gopher "remove repeated spans within a
    * page" primitive, at word granularity for this fixture's space-joined
    * corpus): keep each token's FIRST occurrence, reassemble in original
    * order, count removals. The per-row form is pure codegen'd array
    * work — `array_distinct(split(...))` preserves first-occurrence
    * order. The oracle replays the semantics the honest relational way
    * (explode with ordinality → min(ord) per (doc, word) → ordered
    * string_agg), which doubles as a cross-engine proof that
    * array_distinct's order contract matches the explicit
    * first-occurrence query.
    *
    * COLLAPSE-FIRST (r18): dedup_text/n_removed are pure functions of
    * the text, so the kernel runs once per DISTINCT text
    * ([[graft.operators.Dedup.classReps]]) and docs expand through the
    * 24-byte class mapping. The per-row form measured 9.0 s at the 100×
    * fixture against a 3.9 s unsorted cost — the presentation orderBy's
    * RANGE-SAMPLING pass re-executes the projection subtree, so the
    * per-row kernel ran twice; collapsed the same sorted output is
    * 2.2 s (kernel at class volume, sampling re-runs only the cheap
    * mapping join). Identity tier: the r17 zero-shuffle per-row plan. */
  val intraDocDedup = Q(
    "q_dedup_intra_doc",
    (s, dir) => {
      val words = split(col("text"), " ")
      // NULL-text symmetry (r17 review): Spark's concat_ws turns the
      // NULL word array into '' and emits a row, while the oracle's
      // unnest produces ZERO rows and drops the doc_id — filter NULLs
      // on BOTH sides (fixtures carry none; latent-divergence closure)
      val docs = Tables.documents(s, dir).where(col("text").isNotNull)
      if (!graft.operators.Dedup.collapseWorthwhile(docs))
        docs.select(col("doc_id"),
          concat_ws(" ", array_distinct(words)).as("dedup_text"),
          (size(words) - size(array_distinct(words))).cast("long").as("n_removed"))
          .orderBy(col("doc_id"))
      else {
        val perClass = graft.operators.Dedup.classReps(docs, "doc_id", "text")
          .select(col("rep"),
            concat_ws(" ", array_distinct(words)).as("dedup_text"),
            (size(words) - size(array_distinct(words))).cast("long").as("n_removed"))
        graft.operators.Dedup.textClasses(docs, "doc_id", "text")
          .select(col("doc"), col("rep"))
          .join(perClass, "rep")
          .select(col("doc").as("doc_id"), col("dedup_text"), col("n_removed"))
          .orderBy(col("doc_id"))
      }
    },
    Some("""WITH w AS (
        SELECT doc_id,
          unnest(string_split(text, ' ')) AS word,
          unnest(range(1, len(string_split(text, ' ')) + 1)) AS ord
        FROM documents WHERE text IS NOT NULL),
      f AS (SELECT doc_id, word, min(ord) AS ord FROM w GROUP BY doc_id, word),
      c AS (SELECT doc_id, count(*) AS n_tot FROM w GROUP BY doc_id)
      SELECT f.doc_id,
        string_agg(f.word, ' ' ORDER BY f.ord) AS dedup_text,
        CAST(max(c.n_tot) - count(*) AS BIGINT) AS n_removed
      FROM f JOIN c ON f.doc_id = c.doc_id
      GROUP BY f.doc_id
      ORDER BY f.doc_id"""))

  /** T5-style span corruption ([[Curation.spanCorrupt]]): 3-token blocks
    * masked at 15% by an integer hash both engines evaluate identically,
    * producing (corrupted input, `<extra>`-joined extraction target) —
    * the denoising-pretraining sample builder. Pure per-row array
    * expressions: zero shuffle, zero join. The oracle replays blocks,
    * hash, and both strings verbatim (first 100 docs keep the result
    * diffable). */
  val spanCorruptQ = Q(
    "q_span_corrupt",
    (s, dir) =>
      Curation.spanCorrupt(
          Tables.documents(s, dir).where(col("doc_id") < 100), "doc_id", "text")
        .orderBy(col("doc_id")),
    Some("""WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '[\t\n\x0B\f\r ]+') AS t
        FROM documents WHERE doc_id < 100),
      nb AS (SELECT doc_id, t, CAST(ceil(len(t) / 3.0) AS INT) AS nblk FROM toks),
      blk AS (SELECT doc_id, t,
          [{'m': ((doc_id*7919 + b) % 1048573) * 2654435761 % 2147483647 < 322122547,
            's': list_aggregate(t[b*3+1 : b*3+3], 'string_agg', ' '),
            'c': least(len(t) - b*3, 3)}
           for b in range(nblk)] AS blocks
        FROM nb),
      m AS (SELECT doc_id, t, blocks,
          list_filter(blocks, x -> x.m) AS masked FROM blk)
      SELECT doc_id,
        CAST(len(t) AS BIGINT) AS n_tokens,
        CAST(len(masked) AS INT) AS n_spans,
        CAST(coalesce(list_sum(list_transform(masked, x -> x.c)), 0) AS BIGINT)
          AS n_masked,
        coalesce(list_aggregate(list_transform(blocks,
          x -> CASE WHEN x.m THEN '<extra>' ELSE x.s END),
          'string_agg', ' '), '') AS input_text,
        coalesce(list_aggregate(list_transform(masked, x -> x.s),
          'string_agg', ' <extra> '), '') AS target_text
      FROM m ORDER BY doc_id"""))

  def all: Seq[Q] = Seq(normalizedDedup, embedOutliers, corpusMix, topTerms,
    tfidfTerms, decontaminate, splitTrainVal, packSequences, domainCapQ,
    softDedup, vocabOov, imputeMissing, lengthBuckets, corpusShuffle,
    stratifiedSample, prioritySampleQ, temperatureMix, tokenEntropy, filterFunnel,
    negativePairs, intraDocDedup, spanCorruptQ)
}

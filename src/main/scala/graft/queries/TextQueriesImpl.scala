package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions

/** Text-analysis operators over the documents table: token counting,
  * quality scoring, language ID, fingerprinting. All are single-scan,
  * shuffle-free plans (scan → codegen'd projection), the shape that
  * streams at 100 TB. SQL-expressible ones carry DuckDB oracles.
  */
object TextQueriesImpl {

  private val stopList = Seq("the", "a", "of", "and", "in", "to", "is")
  private val stopSqlList = stopList.map(s => s"'$s'").mkString(", ")

  /** Pre-sorted scan for pure per-row projection queries whose contract
    * ends in ORDER BY over the scan key: sorting the NARROW scan FIRST
    * and projecting after keeps the heavy kernel above the range
    * exchange, so it runs ONCE. With the sort last, RangePartitioner's
    * sampling pass executes the whole projection a second time just to
    * read the keys — measured 12.7 s → 1.1 s on q_embed_quantize at the
    * 100× fixture. Projection preserves the child's total order, so the
    * result contract is unchanged (PlanSpec pins sort-below-projection
    * for these queries). At production scale the ORDER BY itself is a
    * verification-contract artifact — a training pipeline would drop it
    * and this becomes a pure shuffle-free scan. */
  private def docsSorted(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.documents(s, dir).orderBy(col("doc_id"))

  /** Token counting: whitespace tokens + BPE-ish regex subtokens. */
  val tokenCount = Q(
    "q_text_tokens",
    (s, dir) => {
      // sort-first: heavy regex projection stays above the range
      // exchange (see docsSorted)
      docsSorted(s, dir).select(col("doc_id"),
        size(TextFunctions.tokens(col("text"))).as("n_tokens"),
        size(TextFunctions.subtokens(col("text"))).as("n_subtokens"))
    },
    Some("""SELECT doc_id,
      len(regexp_split_to_array(trim(text), '[\t\n\x0B\f\r ]+')) AS n_tokens,
      -- [^\w\t\n\x0B\f\r ], not [^\w\s]: RE2's \s excludes U+000B, so a
      -- VT would count as a punctuation subtoken here while Spark's Java
      -- \s (which includes VT) skips it -- the explicit class keeps both
      -- engines skipping it (r17 review; same closure as the r16 sweep)
      len(regexp_extract_all(text, '\w+|[^\w\t\n\x0B\f\r ]')) AS n_subtokens
      FROM documents ORDER BY doc_id"""))

  /** Quality scoring: length/stopword/char-per-token signals composed into
    * a bounded score — standard pretraining-corpus heuristics. */
  val quality = Q(
    "q_text_quality",
    (s, dir) => {
      val docs = docsSorted(s, dir) // sort-first (see docsSorted)
      // ONE TermCounts kernel pass ([n_tokens, per-stopword counts…])
      // instead of a split plus an INTERPRETED filter-HOF per row — the
      // same rewrite TextQualityScorer carries; token semantics are
      // pinned to split(trim, "\s+") so every value is bit-identical
      val tc = graft.functions.KernelExpressions.term_counts(col("text"), stopList)
      val nTok = element_at(col("__tc"), 1).cast("double")
      val stopHits = stopList.indices
        .map(i => element_at(col("__tc"), i + 2)).reduceLeft(_ + _).cast("double")
      val stopRatio = when(nTok > 0, stopHits / nTok).otherwise(0.0)
      val charsPerTok = when(nTok > 0, length(col("text")).cast("double") / nTok).otherwise(0.0)
      docs.withColumn("__tc", tc)
        .select(col("doc_id"),
          round(stopRatio, 4).as("stop_ratio"),
          round(charsPerTok, 4).as("chars_per_token"),
          round(least(nTok / lit(64.0), lit(1.0)) * (lit(1.0) - stopRatio), 4).as("quality"))
    },
    Some(s"""SELECT doc_id,
      round(CASE WHEN n_tok > 0 THEN stop_hits / n_tok ELSE 0 END, 4) AS stop_ratio,
      round(CASE WHEN n_tok > 0 THEN length(text) / n_tok ELSE 0 END, 4) AS chars_per_token,
      round(least(n_tok / 64.0, 1.0) *
        (1.0 - CASE WHEN n_tok > 0 THEN stop_hits / n_tok ELSE 0 END), 4) AS quality
      FROM (
        SELECT doc_id, text,
          CAST(len(regexp_split_to_array(trim(text), '[\\t\\n\\x0B\\f\\r ]+')) AS DOUBLE) AS n_tok,
          CAST(len(list_filter(regexp_split_to_array(trim(text), '[\\t\\n\\x0B\\f\\r ]+'),
            t -> t IN ($stopSqlList))) AS DOUBLE) AS stop_hits
        FROM documents)
      ORDER BY doc_id"""))

  /** Within-document repetition (the Gopher-style duplicate-trigram rule):
    * rep_ratio = 1 − distinct trigrams / total trigrams. High values mark
    * boilerplate/spam for corpus filtering. Single-scan projection. */
  val repetition = Q(
    "q_text_repetition",
    (s, dir) => {
      val nTok = size(TextFunctions.tokens(col("text")))
      val total = greatest(nTok - 2, lit(1)).cast("double")
      val distinctGrams = size(graft.operators.Dedup.wordNgrams(col("text"), 3)).cast("double")
      // sort-first: the gram kernel stays above the range exchange
      docsSorted(s, dir).select(col("doc_id"),
        total.cast("long").as("total_grams"),
        distinctGrams.cast("long").as("distinct_grams"),
        round(lit(1.0) - distinctGrams / total, 4).as("rep_ratio"))
    },
    Some("""WITH d AS (
        SELECT doc_id,
          greatest(len(toks) - 2, 1) AS total_grams,
          len(list_distinct([list_aggregate(toks[i:i+2], 'string_agg', ' ')
            for i in range(1, greatest(len(toks) - 1, 2))])) AS distinct_grams
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '[\t\n\x0B\f\r ]+') AS toks
              FROM documents))
      SELECT doc_id, total_grams, distinct_grams,
        round(1.0 - distinct_grams * 1.0 / total_grams, 4) AS rep_ratio
      FROM d ORDER BY doc_id"""))

  /** PII redaction. The synthetic corpus carries no PII, so the query
    * first injects deterministic email/phone/IPv4 strings derived from
    * doc_id (same expression replayed in the oracle), then counts and
    * redacts them with [[graft.operators.Curation.redactPii]]. What the
    * oracle pins: the three redaction regexes behave identically under
    * Java regex and RE2, and redaction is global, not first-match. */
  val piiRedact = Q(
    "q_pii_redact",
    (s, dir) => {
      import graft.operators.Curation
      val docs = docsSorted(s, dir) // sort-first (see docsSorted)
      val injected = concat(
        col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com"))).otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit(" call 555-867-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"))).otherwise(lit("")),
        when(col("doc_id") % 3 === 0,
          concat(lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
            lit("."), (expr("doc_id div 7") % 256).cast("string"))).otherwise(lit("")))
      // single-kernel audit: the composed form (3× regexp_extract_all +
      // 3× regexp_replace) materialized the document ~13× per row and
      // its 100× excess was pure GC; pii_stats allocates one String and
      // per-match buffers only (KernelsSpec pins equality with the
      // composed form, which the oracle SQL still replays)
      docs.select(col("doc_id"),
          graft.functions.KernelExpressions.pii_stats(injected).as("st"))
        .select(col("doc_id"),
          col("st.n_emails").as("n_emails"),
          col("st.n_phones").as("n_phones"),
          col("st.n_ips").as("n_ips"),
          md5(col("st.redacted")).as("redacted_md5"))
    },
    Some("""WITH p AS (
        SELECT doc_id, text
          || CASE WHEN doc_id % 7 = 0
               THEN ' contact user' || doc_id || '@example.com' ELSE '' END
          || CASE WHEN doc_id % 5 = 0
               THEN ' call 555-867-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
          || CASE WHEN doc_id % 3 = 0
               THEN ' from 10.0.' || (doc_id % 256) || '.' || ((doc_id // 7) % 256) ELSE '' END
          AS pii_text
        FROM documents)
      SELECT doc_id,
        len(regexp_extract_all(pii_text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        len(regexp_extract_all(pii_text, '\b\d{3}-\d{3}-\d{4}\b')) AS n_phones,
        len(regexp_extract_all(pii_text, '\b\d{1,3}(\.\d{1,3}){3}\b')) AS n_ips,
        md5(regexp_replace(regexp_replace(regexp_replace(pii_text,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g'),
          '\b\d{1,3}(\.\d{1,3}){3}\b', '<IP>', 'g')) AS redacted_md5
      FROM p ORDER BY doc_id"""))

  /** Fixed-size token chunking with overlap (chunk 40, stride 32) — the
    * standard pre-tokenization shard step. One explode per chunk; every
    * token lands in ≥1 chunk; tail chunks may be short. Shuffle-free
    * (scan → explode → projection). */
  val chunkOverlap = Q(
    "q_chunk_overlap",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      // chunk rows are a pure function of the text, so tokenize + slice +
      // md5 run once per DISTINCT text (Dedup.classReps) and the per-rep
      // chunk rows fan back out to every doc through the (doc → rep)
      // mapping — identical output, chunking cost divided by the
      // duplication factor (the remaining cost is output-bound: the
      // expanded rows still materialize and sort).
      val mapping = graft.operators.Dedup.textClasses(docs, "doc_id", "text")
      val repChunks = graft.operators.Dedup.classReps(docs, "doc_id", "text")
        .select(col("rep"), TextFunctions.tokens(col("text")).as("t"))
        .withColumn("chunk_idx",
          explode(expr("sequence(0, int(greatest(ceil((size(t) - 40) / 32.0), 0)))")))
        .select(col("rep"), col("chunk_idx").cast("long").as("chunk_idx"),
          expr("slice(t, chunk_idx * 32 + 1, 40)").as("c"))
        .select(col("rep"), col("chunk_idx"),
          size(col("c")).as("chunk_tokens"),
          md5(concat_ws(" ", col("c"))).as("chunk_md5"))
      mapping.select(col("doc").as("doc_id"), col("rep"))
        .join(repChunks, Seq("rep"))
        .select(col("doc_id"), col("chunk_idx"), col("chunk_tokens"), col("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },
    Some("""WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '[\t\n\x0B\f\r ]+') AS t FROM documents),
      c AS (SELECT doc_id, t,
          unnest(range(0, 1 + greatest(CAST(ceil((len(t) - 40) / 32.0) AS INT), 0))) AS chunk_idx
        FROM toks)
      SELECT doc_id, chunk_idx,
        len(t[chunk_idx*32 + 1 : chunk_idx*32 + 40]) AS chunk_tokens,
        md5(list_aggregate(t[chunk_idx*32 + 1 : chunk_idx*32 + 40], 'string_agg', ' ')) AS chunk_md5
      FROM c ORDER BY doc_id, chunk_idx"""))

  /** Content-defined chunking + sub-document dup audit
    * ([[Curation.contentDefinedChunks]], divisor 8 → ~8-token expected
    * chunks; the synthetic corpus has a 31-word vocabulary, of which two
    * words anchor at mod 8 — mod 16 anchors nothing): per doc, how many of its content-defined chunks also occur
    * in at least one OTHER document — the passage-level boilerplate
    * signal that is robust to insertions (boundaries re-sync at the next
    * anchor token, so a shared passage fingerprints identically at any
    * offset). Chunking itself is per-row array math with zero shuffle;
    * only the compact (doc, fp) chunk rows shuffle — once for the
    * fingerprint document-frequency aggregate, once back onto the doc
    * rollup. Oracle replays the per-token FNV anchors, the segment
    * slicing, and the chunk fingerprints in DuckDB HUGEINT arithmetic
    * ([[HashSqlParts]]). */
  val chunkCdc = Q(
    "q_chunk_cdc",
    (s, dir) => {
      // Exact-dup collapse first (Dedup.textClasses): chunk fingerprints
      // are pure functions of the text, so the CDC kernel and both chunk
      // shuffles run over DISTINCT texts. A fingerprint's document
      // frequency over ALL copies is Σm across the classes whose text
      // contains it at least once (per-(rep, fp) distinct, then
      // m-weighted sum — countDistinct(doc) counted a doc once however
      // often the chunk repeated inside it, and every copy repeats it
      // identically). Per-class rollups expand to every doc through the
      // (doc → rep) mapping. NO persist on the chunk rows, deliberately:
      // the producer is one cheap codegen'd kernel pass and the
      // (collapsed) recompute-per-consumer beats a materialization
      // round-trip (measured pre-collapse: 14.6 s vs 20–25 s at 100×).
      val docs = Tables.documents(s, dir)
      val mapping = graft.operators.Dedup.textClasses(docs, "doc_id", "text")
      val reps = graft.operators.Dedup.classReps(docs, "doc_id", "text")
      val rows = graft.operators.Curation.contentDefinedChunks(
        reps, "rep", "text", 8)
      val dfreq = rows.select(col("doc").as("rep"), col("fp")).distinct()
        .join(reps.select(col("rep"), col("m")), "rep")
        .groupBy(col("fp")).agg(sum(col("m")).as("ndocs"))
      val perRep = rows.join(dfreq, "fp")
        .groupBy(col("doc").as("rep"))
        .agg(count(lit(1)).as("n_chunks"),
          max(col("chunk_len")).as("max_chunk_len"),
          sum(when(col("ndocs") > 1, 1L).otherwise(0L)).as("n_shared_chunks"))
      mapping.select(col("doc").as("doc_id"), col("rep"))
        .join(perRep, Seq("rep"))
        .select(col("doc_id"), col("n_chunks"), col("max_chunk_len"),
          col("n_shared_chunks"))
        .orderBy(col("doc_id"))
    },
    Some {
      import HashSqlParts._
      val anchor = s"((CAST(${toSigned("hu")} AS BIGINT) % 8) + 8) % 8 = 0"
      s"""WITH ${tokenHashCtes},
      bp AS (SELECT doc_id, list_sort(list(pos)) AS bpos FROM thr
             WHERE $anchor GROUP BY doc_id),
      seg AS (SELECT t.doc_id, t.tk, len(t.tk) AS n,
          coalesce(b.bpos, CAST([] AS BIGINT[])) AS bpos
        FROM toks0 t LEFT JOIN bp b USING (doc_id)),
      bounds AS (SELECT doc_id, tk,
          list_concat([CAST(1 AS BIGINT)], list_transform(bpos, p -> p + 1)) AS starts,
          list_concat(bpos, [CAST(n AS BIGINT)]) AS ends
        FROM seg),
      cl AS (SELECT doc_id,
          [tk[starts[j]:ends[j]] for j in range(1, len(starts) + 1)
            if ends[j] >= starts[j]] AS chs
        FROM bounds),
      cr AS (SELECT doc_id, unnest(chs) AS ctoks FROM cl),
      cj AS (SELECT doc_id, len(ctoks) AS clen,
          list_aggregate(ctoks, 'string_agg', ' ') AS t FROM cr),
      cfp AS (SELECT doc_id, clen, $fnvFold AS hu FROM cj),
      dfreq AS (SELECT hu, count(DISTINCT doc_id) AS ndocs FROM cfp GROUP BY hu)
      SELECT cfp.doc_id, count(*) AS n_chunks,
        max(clen) AS max_chunk_len,
        CAST(sum(CASE WHEN dfreq.ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_chunks
      FROM cfp JOIN dfreq USING (hu)
      GROUP BY cfp.doc_id ORDER BY cfp.doc_id"""
    })

  /** Exact AUC of the token-count PROXY against the stored n_chars
    * ground truth (positive class: n_chars > 300) — the validate-the-
    * proxy-before-trusting-it eval a screening pipeline runs before
    * replacing an expensive signal with a cheap one. Integer scores
    * make the tie handling (midrank ½ credit) load-bearing, which is
    * exactly what the level-based form computes exactly. Computed in the SCALABLE exact form:
    * the Mann–Whitney U statistic over SCORE LEVELS, not rows — scores
    * group to their distinct (rounded) values with per-level pos/neg
    * counts (ONE map-side-combinable shuffle over ≤10⁴ levels), then
    * U = Σ_level n_l·(cumpos_below + p_l/2) folds over the tiny level
    * table (the only window runs over levels, never the corpus).
    * Tie-handling is the standard midrank ½ credit. */
  val scoreAuc = Q(
    "q_score_auc",
    (s, dir) =>
      graft.operators.Curation.exactAuc(Tables.documents(s, dir),
        size(TextFunctions.tokens(col("text"))), col("n_chars") > 300),
    Some(s"""WITH b AS (
        SELECT len(regexp_split_to_array(trim(text), '[\\t\\n\\x0B\\f\\r ]+')) AS sc,
          CASE WHEN n_chars > 300 THEN 1 ELSE 0 END AS pos
        FROM documents),
      lv AS (SELECT sc, CAST(sum(pos) AS BIGINT) AS p,
          CAST(sum(1 - pos) AS BIGINT) AS n
        FROM b GROUP BY sc),
      c AS (SELECT sc, p, n,
          coalesce(CAST(sum(n) OVER (ORDER BY sc
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cn
        FROM lv)
      SELECT CAST(sum(p) AS BIGINT) AS n_pos, CAST(sum(n) AS BIGINT) AS n_neg,
        round(sum(CAST(p AS DOUBLE) * (cn + n / 2.0))
          / (CAST(sum(p) AS BIGINT) * CAST(sum(n) AS BIGINT)), 6) AS auc
      FROM c"""))

  /** Corpus diversity: distinct-n ratios (distinct / total n-grams for
    * n = 1, 2, 3) — the standard generation-diversity / memorization
    * diagnostic (low distinct-2/3 means the corpus repeats itself; the
    * training-data mirror of the distinct-n metric used on model
    * samples). One pass per n over the codegen'd occurrence-view n-gram
    * kernel; the shuffle carries (n, gram) with map-side partial
    * aggregation, and the output is 3 rows regardless of corpus size. */
  val distinctNgrams = Q(
    "q_distinct_ngrams",
    (s, dir) => {
      // exact-dup collapse first (Dedup.classReps): totals are class
      // counts weighted by multiplicity (Σm ≡ count over all copies) and
      // the distinct set is unchanged by copies, so the tokenize +
      // explode + distinct shuffle run over DISTINCT texts only.
      val reps = graft.operators.Dedup.classReps(
        Tables.documents(s, dir), "doc_id", "text")
      def grams(n: Int) = reps.select(lit(n).as("n"), col("m"),
        explode(graft.functions.KernelExpressions.word_ngrams_all(col("text"), n))
          .as("gram"))
      grams(1).unionByName(grams(2)).unionByName(grams(3))
        .groupBy(col("n"))
        .agg(sum(col("m")).as("total_grams"),
          countDistinct(col("gram")).as("distinct_grams"))
        .select(col("n"), col("total_grams"), col("distinct_grams"),
          round(col("distinct_grams") / col("total_grams"), 6).as("distinct_ratio"))
        .orderBy(col("n"))
    },
    Some("""WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '[\t\n\x0B\f\r ]+') AS t FROM documents),
      g AS (
        SELECT 1 AS n, unnest([list_aggregate(t[i:i], 'string_agg', ' ')
            for i in range(1, len(t) + 1)]) AS gram FROM toks
        UNION ALL
        SELECT 2, unnest([list_aggregate(t[i:i+1], 'string_agg', ' ')
            for i in range(1, greatest(len(t) - 1, 1) + 1)]) FROM toks
        UNION ALL
        SELECT 3, unnest([list_aggregate(t[i:i+2], 'string_agg', ' ')
            for i in range(1, greatest(len(t) - 2, 1) + 1)]) FROM toks)
      SELECT n, count(*) AS total_grams,
        CAST(count(DISTINCT gram) AS BIGINT) AS distinct_grams,
        round(CAST(count(DISTINCT gram) AS DOUBLE) / count(*), 6) AS distinct_ratio
      FROM g GROUP BY n ORDER BY n"""))

  /** Language ID (stopword-profile heuristic) scored against the table's
    * lang column. Oracle: the same argmax-of-stopword-hits heuristic in
    * DuckDB SQL (ties go to the alphabetically-first language, matching
    * the Scala loop over profiles sorted by code; zero hits → 'und'). */
  val langId = Q(
    "q_text_langid",
    (s, dir) => {
      // one codegen'd kernel pass (sort-first; see docsSorted); the
      // Seq[String]-UDF form is the spec-pinned parity reference
      docsSorted(s, dir).select(col("doc_id"), col("lang"),
        graft.functions.KernelExpressions.lang_id(col("text")).as("lang_pred"))
    },
    Some("""WITH t AS (
        SELECT doc_id, lang, regexp_split_to_array(trim(text), '[\t\n\x0B\f\r ]+') AS toks
        FROM documents),
      h AS (SELECT doc_id, lang,
        len(list_filter(toks, x -> x IN ('der','die','das','und','ist','von','mit','ein','eine','zu','den','im'))) AS h_de,
        len(list_filter(toks, x -> x IN ('the','and','of','to','a','in','is','it','that','for','on','with','as'))) AS h_en,
        len(list_filter(toks, x -> x IN ('el','la','de','que','y','en','un','una','es','los','las','por','con'))) AS h_es,
        len(list_filter(toks, x -> x IN ('le','la','les','de','des','et','est','un','une','du','en','que','pour'))) AS h_fr,
        len(list_filter(toks, x -> x IN ('il','la','di','che','e','un','una','per','con','del','sono','non'))) AS h_it,
        len(list_filter(toks, x -> x IN ('o','a','de','que','e','do','da','em','um','uma','com','para','os'))) AS h_pt
        FROM t)
      SELECT doc_id, lang,
        CASE WHEN greatest(h_de,h_en,h_es,h_fr,h_it,h_pt) = 0 THEN 'und'
             WHEN h_de = greatest(h_de,h_en,h_es,h_fr,h_it,h_pt) THEN 'de'
             WHEN h_en = greatest(h_de,h_en,h_es,h_fr,h_it,h_pt) THEN 'en'
             WHEN h_es = greatest(h_de,h_en,h_es,h_fr,h_it,h_pt) THEN 'es'
             WHEN h_fr = greatest(h_de,h_en,h_es,h_fr,h_it,h_pt) THEN 'fr'
             WHEN h_it = greatest(h_de,h_en,h_es,h_fr,h_it,h_pt) THEN 'it'
             ELSE 'pt' END AS lang_pred
      FROM h ORDER BY doc_id"""))

  /** Fingerprinting, oracle-checked variant: md5 of normalized text
    * (byte-identical in Spark and DuckDB). */
  val fingerprintMd5 = Q(
    "q_text_fingerprint",
    (s, dir) => {
      docsSorted(s, dir)
        .select(col("doc_id"), md5(lower(trim(col("text")))).as("fp"))
    },
    Some("SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents ORDER BY doc_id"))

  /** Fingerprinting, native-Expression variant: 64-bit FNV-1a rolling hash
    * as a codegen'd Catalyst Expression (whole-stage-codegen friendly).
    * Oracle: DuckDB replays FNV-1a exactly in HUGEINT arithmetic — fold
    * the UTF-8 bytes (code points expanded per the UTF-8 rules) with
    * `list_reduce`, wrapping each step mod 2^64; the xor touches only the
    * low byte so it stays in BIGINT range. The final HUGEINT is mapped to
    * Java's signed long. Validated char-for-char against an independent
    * implementation on the sf0.01 corpus. */
  val fingerprintFnv = Q(
    "q_text_fingerprint_fnv",
    (s, dir) => {
      docsSorted(s, dir)
        .select(col("doc_id"), TextFunctions.fnv64(lower(trim(col("text")))).as("fp64"))
    },
    // Empty text takes the FNV basis branch BEFORE any byte work (DuckDB
    // string_split('','') is [''] and ord('') is -1, so len(bytes)=0 never
    // fires); NULL text propagates NULL like the null-safe expression.
    Some("""WITH b AS (
        SELECT doc_id, lower(trim(text)) AS s,
          flatten(list_transform(
            list_transform(string_split(lower(trim(text)), ''), ch -> ord(ch)),
            c -> CASE
              WHEN c < 128   THEN [c]
              WHEN c < 2048  THEN [192 + c // 64, 128 + c % 64]
              WHEN c < 65536 THEN [224 + c // 4096, 128 + (c // 64) % 64, 128 + c % 64]
              ELSE [240 + c // 262144, 128 + (c // 4096) % 64, 128 + (c // 64) % 64, 128 + c % 64]
            END)) AS bytes
        FROM documents),
      h AS (
        SELECT doc_id,
          CASE WHEN s IS NULL THEN NULL
               WHEN length(s) = 0 THEN CAST('14695981039346656037' AS HUGEINT)
               ELSE list_reduce(
                 list_prepend(CAST('14695981039346656037' AS HUGEINT), bytes),
                 (h, c) -> ((h // 256) * 256 + xor(CAST(h % 256 AS BIGINT), c)) * 1099511628211
                           % CAST('18446744073709551616' AS HUGEINT))
          END AS hu
        FROM b)
      SELECT doc_id,
        CAST(CASE WHEN hu >= CAST('9223372036854775808' AS HUGEINT)
             THEN hu - CAST('18446744073709551616' AS HUGEINT) ELSE hu END AS BIGINT) AS fp64
      FROM h ORDER BY doc_id"""))

  /** Semi-structured metadata extraction: parse the JSON props column
    * with a typed schema (from_json is a codegen'd Catalyst expression,
    * not a UDF), aggregate by a derived bucket — the metadata-filtering
    * shape every training-data pipeline runs over crawl records. */
  val jsonMeta = Q(
    "q_text_json_meta",
    (s, dir) => {
      val ev = graft.Tables.events(s, dir)
      val k = get_json_object(col("props"), "$.k").cast("int")
      // floor() on both sides: Spark's double->int cast truncates while
      // DuckDB's rounds, so the bucket must be floored before the cast
      ev.select(col("event_type"), floor(k / 10).cast("int").as("k_bucket"))
        .groupBy(col("event_type"), col("k_bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"), col("k_bucket"))
    },
    Some("""SELECT event_type,
        CAST(floor(CAST(json_extract_string(props, '$.k') AS INTEGER) / 10) AS INTEGER) AS k_bucket,
        count(*) AS n
      FROM events GROUP BY event_type, k_bucket
      ORDER BY event_type, k_bucket"""))

  /** BPE-merge-step analogue over words: the top-20 adjacent token pairs
    * by OCCURRENCE count (the pair a byte-pair-encoding trainer would
    * merge next, lifted to word level). Uses the occurrence-view
    * `word_ngrams_all` kernel — the distinct-view wordNgrams would
    * undercount repeated pairs within a document. Explode → partial-agg →
    * TakeOrderedAndProject top-k: the full pair table shuffles only
    * map-side partials.
    *
    * COLLAPSE-FIRST (r18): a document's bigram multiset is a pure
    * function of its text, so the explode runs once per DISTINCT text
    * ([[graft.operators.Dedup.classReps]]) and each class contributes
    * its count weighted by multiplicity `sum(m)` — identical totals, at
    * class volume instead of row volume (7.1 → 1.45 s at the 100×
    * fixture, where the explode was the whole cost over the 1.46 s
    * digest floor). Identity tier: m = 1 per doc — exactly the r17
    * uncollapsed form. */
  val bigramMining = Q(
    "q_bigram_mining",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val pairs = graft.operators.Dedup
        .classReps(Tables.documents(s, dir), "doc_id", "text")
        .select(col("m"),
          explode(graft.functions.KernelExpressions.word_ngrams_all(col("text"), 2))
            .as("bigram"))
      pairs.groupBy(col("bigram")).agg(sum(col("m")).as("n"))
        .orderBy(col("n").desc, col("bigram")).limit(20)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("n").desc, col("bigram"))))
        .select(col("rank"), col("bigram"), col("n"))
    },
    Some("""WITH toks AS (SELECT regexp_split_to_array(trim(text), '[\t\n\x0B\f\r ]+') AS t FROM documents),
      b AS (SELECT [list_aggregate(t[i:i+1], 'string_agg', ' ')
          for i in range(1, greatest(len(t), 2))] AS grams FROM toks),
      u AS (SELECT unnest(grams) AS bigram FROM b),
      c AS (SELECT bigram, count(*) AS n FROM u GROUP BY bigram),
      r AS (SELECT bigram, n, row_number() OVER (ORDER BY n DESC, bigram) AS rank FROM c)
      SELECT rank, bigram, n FROM r WHERE rank <= 20 ORDER BY rank"""))

  /** Bigram-LM corpus predictability ([[graft.operators.NgramLm]]): the
    * perplexity-proxy quality scorer, per document. Integer transition
    * sums + one final division — DuckDB replays it exactly. */
  val bigramLm = Q(
    "q_text_bigram_lm",
    (s, dir) =>
      graft.operators.NgramLm.bigramCorpusScore(
        Tables.documents(s, dir), "doc_id", "text")
        .withColumnRenamed("doc", "doc_id")
        .orderBy(col("doc_id")),
    Some("""WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '[\t\n\x0B\f\r ]+') AS t FROM documents),
      g AS (SELECT doc_id, unnest([list_aggregate(t[i:i+1], 'string_agg', ' ')
          for i in range(1, greatest(len(t), 2))]) AS bigram FROM toks),
      o AS (SELECT doc_id, bigram, split_part(bigram, ' ', 1) AS ctx FROM g),
      c2 AS (SELECT bigram, CAST(count(*) AS BIGINT) AS c2 FROM o GROUP BY bigram),
      c1 AS (SELECT ctx, CAST(count(*) AS BIGINT) AS c1 FROM o GROUP BY ctx),
      p AS (SELECT o.doc_id,
          CAST(count(*) AS BIGINT) AS n_bigrams,
          CAST(sum(c2.c2) AS BIGINT) AS support_sum,
          CAST(sum(c1.c1) AS BIGINT) AS context_sum,
          CAST(sum(CASE WHEN c2.c2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
        FROM o JOIN c2 USING (bigram) JOIN c1 USING (ctx)
        GROUP BY o.doc_id)
      SELECT d.doc_id,
        coalesce(n_bigrams, 0) AS n_bigrams,
        coalesce(support_sum, 0) AS support_sum,
        coalesce(context_sum, 0) AS context_sum,
        coalesce(hapax, 0) AS hapax,
        round(CAST(support_sum AS DOUBLE) / context_sum, 6) AS predictability,
        round(CAST(hapax AS DOUBLE) / n_bigrams, 6) AS novelty
      FROM documents d LEFT JOIN p USING (doc_id) ORDER BY doc_id"""))

  /** VARIANT ingestion + typed shredding (Spark 4's semi-structured
    * type — the open-lakehouse JSON answer): nested JSON is parsed ONCE
    * into a variant column (`parse_json`), then multiple typed paths are
    * extracted with `variant_get` and aggregated. The nested document is
    * built in-query from the flat fixture columns (value pre-rounded so
    * the JSON text round-trip is exact by construction), so the oracle
    * needs no JSON at all: extraction is lossless, and the DIRECT
    * computation over the base columns IS the correctness statement for
    * the parse → shred path. */
  val variantShred = Q(
    "q_events_variant",
    (s, dir) => {
      val ev = graft.Tables.events(s, dir)
      val nested = to_json(struct(
        col("event_type").as("t"),
        struct(get_json_object(col("props"), "$.k").cast("int").as("k"),
          round(col("value"), 2).as("v")).as("m")))
      ev.select(parse_json(nested).as("doc"))
        .select(
          expr("variant_get(doc, '$.t', 'string')").as("event_type"),
          expr("variant_get(doc, '$.m.k', 'int')").as("k"),
          expr("variant_get(doc, '$.m.v', 'double')").as("v"))
        .groupBy(col("event_type"), pmod(col("k"), lit(5)).as("k_mod"))
        .agg(count(lit(1)).as("n"), round(sum(col("v")), 2).as("sum_v"))
        .orderBy(col("event_type"), col("k_mod"))
    },
    Some("""SELECT event_type,
        CAST(json_extract_string(props, '$.k') AS INTEGER) % 5 AS k_mod,
        count(*) AS n, round(sum(round(value, 2)), 2) AS sum_v
      FROM events GROUP BY event_type, k_mod
      ORDER BY event_type, k_mod"""))

  /** Unicode NFC canonicalization (native codegen'd
    * [[graft.functions.KernelExpressions.nfc_normalize]] kernel over
    * `java.text.Normalizer`): byte-different renderings of the same text
    * (decomposed accents) must collapse to one form BEFORE digest dedup
    * or they defeat it. The fixture corpus is ASCII-normalized already,
    * so the query PLANTS decomposed suffixes (e+U+0301, A+U+030A, the
    * U+FB01 ligature — NFC-invariant, proving this is not NFKC) on the
    * first 200 docs — same pattern as the LSH planted twins; the oracle
    * builds identical strings with chr() and replays utf8proc's
    * `nfc_normalize`, pinning Java ≡ utf8proc on the full output text. */
  val unicodeNfc = Q(
    "q_text_unicode_nfc",
    (s, dir) => {
      val m = pmod(col("doc_id"), lit(4))
      // explicit escapes, NOT raw characters: an NFC-normalizing editor
      // would silently precompose a pasted decomposed literal
      val suffix = when(m === 0, lit("e\u0301"))
        .when(m === 1, lit("A\u030A"))
        .when(m === 2, lit("\uFB01"))
        .otherwise(lit(""))
      val aug = concat(col("text"), suffix)
      val norm = graft.functions.KernelExpressions.nfc_normalize(aug)
      Tables.documents(s, dir).where(col("doc_id") < 200)
        .select(col("doc_id"), aug.as("aug"), norm.as("norm"))
        .select(col("doc_id"),
          (col("norm") =!= col("aug")).as("changed"),
          length(col("aug")).cast("long").as("len_aug"),
          length(col("norm")).cast("long").as("len_norm"),
          col("norm").as("norm_text"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH aug AS (SELECT doc_id,
        text || CASE doc_id % 4
          WHEN 0 THEN 'e' || chr(769)
          WHEN 1 THEN 'A' || chr(778)
          WHEN 2 THEN chr(64257)
          ELSE '' END AS t
      FROM documents WHERE doc_id < 200)
      SELECT doc_id, nfc_normalize(t) <> t AS changed,
        CAST(length(t) AS BIGINT) AS len_aug,
        CAST(length(nfc_normalize(t)) AS BIGINT) AS len_norm,
        nfc_normalize(t) AS norm_text
      FROM aug ORDER BY doc_id"""))

  /** Whitespace-separator alignment witness (round 16): Java/Spark's
    * regex `\s` matches vertical tab U+000B; DuckDB's RE2 `\s` does not —
    * the last documented tokenizer divergence. Round 16 moved every
    * oracle to the explicit class `[\t\n\x0B\f\r ]+` (≡ Java `\s` on
    * ASCII); this query PLANTS VT/CR/tab separators on the first 200
    * docs (the fixture corpus is space-separated, so without planting the
    * fix would be untested) — same planted-suffix pattern as
    * `q_text_unicode_nfc` — and hash-pins the FULL token list of both
    * engines, including the leading/trailing empty tokens that survive
    * space-only trim. Round 17 adds the complement pins: NEL (U+0085)
    * and NBSP (U+00A0) are NOT separators under Java `\s` or the
    * oracle's explicit class, and a NULL text yields a NULL tok_md5 on
    * both engines (Spark needs an explicit guard — its concat_ws treats
    * a NULL array as empty). */
  val wsSpecials = Q(
    "q_text_ws_specials",
    (s, dir) => {
      val m = pmod(col("doc_id"), lit(7))
      // explicit escapes, not raw control characters in the source.
      // Cases 5/6 plant NEL (U+0085) and NBSP (U+00A0): Java's \s
      // excludes BOTH (no UNICODE_CHARACTER_CLASS in play), as does the
      // oracle's explicit [\t\n\x0B\f\r ] class -- pinned here as
      // NON-separators (they glue onto adjacent tokens), the complement
      // of the VT separator pin.
      val sep = when(m === 0, lit("\u000B"))
        .when(m === 1, lit("\u000B "))
        .when(m === 2, lit("\t\u000B"))
        .when(m === 3, lit("\r"))
        .when(m === 5, lit("\u0085"))
        .when(m === 6, lit("\u00A0"))
        .otherwise(lit(" "))
      val aug = concat(sep, col("text"), sep, lit("tail"), sep)
      val toks = graft.functions.TextFunctions.tokens(col("aug"))
      Tables.documents(s, dir).where(col("doc_id") < 200)
        .select(col("doc_id"), aug.as("aug"))
        .select(col("doc_id"),
          size(toks).cast("long").as("n_tokens"),
          size(filter(toks, t => t === lit(""))).cast("long").as("n_empty"),
          // NULL-text guard (ADVICE r16): for NULL aug, Spark's
          // concat_ws treats the NULL token array as EMPTY (md5(''))
          // while the oracle's md5(array_to_string(...)) null-propagates
          // -- emit NULL symmetrically. Fixtures carry no NULL texts, so
          // this closes a latent divergence without changing output.
          when(col("aug").isNull, lit(null).cast("string"))
            .otherwise(md5(concat_ws("|", toks))).as("tok_md5"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH sep AS (SELECT doc_id, text, CASE CAST(doc_id % 7 AS INTEGER)
        WHEN 0 THEN chr(11) WHEN 1 THEN chr(11) || ' '
        WHEN 2 THEN chr(9) || chr(11) WHEN 3 THEN chr(13)
        WHEN 5 THEN chr(133) WHEN 6 THEN chr(160) ELSE ' ' END AS sp
        FROM documents WHERE doc_id < 200),
      aug AS (SELECT doc_id, sp || text || sp || 'tail' || sp AS t FROM sep),
      tk AS (SELECT doc_id,
          -- trim(t, ' '): DuckDB's default trim strips Unicode Zs (space
          -- AND NBSP) while Spark's trim strips ASCII space only -- the
          -- explicit char set keeps the planted NBSP, like Spark does
          regexp_split_to_array(trim(t, ' '), '[\t\n\x0B\f\r ]+') AS toks FROM aug)
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        CAST(len(list_filter(toks, x -> x = '')) AS BIGINT) AS n_empty,
        md5(array_to_string(toks, '|')) AS tok_md5
      FROM tk ORDER BY doc_id"""))

  def all: Seq[Q] = Seq(tokenCount, quality, repetition, langId, fingerprintMd5,
    fingerprintFnv, jsonMeta, piiRedact, chunkOverlap, chunkCdc, distinctNgrams, scoreAuc, bigramMining,
    bigramLm, unicodeNfc, variantShred, wsSpecials)
}

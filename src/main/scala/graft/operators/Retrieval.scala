package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Sparse-retrieval operators over a document corpus: BM25 relevance
  * scoring for a fixed query-term set, inverted-index posting statistics,
  * term co-occurrence association, and reciprocal-rank fusion of two
  * rankings. The retrieval face of the training-data pipeline: corpus
  * search for eval-set mining, term statistics for tokenizer/vocab
  * decisions, association mining for contamination leads.
  *
  * Scale notes (100 TB): BM25 never explodes — the per-doc term
  * frequencies come from codegen'd array HOFs in ONE scan, corpus totals
  * are a 1-row aggregate broadcast back, and the global top-k is
  * TakeOrderedAndProject (per-partition heads merged on the driver),
  * never a full sort. The inverted index aggregates (term, doc) partials
  * map-side before the per-term reduce, so the shuffle carries one row
  * per distinct (term, doc), not one per token occurrence. Co-occurrence
  * joins a |docs| x |vocab| presence table with itself on doc_id — the
  * vocabulary is the bounded query set, not the corpus vocabulary.
  *
  * The BM25 idf uses the RATIONAL core (N - df + 0.5)/(df + 0.5) WITHOUT
  * the usual log: ranking order is preserved (log is monotone), and every
  * score stays +,-,*,/ over exact counts — one IEEE rounding per op, the
  * same result in any engine — where ln would hang cross-engine equality
  * on math-library ulp differences (same policy as Curation.tfidfTerms).
  */
object Retrieval {

  /** k1/b are the classic BM25 defaults. Exposed as exact decimal
    * literals so the oracle SQL can repeat them verbatim. */
  val K1 = 1.2
  val B = 0.75

  private def tfCol(t: String) = s"tf_$t"
  private def dfCol(t: String) = s"df_$t"

  /** (id, dl, tf_<term>...) in ONE tokenize pass per row: the codegen'd
    * TermCounts kernel counts every term in a single traversal, where the
    * composed `size(filter(split(...)))` form costs K interpreted
    * split+filter chains per row (measured 10.2 s → 1.7 s for
    * q_bm25_topk at the 20× probe). Tokenization semantics are pinned to
    * `split(trim(text), '\\s+')` under JAVA regex; the oracles replay it
    * with the explicit class `[\\t\\n\\x0B\\f\\r ]+` (RE2's `\\s`
    * excludes U+000B -- the round-16 sweep missed these two generated
    * oracles; the r17 review closed them). */
  private[graft] def termCountsPerDoc(docs: DataFrame, idCol: String,
      textCol: String, terms: Seq[String],
      carry: Seq[String] = Nil): DataFrame = {
    val tc = graft.functions.KernelExpressions.term_counts(col(textCol), terms)
    docs.select(col(idCol) +: carry.map(col) :+ tc.as("tc"): _*)
      .select(
        col(idCol) +: carry.map(col) ++:
          element_at(col("tc"), 1).as("dl") +:
          terms.zipWithIndex.map { case (t, i) =>
            element_at(col("tc"), i + 2).as(tfCol(t))
          }: _*)
  }

  /** The shared BM25 scoring input: per-doc term counts cross-joined
    * with the broadcast 1-row corpus totals (n, sum_dl, per-term df).
    * ONE home for bm25 and bm25ContextAssembly (r17 review — the copies
    * are exactly how the r16 tokenizer sweep missed a generator). */
  private def scoredBase(perDoc: DataFrame, terms: Seq[String]): DataFrame = {
    val totalCols =
      count(lit(1)).as("n") +: sum(col("dl")).as("sum_dl") +:
        terms.map(t => sum(when(col(tfCol(t)) > 0, 1L).otherwise(0L)).as(dfCol(t)))
    perDoc.crossJoin(broadcast(perDoc.agg(totalCols.head, totalCols.tail: _*)))
  }

  /** COLLAPSE-AWARE [[scoredBase]] (r18): term counts are a pure
    * function of the text, so on a duplication-heavy corpus the
    * TermCounts kernel runs once per DISTINCT text
    * ([[graft.operators.Dedup.classReps]]), the corpus totals weight
    * each class by its multiplicity (n = Σm, sum_dl = Σ m·dl, df_t =
    * Σ m·[tf_t>0] — identical to the doc-level totals by definition),
    * and the doc-level scoring rows come from the 24-byte class-mapping
    * join instead of a second kernel pass. The uncollapsed form pays
    * the kernel TWICE per row (the totals agg recomputes the perDoc
    * subtree); measured 8.6 → 4.7 s for q_bm25_topk at the 100×
    * fixture. Identity tier: exactly the r17 doc-level shape — no
    * mapping join on a ~all-distinct corpus. */
  private def scoredDocBase(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    if (!graft.operators.Dedup.collapseWorthwhile(docs))
      return scoredBase(termCountsPerDoc(docs, idCol, textCol, terms), terms)
    val perClass = termCountsPerDoc(
      graft.operators.Dedup.classReps(docs, idCol, textCol),
      "rep", textCol, terms, carry = Seq("m"))
    val totalCols =
      sum(col("m")).as("n") +: sum(col("m") * col("dl")).as("sum_dl") +:
        terms.map(t =>
          sum(when(col(tfCol(t)) > 0, col("m")).otherwise(0L)).as(dfCol(t)))
    val totals = perClass.agg(totalCols.head, totalCols.tail: _*)
    val mapping = graft.operators.Dedup.textClasses(docs, idCol, textCol)
      .select(col("doc"), col("rep"))
    mapping.join(perClass.drop("m"), "rep")
      .crossJoin(broadcast(totals))
      .drop("rep")
      .withColumnRenamed("doc", idCol)
  }

  /** One term's BM25 contribution over [[scoredBase]] columns — mirrors
    * the oracle's SQL text token for token: idf = (n − df + 0.5)/(df +
    * 0.5), tf-part = tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)). */
  private def termScoreCol(t: String): Column = {
    val avgdl = col("sum_dl").cast("double") / col("n")
    val tf = col(tfCol(t))
    val df = col(dfCol(t))
    val idf = (col("n").cast("double") - df + lit(0.5)) / (df + lit(0.5))
    idf * ((tf * lit(K1 + 1)) /
      (tf + lit(K1) * (lit(1 - B) + lit(B) * (col("dl") / avgdl))))
  }

  /** Shared oracle-SQL fragment builders for the two BM25 generators —
    * one home for the tokenizer class, the df counters, and the score
    * text (r17 review: the r16 RE2-\\s tokenizer fix had to be applied
    * to BOTH generators precisely because these were duplicated). */
  private def sqlTfDefs(textCol: String, terms: Seq[String]): String =
    terms.map(t =>
      s"""CAST(len(list_filter(regexp_split_to_array(trim($textCol), '[\\t\\n\\x0B\\f\\r ]+'),
         |      t -> t = '$t')) AS BIGINT) AS ${tfCol(t)}""".stripMargin).mkString(",\n    ")

  private def sqlDfDefs(terms: Seq[String]): String =
    terms.map(t =>
      s"CAST(sum(CASE WHEN ${tfCol(t)} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS ${dfCol(t)}")
      .mkString(",\n    ")

  private def sqlScoreText(terms: Seq[String]): String =
    terms.map { t =>
      s"""((CAST(n AS DOUBLE) - ${dfCol(t)} + 0.5) / (${dfCol(t)} + 0.5))
         | * ((${tfCol(t)} * ${K1 + 1}) / (${tfCol(t)} + $K1 * (${1 - B} + $B * (dl / (CAST(sum_dl AS DOUBLE) / n)))))""".stripMargin
    }.mkString("\n    + ")

  /** Per-document BM25 score against `terms`, one row per input row:
    * (doc_id, score). Plan: scan → codegen'd tf/dl projection → 1-row
    * totals aggregate → broadcast-crossJoin → scalar score arithmetic.
    * The per-term scores are added in the ORDER GIVEN (left fold), so an
    * oracle writing `s1 + s2 + s3` left-to-right reproduces the exact
    * double. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty && terms.size == terms.distinct.size,
      s"bm25 needs a non-empty, duplicate-free term set; got $terms")
    val j = scoredDocBase(docs, idCol, textCol, terms)
    // avgdl and the per-term scores mirror the oracle's SQL text token for
    // token: CAST(sum_dl AS DOUBLE)/n, idf = (n - df + 0.5)/(df + 0.5),
    // tf-part = tf*(k1+1) / (tf + k1*(1 - b + b*(dl/avgdl)))
    def termScore(t: String): Column = termScoreCol(t)
    j.select(col(idCol),
      round(terms.map(termScore).reduceLeft(_ + _), 4).as("score"))
  }

  /** Top-k by BM25 with a dense rank column. The cut is orderBy+limit —
    * Spark plans TakeOrderedAndProject (distributed per-partition top-k,
    * driver merge of k x partitions rows) — and only the k survivors see
    * the single-partition row_number window. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int): DataFrame = {
    val scored = bm25(docs, idCol, textCol, terms)
      .orderBy(col("score").desc, col(idCol)).limit(k)
    scored.withColumn("rank",
      row_number().over(Window.orderBy(col("score").desc, col(idCol))))
      .select(col("rank"), col(idCol), col("score"))
  }

  /** The oracle-side SQL for [[bm25]]'s scored set (doc_id, score), kept
    * NEXT to the Scala so the two stay in sync term by term. DuckDB
    * dialect; `docsRel` must expose (doc_id, text). */
  def bm25OracleSql(docsRel: String, idCol: String, textCol: String,
      terms: Seq[String]): String = {
    val tfDefs = sqlTfDefs(textCol, terms)
    val dfDefs = sqlDfDefs(terms)
    val scoreTerms = sqlScoreText(terms)
    s"""WITH d AS (
       |  SELECT $idCol,
       |    CAST(len(regexp_split_to_array(trim($textCol), '[\\t\\n\\x0B\\f\\r ]+')) AS BIGINT) AS dl,
       |    $tfDefs
       |  FROM $docsRel),
       |tot AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS sum_dl,
       |    $dfDefs
       |  FROM d),
       |sc AS (
       |  SELECT $idCol, round(
       |    $scoreTerms, 4) AS score
       |  FROM d, tot)""".stripMargin
  }

  /** Batched multi-query BM25 + token-budget context assembly — the RAG
    * pipeline's final step. ONE corpus scan scores EVERY query (the
    * per-doc term counts for the union of all query terms come from a
    * single TermCounts kernel pass; per-query scores are then pure
    * column arithmetic over the same row), where the naive loop costs
    * one scan per query — the difference between 1× and |queries|× the
    * 100 TB scan. Per query: rank the top-k docs, then keep the rank
    * prefix whose cumulative token count stays within `budgetTokens`
    * (the greedy context packing every retrieval-augmented prompt
    * builder runs).
    *
    * Plan: scan → kernel projection → 1-row totals broadcast → explode
    * of the |queries|-entry score array → ONE window shuffle on qid.
    * Scores round to 4 dp BEFORE ranking (ties to the smaller doc id) —
    * the same contract as [[bm25TopK]], so the oracle's replay is
    * order-exact. Output: (qid, rank, doc, n_tok, cum_tok). */
  def bm25ContextAssembly(docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(String, Seq[String])], k: Int,
      budgetTokens: Long): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "need at least one query, each with at least one term")
    val allTerms = queries.flatMap(_._2).distinct
    val j = scoredDocBase(docs, idCol, textCol, allTerms)
    def termScore(t: String): Column = termScoreCol(t)
    val qScores = array(queries.map { case (qid, ts) =>
      struct(lit(qid).as("qid"),
        round(ts.map(termScore).reduceLeft(_ + _), 4).as("score"))
    }: _*)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col(idCol))
    val cw = Window.partitionBy(col("qid")).orderBy(col("rank"))
      .rowsBetween(Window.unboundedPreceding, 0)
    j.select(col(idCol), col("dl"), explode(qScores).as("qs"))
      .select(col("qs.qid").as("qid"), col(idCol), col("dl"),
        col("qs.score").as("score"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .withColumn("cum_tok", sum(col("dl")).over(cw))
      .where(col("cum_tok") <= budgetTokens)
      .select(col("qid"), col("rank"), col(idCol),
        col("dl").as("n_tok"), col("cum_tok"))
  }

  /** Oracle replay of [[bm25ContextAssembly]], kept next to the Scala so
    * the score text stays in sync term by term (same left-fold order per
    * query, same round-before-rank contract). */
  def bm25ContextOracleSql(docsRel: String, idCol: String, textCol: String,
      queries: Seq[(String, Seq[String])], k: Int,
      budgetTokens: Long): String = {
    val allTerms = queries.flatMap(_._2).distinct
    val tfDefs = sqlTfDefs(textCol, allTerms)
    val dfDefs = sqlDfDefs(allTerms)
    def scoreText(ts: Seq[String]): String = sqlScoreText(ts)
    val scSelects = queries.map { case (qid, ts) =>
      s"""SELECT '$qid' AS qid, $idCol, dl, round(
         |    ${scoreText(ts)}, 4) AS score
         |  FROM d, tot""".stripMargin
    }.mkString("\n  UNION ALL ")
    s"""WITH d AS (
       |  SELECT $idCol,
       |    CAST(len(regexp_split_to_array(trim($textCol), '[\\t\\n\\x0B\\f\\r ]+')) AS BIGINT) AS dl,
       |    $tfDefs
       |  FROM $docsRel),
       |tot AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS sum_dl,
       |    $dfDefs
       |  FROM d),
       |sc AS (
       |  $scSelects),
       |r AS (
       |  SELECT qid, $idCol, dl, score,
       |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, $idCol) AS rank
       |  FROM sc),
       |c AS (
       |  SELECT qid, rank, $idCol, dl,
       |    CAST(sum(dl) OVER (PARTITION BY qid ORDER BY rank) AS BIGINT) AS cum_tok
       |  FROM r WHERE rank <= $k)
       |SELECT qid, CAST(rank AS BIGINT) AS rank, $idCol, dl AS n_tok, cum_tok
       |FROM c WHERE cum_tok <= $budgetTokens
       |ORDER BY qid, rank""".stripMargin
  }

  /** Inverted-index posting statistics: one row per distinct token with
    * document frequency, total term frequency, posting-range bounds and a
    * posting checksum (sum of distinct doc ids — pins WHICH docs hold the
    * token, not just how many). Two-stage aggregation: (token, doc)
    * partials first — map-side combinable, and the per-term reduce then
    * sees one row per posting instead of one per occurrence. */
  def invertedIndexStats(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // Exact-dup collapse first (Dedup.textClasses) — and unlike the
    // per-doc stat queries, NOTHING here expands back to doc level:
    // every output stat is CLASS-DECOMPOSABLE. A class (m copies, ids I,
    // per-copy term frequency tf_c) contributes m to df, tf_c·m to tf,
    // min/max(I) to the posting bounds and sum(I) to the checksum — so
    // the explode runs over distinct texts, the (tok, rep) partials are
    // distinct-text-scale, and the per-class id aggregates come from the
    // (digest, id) mapping alone. The doc-level posting table never
    // exists.
    val mapping = Dedup.textClasses(docs, idCol, textCol)
    val classAgg = mapping.groupBy(col("rep"))
      .agg(count(lit(1)).as("m"), min(col("doc")).as("min_id"),
        max(col("doc")).as("max_id"), sum(col("doc")).as("sum_id"))
    val posting = Dedup.classReps(docs, idCol, textCol)
      .select(col("rep"), explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok"), col("rep"))
      .agg(count(lit(1)).as("tf_c"))
    posting.join(classAgg, "rep")
      .groupBy(col("tok"))
      .agg(sum(col("m")).as("df"),
        sum(col("tf_c") * col("m")).as("tf"),
        min(col("min_id")).as("first_doc"),
        max(col("max_id")).as("last_doc"),
        sum(col("sum_id")).as("posting_sum"))
      .orderBy(col("tok"))
  }

  /** Pairwise term association over a bounded vocabulary: for each pair
    * (a < b) the number of documents containing both, and the lift
    * n_both * N / (n_a * n_b) — >1 means the terms attract, <1 they
    * repel. The contamination/topicality screen: a query-set term pair
    * with anomalous lift in the training corpus is a lead. */
  def cooccurrenceLift(docs: DataFrame, idCol: String, textCol: String,
      vocab: Seq[String]): DataFrame = {
    require(vocab.size >= 2 && vocab.size == vocab.distinct.size,
      s"cooccurrenceLift needs >= 2 distinct vocabulary terms; got $vocab")
    // ONE codegen'd tokenize pass per row (TermCounts kernel → per-doc
    // presence flags), then ONE partial-aggregable aggregate row: m
    // per-term document counts + C(m,2) conditional pair counts, unpivoted
    // to the (tok_a < tok_b) rows the lift join used to produce. Replaces
    // THREE tokenize scans (per-term counts, join left side, join right
    // side) and a doc-keyed shuffle self-join: at 100 TB the corpus is
    // read once and nothing moves but map-side partials. The m² aggregate
    // column count caps the vocabulary this form should serve (the fixed
    // diagnostic vocabularies it exists for are ≤ a few dozen terms).
    val sorted = vocab.sorted
    val tc = graft.functions.KernelExpressions.term_counts(col(textCol), sorted)
    val flags = docs.select(tc.as("tc")).select(
      sorted.indices.map(i => (element_at(col("tc"), i + 2) > 0L).as(s"__p$i")): _*)
    val pairIdx = for { i <- sorted.indices; j <- sorted.indices if i < j } yield (i, j)
    val aggCols =
      sorted.indices.map(i =>
        sum(when(col(s"__p$i"), 1L).otherwise(0L)).as(s"__n$i")) ++
      pairIdx.map { case (i, j) =>
        sum(when(col(s"__p$i") && col(s"__p$j"), 1L).otherwise(0L)).as(s"__b${i}_$j") }
    val row = flags.agg(count(lit(1)).as("total"), aggCols: _*)
    val pairStructs = pairIdx.map { case (i, j) =>
      struct(lit(sorted(i)).as("tok_a"), lit(sorted(j)).as("tok_b"),
        col(s"__b${i}_$j").as("n_both"), col(s"__n$i").as("n_a"),
        col(s"__n$j").as("n_b"), col("total").as("total"))
    }
    row.select(inline(array(pairStructs: _*)))
      .where(col("n_both") > 0)
      .select(col("tok_a"), col("tok_b"), col("n_both"), col("n_a"), col("n_b"),
        round((col("n_both").cast("double") * col("total")) /
          (col("n_a").cast("double") * col("n_b")), 4).as("lift"))
      .orderBy(col("tok_a"), col("tok_b"))
  }

  /** Reciprocal-rank fusion of two rankings of the same id set:
    * fused = 1/(c + rank_a) + 1/(c + rank_b), the standard
    * train-data-mining combiner for heterogeneous retrieval signals
    * (exact rational arithmetic — no score normalization needed, which is
    * what makes RRF robust AND cross-engine exact). Inputs must carry
    * (id, rank) with rank 1-based. */
  def reciprocalRankFusion(a: DataFrame, b: DataFrame, idCol: String,
      c: Int, k: Int): DataFrame = {
    val fused = a.select(col(idCol), col("rank").as("rank_a"))
      .join(b.select(col(idCol), col("rank").as("rank_b")), Seq(idCol), "outer")
      // an id missed by one ranking contributes only the other's term —
      // the standard RRF treatment of unranked items
      .select(col(idCol), col("rank_a"), col("rank_b"),
        round(coalesce(lit(1.0) / (lit(c) + col("rank_a")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("rank_b")), lit(0.0)), 6).as("fused"))
    fused.orderBy(col("fused").desc, col(idCol)).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("fused").desc, col(idCol))))
      .select(col("rank"), col(idCol), col("rank_a"), col("rank_b"), col("fused"))
  }
}

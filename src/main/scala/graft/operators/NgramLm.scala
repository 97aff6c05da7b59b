package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus n-gram language-model scoring — the perplexity-proxy quality
  * filter of a pretraining pipeline (KenLM-style filtering, re-expressed
  * with rational arithmetic): fit transition statistics on the corpus
  * itself, then score every document by how predictable its word
  * transitions are corpus-wide. Low predictability + high novelty flags
  * boilerplate-free but out-of-distribution text; the inverse flags
  * machine-generated repetition.
  *
  * Deliberately NO `log`/perplexity exponent anywhere: the score is a
  * ratio of integer sums, so every engine computes the identical double
  * (the same cross-engine-exactness policy as Retrieval's rational BM25
  * idf). A classic perplexity ranks documents the same way this does for
  * fixed length, and the integer form is what a DuckDB oracle can replay
  * bit-for-bit.
  *
  * Scale notes (100 TB): the occurrence table is linear in corpus tokens
  * and both count tables aggregate with map-side partials before their
  * shuffles (Zipf vocabularies combine heavily). The per-doc reduction
  * ships narrow integer rows keyed by doc. Nothing is collected; the
  * count tables join by key, never broadcast-by-assumption.
  */
object NgramLm {

  /** Per-document bigram predictability:
    * (doc, n_bigrams, support_sum, context_sum, hapax, predictability,
    * novelty) where for each adjacent-pair OCCURRENCE `w1 w2` in the doc,
    * `support` is the corpus-wide count of that exact transition, and
    * `context` the corpus-wide count of transitions leaving `w1`.
    * predictability = Σsupport / Σcontext — the context-count-weighted
    * mean of the ML transition probabilities P(w2|w1); novelty = fraction
    * of the doc's transitions that occur nowhere else in the corpus.
    * Docs whose text yields no transitions keep zero counts and NULL
    * scores (LEFT join), so the output is total over the input. */
  def bigramCorpusScore(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // EXACT-DUP COLLAPSE FIRST ([[Dedup.textClasses]]): every per-doc
    // output here is a pure function of (text, corpus counts), so the
    // explode, both count shuffles, and the probe join run over DISTINCT
    // texts only, with class multiplicity `m` weighting the corpus
    // counts (Σm over a bigram ≡ the occurrence count over all copies).
    // Per-class values expand back to every doc through the (doc → rep)
    // mapping — identical output, corpus-side cost divided by the
    // duplication factor (the 100× fixture is 100-way duplicated; a real
    // crawl is 20–50% — the win scales with exactly the corpora this
    // score is built to filter).
    //
    // NO persist on the occurrence table, deliberately: its producer is
    // one cheap codegen'd kernel over the (collapsed) scan — measured at
    // the 100× fixture pre-collapse, recomputing it per consumer (23.0 s)
    // BEAT materializing 50 M rows and reading them back (24.5–28 s).
    // Persist-before-branch pays only when the branched producer is
    // expensive relative to its width (see the dedup Transformers).
    val mapping = graft.operators.Dedup.textClasses(docs, idCol, textCol)
    val occ = graft.operators.Dedup.classReps(docs, idCol, textCol)
      .select(col("rep"), col("m"),
        explode(graft.functions.KernelExpressions.word_ngrams_all(
          col(textCol), 2)).as("bigram"))
      .withColumn("ctx", substring_index(col("bigram"), " ", 1))
    val c2 = occ.groupBy(col("bigram")).agg(sum(col("m")).as("c2"))
    val c1 = occ.groupBy(col("ctx")).agg(sum(col("m")).as("c1"))
    val perRep = occ
      .join(c2, "bigram")
      .join(c1, "ctx")
      .groupBy(col("rep"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("c2")).as("support_sum"),
        sum(col("c1")).as("context_sum"),
        sum(when(col("c2") === 1, 1L).otherwise(0L)).as("hapax"))
    mapping.select(col("doc"), col("rep")).join(perRep, Seq("rep"), "left")
      .select(col("doc"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("support_sum"), lit(0L)).as("support_sum"),
        coalesce(col("context_sum"), lit(0L)).as("context_sum"),
        coalesce(col("hapax"), lit(0L)).as("hapax"),
        round(col("support_sum").cast("double") / col("context_sum"), 6)
          .as("predictability"),
        round(col("hapax").cast("double") / col("n_bigrams"), 6).as("novelty"))
  }
}

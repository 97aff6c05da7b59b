package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Query-level tier-identity differential (ADVICE r16): EVERY registered
  * query that routes through the collapse-first family
  * (Dedup.textClasses / classReps / perClassValue, directly or via
  * NgramLm / Curation / Retrieval) must produce row-identical output
  * under the COLLAPSED tier (mode=always) and the IDENTITY tier
  * (mode=never), on a corpus where the tiers genuinely diverge in plan
  * (duplicate classes of size 3 — non-vacuous by construction).
  *
  * This closes the gap the operator-level CollapseDifferentialSpec
  * leaves: that spec pins 3 operator shapes, but the chunk queries,
  * decontamination, gram-coverage, and the dedup verifiers compose the
  * primitives INLINE — a tier-dependent bug in their composition (e.g.
  * an m-weighting dropped on one path) would pass the operator spec and
  * ship. Bench runs whatever tier the measured ratio picks, so without
  * this loop the tier Bench actually exercises at sf0.1 (identity,
  * ratio 1.0016) was DuckDB-gated only via a manual env sweep.
  */
class CollapseTierQuerySpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark

  /** Every registered query whose plan consumes the text-class family.
    * (Embedding/semantic queries collapse on vectors, not text classes,
    * and are pinned by SemDedupSpec; they also need the media/ivf staged
    * state — out of scope here.) */
  private val collapseConsumers = Seq(
    "q_vocab_oov", "q_chunk_overlap", "q_chunk_cdc", "q_distinct_ngrams",
    "q_dup_gram_coverage", "q_decontaminate", "q_text_bigram_lm",
    "q_bigram_mining", "q_bm25_topk", "q_rag_context_budget",
    "q_dedup_intra_doc",
    "q_dedup_exact", "q_dedup_minhash", "q_dedup_minhash_verified",
    "q_dedup_simhash", "q_dedup_simhash_pairs", "q_dedup_ngram_jaccard",
    "q_dedup_prefix_join", "q_dedup_containment", "q_dedup_incremental",
    "q_dedup_clusters", "q_dedup_canonical", "q_dedup_rate_by_source",
    "q_corpus_overlap", "q_text_fingerprint")

  /** sf0.001 tables, with documents replaced by a DUPLICATED corpus:
    * the first 200 docs appear 3× under shifted ids, so both chunk- and
    * gram-level statistics differ between a correct m-weighted collapse
    * and a broken one. */
  private lazy val fixtureDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-tier-fixture").toString
    val src = new java.io.File("/root/testdata/sf0.001")
    src.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
      if (f.getName != "documents.parquet")
        java.nio.file.Files.createSymbolicLink(
          java.nio.file.Paths.get(dir, f.getName), f.toPath)
    }
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val head = docs.where(col("doc_id") < 200)
    docs
      .unionByName(head.withColumn("doc_id", col("doc_id") + 100000L))
      .unionByName(head.withColumn("doc_id", col("doc_id") + 200000L))
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  private def rowsUnder(mode: String, name: String): Seq[String] = {
    spark.conf.set(graft.operators.Dedup.CollapseModeConf, mode)
    try graft.SparkEntry.queries(name)(spark, fixtureDir)
      .collect().map(_.toString).sorted.toSeq
    finally spark.conf.unset(graft.operators.Dedup.CollapseModeConf)
  }

  test("every collapse-consuming registered query is row-identical under " +
      "the collapsed and identity tiers on a duplicated corpus") {
    val missing = collapseConsumers.filterNot(graft.SparkEntry.queries.contains)
    assert(missing.isEmpty, s"unregistered query names: $missing")
    // non-vacuity: the corpus really is duplication-heavy, so mode=always
    // vs mode=never produce structurally different plans
    val mapping = graft.operators.Dedup.textClasses(
      graft.Tables.documents(spark, fixtureDir), "doc_id", "text")
    spark.conf.set(graft.operators.Dedup.CollapseModeConf, "always")
    try assert(mapping.where(col("m") > 1).count() > 0)
    finally spark.conf.unset(graft.operators.Dedup.CollapseModeConf)

    val diffs = collapseConsumers.flatMap { name =>
      val a = rowsUnder("always", name)
      val b = rowsUnder("never", name)
      if (a == b) None
      else Some(s"$name: collapsed ${a.size} rows vs identity ${b.size}; " +
        s"first diff: ${a.zipAll(b, "<absent>", "<absent>").find(p => p._1 != p._2)}")
    }
    assert(diffs.isEmpty, diffs.mkString("\n"))
  }
}

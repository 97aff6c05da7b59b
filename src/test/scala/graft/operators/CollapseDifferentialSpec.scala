package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Differential guard for the round-15 collapse-first rewrites: each
  * collapsed operator replayed against its UNCOLLAPSED doc-level form on
  * a generated corpus with adversarial duplication structure — skewed
  * class sizes (1..37 copies), empty/whitespace/null texts, and texts
  * differing only in whitespace (distinct classes under the exact
  * digest). The collapse contract is OUTPUT IDENTITY, not approximation:
  * multiplicity-weighted corpus aggregates must equal the
  * count-over-all-copies the uncollapsed forms compute, including
  * tie-breaks (the vocab top-K cut) and absence semantics (null-text
  * docs absent exactly where they were absent before).
  */
class CollapseDifferentialSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private val P = Gen.Parameters.default
  private val word: Gen[String] = Gen.frequency(
    6 -> Gen.oneOf("the", "a", "spark", "join", "window", "dup", "fox", "dog",
      "histogram", "gradient", "rio", "el"),
    2 -> Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString)),
    1 -> Gen.oneOf("café", "漢字", "a.b", "10.0.0.1"))
  private val text: Gen[String] = for {
    n <- Gen.frequency(1 -> Gen.const(0), 1 -> Gen.const(1), 8 -> Gen.chooseNum(2, 14))
    ws <- Gen.listOfN(n, word)
    lead <- Gen.oneOf("", "", " ", "\t")
    trail <- Gen.oneOf("", "", " ")
  } yield lead + ws.mkString(" ") + trail

  /** Corpus: ~60 distinct texts replicated with skewed class sizes and
    * contiguous ids, plus a whitespace-twin for some texts (same tokens,
    * different bytes → DIFFERENT exact class) and two null-text docs. */
  private lazy val corpus: DataFrame = {
    val texts = Gen.listOfN(60, text).pureApply(P, Seed(151L))
    val rows = scala.collection.mutable.ListBuffer.empty[(Option[Long], Option[String])]
    var id = 0L
    texts.zipWithIndex.foreach { case (t, i) =>
      val copies = 1 + (i * 7919) % 37
      (0 until copies).foreach { _ => rows += ((Some(id), Some(t))); id += 1 }
      if (i % 5 == 0) { rows += ((Some(id), Some(t + " "))); id += 1 }
    }
    rows += ((Some(id), None)); id += 1
    rows += ((Some(id), None)); id += 1
    rows.toSeq.toDF("doc_id", "text")
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** Pin a collapse tier for the duration of `body`. The collapsed-vs-
    * uncollapsed tests MUST run the collapsed tier explicitly: the
    * shared session may carry an ~all-distinct duplication ratio from
    * another suite's Tables.documents call, and under auto mode the
    * operator side would silently run the identity tier — making the
    * differential near-vacuous (identity ≈ the reference form). */
  private def withMode[A](mode: String)(body: => A): A = {
    spark.conf.set(Dedup.CollapseModeConf, mode)
    try body finally spark.conf.unset(Dedup.CollapseModeConf)
  }

  test("bigramCorpusScore == uncollapsed doc-level form on a duplicated corpus") {
    val collapsed = withMode("always")(NgramLm.bigramCorpusScore(corpus, "doc_id", "text"))
    // the pre-round-15 form, verbatim
    val occ = corpus.select(col("doc_id").as("doc"),
      explode(graft.functions.KernelExpressions.word_ngrams_all(col("text"), 2)).as("bigram"))
      .withColumn("ctx", substring_index(col("bigram"), " ", 1))
    val c2 = occ.groupBy(col("bigram")).agg(count(lit(1)).as("c2"))
    val c1 = occ.groupBy(col("ctx")).agg(count(lit(1)).as("c1"))
    val perDoc = occ.join(c2, "bigram").join(c1, "ctx")
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("c2")).as("support_sum"),
        sum(col("c1")).as("context_sum"),
        sum(when(col("c2") === 1, 1L).otherwise(0L)).as("hapax"))
    val reference = corpus.select(col("doc_id").as("doc")).join(perDoc, Seq("doc"), "left")
      .select(col("doc"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("support_sum"), lit(0L)).as("support_sum"),
        coalesce(col("context_sum"), lit(0L)).as("context_sum"),
        coalesce(col("hapax"), lit(0L)).as("hapax"),
        round(col("support_sum").cast("double") / col("context_sum"), 6).as("predictability"),
        round(col("hapax").cast("double") / col("n_bigrams"), 6).as("novelty"))
    assert(sortedRows(collapsed) == sortedRows(reference))
  }

  test("vocabOovRate == uncollapsed form, including the top-K tie-break") {
    // K chosen to land INSIDE the frequency distribution so the n-then-
    // token tie-break is exercised, not vacuous
    val collapsed = withMode("always")(Curation.vocabOovRate(corpus, "doc_id", "text", 7))
    val occ = corpus.select(col("doc_id").as("doc"),
      explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
    val vocab = occ.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(7)
      .select(col("tok"), lit(1).as("in_vocab"))
    val reference = occ.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("oov"))
      .select(col("doc"), col("n_tokens"), col("oov"),
        round(col("oov").cast("double") / col("n_tokens"), 6).as("oov_rate"))
    assert(sortedRows(collapsed) == sortedRows(reference))
  }

  test("identity tier == collapsed tier, row-for-row, on the duplicated corpus " +
      "(the r16 auto-bypass's correctness contract)") {
    // The bypass fires on measured ~all-distinct corpora, but its
    // correctness must hold on ANY corpus: the identity mapping
    // (rep = id, m = 1) is a valid text-class partition, so both tiers
    // must agree even here, where classes run up to 37 copies. Pin it
    // mechanically for one consumer of each shape: textClasses+classReps
    // corpus stats (bigram LM, inverted index) and perClassValue
    // (simhash table).
    for (build <- Seq[DataFrame => DataFrame](
        NgramLm.bigramCorpusScore(_, "doc_id", "text"),
        Retrieval.invertedIndexStats(_, "doc_id", "text"),
        Dedup.simhashTable(_, "doc_id", "text"))) {
      val collapsed = withMode("always")(sortedRows(build(corpus)))
      val identity = withMode("never")(sortedRows(build(corpus)))
      assert(collapsed == identity)
    }
  }

  test("invertedIndexStats == uncollapsed form: df/tf/bounds/checksum") {
    val collapsed = withMode("always")(Retrieval.invertedIndexStats(corpus, "doc_id", "text"))
    val posting = corpus
      .select(col("doc_id").as("doc"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy(col("tok"), col("doc")).agg(count(lit(1)).as("tf_d"))
    val reference = posting.groupBy(col("tok"))
      .agg(count(lit(1)).as("df"), sum(col("tf_d")).as("tf"),
        min(col("doc")).as("first_doc"), max(col("doc")).as("last_doc"),
        sum(col("doc")).as("posting_sum"))
      .orderBy(col("tok"))
    assert(sortedRows(collapsed) == sortedRows(reference))
  }
}

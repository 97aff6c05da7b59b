package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Dedup.minhashVerifiedPairs]] (verify class pairs BEFORE member
  * expansion) row-identical to the composed reference form it replaced:
  * [[Dedup.minhashNearDups]] candidates rescored per PAIR with the exact
  * sorted-gram kernel. The composed form is the semantics oracle — it
  * scores every member-level candidate directly, with no collapse in the
  * verification at all — so equality here covers the fused operator's
  * whole rewrite surface: the within-class `lit(1.0)` fast path, the
  * survivors-only expansion, and the single-aggregate gram derivation. */
class MinhashVerifiedSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  /** The composed r17-era pipeline, member-level rescore, no collapse. */
  private def composedReference(docs: DataFrame, minEst: Double,
      minJ: Double): Set[(Long, Long, Double)] = {
    val candidates = Dedup.minhashNearDups(docs, "doc_id", "text", minEst)
    val grams = docs.select(col("doc_id"),
      Dedup.sortedGramHashes(col("text"), 3).as("grams"))
    candidates
      .join(grams.select(col("doc_id").as("a"), col("grams").as("ga")), "a")
      .join(grams.select(col("doc_id").as("b"), col("grams").as("gb")), "b")
      .select(col("a"), col("b"),
        round(graft.functions.KernelExpressions.jaccard_sorted(
          col("ga"), col("gb")), 4).as("jaccard"))
      .where(col("jaccard") >= minJ)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  private def fused(docs: DataFrame, minEst: Double, minJ: Double) =
    Dedup.minhashVerifiedPairs(docs, "doc_id", "text", minEst, minJ)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  /** Constructed corpus exercising every class shape: exact-dup groups
    * (sizes 2 and 3), a near-dup cross pair, an unrelated doc, a
    * whitespace-only pair (identical text, gram = hash of "" — must emit
    * 1.0), and a NULL text (no signature, no pairs). */
  private def corpus = Seq(
    (0L, Some("the quick brown fox jumps over the lazy dog near the river bank today")),
    (1L, Some("the quick brown fox jumps over the lazy dog near the river bank today")),
    (2L, Some("the quick brown fox jumps over the lazy dog near the river bank tonight")),
    (3L, Some("completely different words about spark histograms and gradient boosting trees")),
    (4L, Some("the quick brown fox jumps over the lazy dog near the river bank today")),
    (5L, Some("   ")),
    (6L, Some("   ")),
    (7L, Option.empty[String])
  ).toDF("doc_id", "text")

  test("fused == composed on constructed dup classes, both collapse tiers") {
    for (mode <- Seq("always", "never")) {
      spark.conf.set(Dedup.CollapseModeConf, mode)
      try {
        val want = composedReference(corpus, 0.3, 0.5)
        val got = fused(corpus, 0.3, 0.5)
        assert(got == want, s"tier=$mode: fused=$got composed=$want")
        // the corpus is built so the interesting shapes actually occur
        assert(want.contains((0L, 1L, 1.0)) && want.contains((1L, 4L, 1.0)),
          "exact-dup within-class pairs must be present at 1.0")
        assert(want.contains((5L, 6L, 1.0)),
          "identical whitespace-only texts are duplicates at exactly 1.0")
        assert(!want.exists(p => p._1 == 7L || p._2 == 7L),
          "NULL text must produce no pairs")
        assert(want.exists(p => p._3 < 1.0 && p._3 >= 0.5),
          "a genuine near-dup (verified below 1.0) must survive")
      } finally spark.conf.unset(Dedup.CollapseModeConf)
    }
  }

  test("fused == composed on the sf0.001 fixture (organic near-dups)") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    for (mode <- Seq("always", "never")) {
      spark.conf.set(Dedup.CollapseModeConf, mode)
      try {
        val want = composedReference(real, 0.35, 0.5)
        val got = fused(real, 0.35, 0.5)
        assert(got == want,
          s"tier=$mode: sym-diff=${(got diff want) ++ (want diff got)}")
        assert(want.nonEmpty, "fixture must contain verified near-dups")
      } finally spark.conf.unset(Dedup.CollapseModeConf)
    }
  }

  test("verification kills candidates below minJaccard before expansion") {
    // near-dup pair (est above the candidate screen, exact jaccard below
    // the verify bar) must be dropped; raising minJ to 0.95 must keep
    // only the exact-dup classes
    spark.conf.set(Dedup.CollapseModeConf, "always")
    try {
      val got = fused(corpus, 0.3, 0.95)
      assert(got == Set((0L, 1L, 1.0), (1L, 4L, 1.0), (0L, 4L, 1.0), (5L, 6L, 1.0)),
        s"only identical-text pairs survive minJ=0.95: $got")
    } finally spark.conf.unset(Dedup.CollapseModeConf)
  }
}

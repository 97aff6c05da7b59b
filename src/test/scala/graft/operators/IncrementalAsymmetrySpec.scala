package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the STRUCTURAL asymmetry of the incremental-dedup prefix screen
  * (VERDICT r17 #5). The operator's OUTPUT cannot witness it: corpus-
  * internal near-dup pairs never reach the output whether or not the
  * corpus side re-enters the prefix join, and at the 10%-batch bench
  * fixture the asymmetry is only a 2.27→2.00 s mover — a regression
  * re-admitting corpus×corpus candidate work would be invisible to both
  * the correctness gate and the bench gate. This spec observes the
  * CANDIDATE stage directly ([[Dedup.incrementalCandidatePairs]]):
  * a corpus that is one big mutual near-dup clique with a batch sharing
  * NO grams must generate ZERO candidates — any corpus-side probe row
  * would immediately pair corpus docs with each other and fail it. */
class IncrementalAsymmetrySpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def classRows(rows: Seq[(Long, Boolean, String)]) =
    rows.toDF("doc", "isB", "__t")
      .select(col("doc"), col("isB"),
        Dedup.sortedGramHashes(col("__t"), 3).as("grams"))
      .where(size(col("grams")) > 0)

  // 12 corpus docs that are ALL mutual near-dups of each other (shared
  // long template, one varying token) — a symmetric screen would emit
  // C(12,2) = 66 corpus×corpus candidates
  private val template = "alpha beta gamma delta epsilon zeta eta theta " +
    "iota kappa lambda mu nu xi omicron pi"
  private val corpusRows = (0L until 12L).map(i =>
    (i, false, s"$template variant$i"))

  test("an unrelated batch generates ZERO candidates against a mutual " +
      "near-dup corpus clique (corpus side never probes)") {
    val r = classRows(corpusRows :+
      ((100L, true, "totally disjoint vocabulary about spark histograms")))
    val cands = Dedup.incrementalCandidatePairs(r, 0.5).collect()
    assert(cands.isEmpty,
      s"corpus×corpus candidates leaked through the screen: " +
        s"${cands.take(5).mkString(", ")} (${cands.length} total)")
  }

  test("a batch doc near-duplicating ONE corpus doc generates candidates " +
      "for that relation only — volume tracks the batch, not the corpus") {
    val r = classRows(corpusRows :+
      ((100L, true, s"$template variant0 extra")))
    val cands = Dedup.incrementalCandidatePairs(r, 0.5)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(cands.nonEmpty, "the batch near-dup must surface")
    assert(cands.forall { case (a, b) => a == 100L || b == 100L },
      s"every candidate must touch the batch class: $cands")
  }

  test("the screen keeps batch-internal pairs (two batch docs " +
      "near-duplicating each other surface without any corpus partner)") {
    val r = classRows(Seq(
      (0L, false, "nothing in common with the batch at all here"),
      (100L, true, s"$template batchone"),
      (101L, true, s"$template batchtwo")))
    val cands = Dedup.incrementalCandidatePairs(r, 0.5)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(cands == Set((100L, 101L)), s"got $cands")
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Boundary pins for the r17 ppjoin candidate bounds in
  * [[Dedup.prefixFilteredJaccardJoin]] / [[Dedup.containmentJoin]].
  *
  * The position bound (1 + min(|x|−px, |y|−py) ≥ ⌈t/(1+t)·(|x|+|y|)⌉),
  * the length bounds, AND the prefix length itself involve `ceil` over
  * IEEE products; some land a half-ulp HIGH of the exact integer (e.g.
  * 100 × 0.07 = 7.000000000000001 — while 10 × 0.8 happens to be exact)
  * and ceil one too far, silently over-pruning EXACTLY-at-threshold
  * pairs unless the bound carries the documented 1e-9 slack. These tests plant pairs whose
  * Jaccard / containment is exactly the threshold (the worst case for
  * the rounding) at several sizes and require them found; sub-threshold
  * variants must stay absent; and the whole pair set must equal the
  * independently-shaped [[Dedup.exactJaccardEdges]] (count-aggregation,
  * no candidate/verify split — complete by construction). Both collapse
  * tiers run.
  *
  * Doc construction: tokens within a doc are DISTINCT words, so the
  * word-3-gram count is exactly (tokens − 2) and replacing only the
  * LAST token changes exactly one gram — overlap and union are exact by
  * construction, e.g. 11 tokens (9 grams) with the last token swapped
  * gives J = 8/10 = 0.8 exactly.
  */
class JaccardBoundarySpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def withMode[A](mode: String)(body: => A): A = {
    spark.conf.set(Dedup.CollapseModeConf, mode)
    try body finally spark.conf.unset(Dedup.CollapseModeConf)
  }

  /** doc of `n` distinct tokens from a group-private namespace. */
  private def toks(group: Int, n: Int): Vector[String] =
    (0 until n).map(i => s"g${group}w$i").toVector

  test("pairs at EXACTLY the Jaccard threshold survive the position/length " +
      "bounds at every ceil-boundary size (t = 0.8)") {
    // for gram counts k ∈ {5, 10, 15, 20} (tokens = k + 2): base doc and
    // a last-token swap → J = (k−1)/(k+1); pick k so J crosses 0.8:
    //   k=9  → 8/10  = 0.8 exactly  (boundary: MUST be found)
    //   k=19 → 18/20 = 0.9          (found)
    //   k=5  → 4/6   = 0.667        (absent)
    // plus an exact duplicate of each base (J = 1.0, collapse fodder).
    val rows = scala.collection.mutable.ListBuffer.empty[(Long, String)]
    var id = 0L
    val expectFound = scala.collection.mutable.Set.empty[(Long, Long)]
    val expectAbsent = scala.collection.mutable.Set.empty[(Long, Long)]
    for ((k, group) <- Seq(5, 9, 19).zipWithIndex) {
      val base = toks(group, k + 2)
      val twin = base.init :+ s"g${group}SWAP"
      val baseId = id; rows += ((id, base.mkString(" "))); id += 1
      val twinId = id; rows += ((id, twin.mkString(" "))); id += 1
      val dupId = id; rows += ((id, base.mkString(" "))); id += 1
      val j = (k - 1).toDouble / (k + 1)
      if (j >= 0.8) expectFound += ((baseId, twinId))
      else expectAbsent += ((baseId, twinId))
      expectFound += ((baseId, dupId)) // exact duplicate, J = 1.0
    }
    val docs = rows.toSeq.toDF("doc_id", "text")
    for (mode <- Seq("always", "never")) {
      val got = withMode(mode) {
        Dedup.prefixFilteredJaccardJoin(docs, "doc_id", "text", 3, 0.8)
          .select(col("a"), col("b")).as[(Long, Long)].collect().toSet
      }
      for (p <- expectFound)
        assert(got.contains(p), s"mode=$mode: boundary pair $p missing (over-pruned)")
      for (p <- expectAbsent)
        assert(!got.contains(p), s"mode=$mode: sub-threshold pair $p present")
      // full-set identity vs the independently-shaped exact method
      val reference = withMode(mode) {
        Dedup.exactJaccardEdges(docs, "doc_id", "text", 3, 0.8)
          .select(col("u"), col("v")).as[(Long, Long)].collect().toSet
      }
      assert(got == reference, s"mode=$mode: prefix-filtered pair set != exact")
    }
  }

  test("containment pairs at EXACTLY the threshold survive the length bound " +
      "(t = 0.8)") {
    // A = 12 distinct tokens (10 grams); B = first 10 tokens of A + 2 new
    // → B's grams: A's grams 1..8 + 2 new → containment(A→B) = 8/10 = 0.8
    // exactly (MUST be found); a 7/10 variant must be absent.
    val a = toks(9, 12)
    val b = a.take(10) ++ Seq("g9X", "g9Y")
    val c = a.take(9) ++ Seq("g9P", "g9Q", "g9R") // grams 1..7 + 3 new → 7/10
    val docs = Seq(
      (0L, a.mkString(" ")), (1L, b.mkString(" ")), (2L, c.mkString(" ")))
      .toDF("doc_id", "text")
    for (mode <- Seq("always", "never")) {
      val got = withMode(mode) {
        Dedup.containmentJoin(docs, "doc_id", "text", 3, 0.8)
          .select(col("a"), col("b")).as[(Long, Long)].collect().toSet
      }
      assert(got.contains((0L, 1L)),
        s"mode=$mode: containment(A→B) = 0.8 exactly must be found")
      assert(!got.contains((0L, 2L)),
        s"mode=$mode: containment(A→C) = 0.7 must be absent")
    }
  }

  test("IEEE-inflating threshold (t = 0.07, 100 grams): the prefix LENGTH " +
      "keeps its last gram, so the subset-at-threshold pair is found") {
    // 100 × 0.07 = 7.000000000000001 in IEEE: without slack inside
    // ceil, prefixLen = 100 − 8 + 1 = 93 and x's prefix misses ALL its
    // common grams — which sort LAST in rare-first order here because
    // x's 93 unique grams have df 1 while the 7 shared grams have df 2.
    // J = 7 / (100 + 7 − 7) = 0.07 exactly ≥ t: the pair MUST be found.
    val x = toks(20, 102)               // 100 grams
    val y = x.take(9)                   // 7 grams, all ⊂ x
    val docs = Seq((0L, x.mkString(" ")), (1L, y.mkString(" ")))
      .toDF("doc_id", "text")
    for (mode <- Seq("always", "never")) {
      val got = withMode(mode) {
        Dedup.prefixFilteredJaccardJoin(docs, "doc_id", "text", 3, 0.07)
          .select(col("a"), col("b")).as[(Long, Long)].collect().toSet
      }
      assert(got.contains((0L, 1L)),
        s"mode=$mode: subset pair at J = 0.07 exactly was over-pruned " +
          "(prefix length lost its last gram to IEEE ceil inflation)")
    }
  }

  test("randomized corpora: prefix-filtered pair set == exact count-aggregation " +
      "set at t ∈ {0.5, 0.8}, both tiers (recall 1.0 under the new bounds)") {
    val rnd = new scala.util.Random(1717L)
    val vocab = (0 until 40).map(i => s"v$i")
    val rows = scala.collection.mutable.ListBuffer.empty[(Long, String)]
    var id = 0L
    // 60 random docs of 7-24 distinct tokens, plus perturbed copies and
    // exact duplicates with skewed multiplicities
    (0 until 60).foreach { _ =>
      val n = 7 + rnd.nextInt(18)
      val doc = rnd.shuffle(vocab).take(n).toVector
      rows += ((id, doc.mkString(" "))); id += 1
      if (rnd.nextInt(3) == 0) { // exact dup(s)
        (0 to rnd.nextInt(3)).foreach { _ => rows += ((id, doc.mkString(" "))); id += 1 }
      }
      if (rnd.nextInt(2) == 0) { // near dup: swap one random token
        val pos = rnd.nextInt(doc.size)
        val nd = doc.updated(pos, s"u$id")
        rows += ((id, nd.mkString(" "))); id += 1
      }
    }
    val docs = rows.toSeq.toDF("doc_id", "text")
    for (t <- Seq(0.5, 0.8); mode <- Seq("always", "never")) {
      val (got, reference) = withMode(mode) {
        (Dedup.prefixFilteredJaccardJoin(docs, "doc_id", "text", 3, t)
          .select(col("a"), col("b")).as[(Long, Long)].collect().toSet,
          Dedup.exactJaccardEdges(docs, "doc_id", "text", 3, t)
            .select(col("u"), col("v")).as[(Long, Long)].collect().toSet)
      }
      val missing = reference -- got
      val extra = got -- reference
      assert(missing.isEmpty && extra.isEmpty,
        s"t=$t mode=$mode: missing=${missing.take(5)} extra=${extra.take(5)}")
    }
  }
}

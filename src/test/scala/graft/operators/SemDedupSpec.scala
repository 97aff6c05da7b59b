package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed semantics of [[Similarity.semanticDedupPinned]] on 2-d
  * vectors against axis-aligned unit centroids, where every cell
  * assignment, cosine, and centrality value is checkable by hand. */
class SemDedupSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private val axes = Array(Array(1.0, 0.0), Array(0.0, 1.0))

  private def run(rows: Seq[(Long, Seq[Double])], minCos: Double) =
    Similarity.semanticDedupPinned(
        rows.toDF("vec_id", "embedding"), "vec_id", "embedding", axes, minCos)
      .orderBy("vid").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(3), r.getBoolean(4)))

  test("drops the more-central member of every in-cell pair above the threshold") {
    // cell 0: a=(10,1) ccos .99504, b=(8,1.2) ccos .98894, d=(9,-1) ccos .99388
    //   pairwise cosines: (a,b)=.9988 (a,d)=.9780 (b,d)=.9665 — all ≥ .95
    //   a has less-central nbr b → removed; d has less-central nbr b →
    //   removed; b's nbrs are BOTH more central → b survives for the cell
    // cell 1: c=(0.5,5) alone → kept, no dups
    val got = run(Seq(
      1L -> Seq(10.0, 1.0), 2L -> Seq(8.0, 1.2),
      3L -> Seq(0.5, 5.0), 4L -> Seq(9.0, -1.0)), 0.95)
    assert(got === Seq(
      (1L, 0, 2L, false), (2L, 0, 2L, true),
      (3L, 1, 0L, true), (4L, 0, 2L, false)))
  }

  test("fp-equal centrality ties break toward keeping the smaller id") {
    val got = run(Seq(10L -> Seq(3.0, 4.0), 11L -> Seq(3.0, 4.0)), 0.95)
    assert(got === Seq((10L, 1, 1L, true), (11L, 1, 1L, false)))
  }

  test("same-cell pairs below the threshold are not duplicates") {
    // (10,0) and (7,6) both land in cell 0 but cos = .7593 < .95
    val got = run(Seq(1L -> Seq(10.0, 0.0), 2L -> Seq(7.0, 6.0)), 0.95)
    assert(got === Seq((1L, 0, 0L, true), (2L, 0, 0L, true)))
  }

  test("cross-cell near-duplicates are by design not compared") {
    // (5,4.9) cell 0 and (4.9,5) cell 1: cos ≈ .9998 but different cells
    val got = run(Seq(1L -> Seq(5.0, 4.9), 2L -> Seq(4.9, 5.0)), 0.95)
    assert(got === Seq((1L, 0, 0L, true), (2L, 1, 0L, true)))
  }

  test("incremental: batch docs dedup against corpus and earlier batch ids") {
    val corpus = Seq(1L -> Seq(10.0, 1.0), 2L -> Seq(0.5, 5.0))
    val batch = Seq(
      100L -> Seq(10.0, 1.01), // ≈ corpus 1, same cell → dup_of_corpus 1
      101L -> Seq(10.0, 1.02), // ≈ corpus 1 AND batch 100 → both verdicts
      102L -> Seq(5.0, -4.0))  // cell 0 but far from everything → novel
    val got = Similarity.semanticDedupIncremental(
        corpus.toDF("vec_id", "embedding"), batch.toDF("vec_id", "embedding"),
        "vec_id", "embedding", axes, 0.99)
      .orderBy("vid").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
    assert(got === Seq(
      (100L, 1L, -1L, true), (101L, 1L, 100L, true), (102L, -1L, -1L, false)))
  }

  /** The serving path collapses bit-identical vectors before the in-cell
    * pair join; the retained member-level form is its parity oracle. Any
    * divergence — counts, tie-breaks, zero vectors, a threshold above the
    * fp self-dot — is a correctness bug, not a tolerance. */
  private def assertParity(rows: Seq[(Long, Seq[Double])], minCos: Double): Unit = {
    val df = rows.toDF("vec_id", "embedding")
    // string-render rows so a NaN centrality (zero vector) compares
    // equal to itself — scala == on unboxed NaN is false by IEEE rules
    val fast = Similarity.semanticDedupPinned(
        df, "vec_id", "embedding", axes, minCos)
      .orderBy("vid").collect().map(_.toString).toSeq
    val direct = Similarity.semanticDedupPinnedDirect(
        df, "vec_id", "embedding", axes, minCos)
      .orderBy("vid").collect().map(_.toString).toSeq
    assert(fast === direct)
  }

  test("collapse-first output is bit-equal to the member-level join") {
    // exact-duplicate groups of size 3 and 2, a cross-content near-dup,
    // a singleton, and an isolated far vector — in both cells
    assertParity(Seq(
      1L -> Seq(10.0, 1.0), 2L -> Seq(10.0, 1.0), 7L -> Seq(10.0, 1.0),
      3L -> Seq(8.0, 1.2), 9L -> Seq(8.0, 1.2),
      4L -> Seq(9.0, -1.0),
      5L -> Seq(0.5, 5.0), 6L -> Seq(-10.0, 2.0)), 0.95)
  }

  test("collapse-first parity: zero vectors never self-duplicate") {
    // unit_vector(0) = 0, self-dot 0 < minCos: three identical zero
    // vectors are NOT duplicates of each other in the member-level join,
    // and the collapsed form must reproduce that via its self-dot gate
    assertParity(Seq(
      1L -> Seq(0.0, 0.0), 2L -> Seq(0.0, 0.0), 3L -> Seq(0.0, 0.0),
      4L -> Seq(10.0, 1.0), 5L -> Seq(10.0, 1.0)), 0.95)
  }

  test("collapse-first parity: threshold above the fp self-dot") {
    // minCos = 1.0 can sit above dot(u, u) when the unit-normalized
    // self-dot rounds below 1 — identical members then do NOT pair, and
    // the gate must reproduce the member-level verdict exactly
    assertParity(Seq(
      1L -> Seq(10.0, 1.0), 2L -> Seq(10.0, 1.0),
      3L -> Seq(3.0, 4.0), 4L -> Seq(3.0, 4.0)), 1.0)
  }

  test("online tier finds the same planted duplicates as a fitted quantizer") {
    // two tight groups of near-identical vectors far apart; any sane
    // 2-means fit separates them, and within each group the keep rule
    // leaves exactly one survivor
    val rows = (0L until 6L).map { i =>
      val base = if (i < 3) Seq(10.0, 0.2 * i) else Seq(-10.0, 0.2 * i)
      (i, base)
    }
    val got = Similarity.semanticDedup(
        rows.toDF("vec_id", "embedding"), "vec_id", "embedding",
        nCells = 2, minCos = 0.99)
      .collect().map(r => (r.getLong(0), r.getBoolean(4))).sortBy(_._1)
    assert(got.count(_._2) === 2, s"one survivor per group: ${got.toSeq}")
  }
}

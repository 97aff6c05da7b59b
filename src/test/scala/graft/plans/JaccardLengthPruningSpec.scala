package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.KernelExpressions

/** The optimizer rule must (a) inject exactly two size bounds next to a
  * jaccard threshold, (b) stay a pure optimization — same rows as the
  * un-ruled plan, (c) be idempotent under the optimizer's fixpoint. */
class JaccardLengthPruningSpec extends AnyFunSuite {
  lazy val spark = {
    val s = graft.SparkTestSession.spark
    JaccardLengthPruning.install(s)
    s
  }
  import spark.implicits._

  // sorted distinct long arrays with known Jaccard relations; parquet-backed
  // so ConvertToLocalRelation can't fold the Filter away at optimization time
  private lazy val pairs = {
    val dir = java.nio.file.Files.createTempDirectory("jlp").toString
    Seq(
      (1L, Seq(1L, 2L, 3L, 4L), Seq(1L, 2L, 3L, 4L)),        // J = 1.0
      (2L, Seq(1L, 2L, 3L, 4L), Seq(1L, 2L, 3L, 5L)),        // J = 0.6
      (3L, Seq(1L, 2L), Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L)),// J = 0.25, len-skewed
      (4L, Seq(1L), (1L to 100L).toSeq)                      // J = 0.01, very skewed
    ).toDF("id", "a", "b").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private def filtered(t: Double) =
    pairs.where(KernelExpressions.jaccard_sorted(col("a"), col("b")) >= t)

  /** Bounds were injected once: each jaccard argument is size()-read at
    * least once (a bound needs both), and the total stays within one
    * injection's worth (> 4 would mean the fixpoint re-injected). The
    * assertion is deliberately NOT an exact textual count — Catalyst is
    * free to CSE/fold/re-spell the Size calls without that being a
    * semantic regression. */
  private def assertBoundsInjectedOnce(plan: String): Unit = {
    val sized = "size\\((\\w+)".r.findAllMatchIn(plan).map(_.group(1)).toSet
    assert(sized.size >= 2,
      s"expected size() reads of both jaccard arguments, saw $sized in:\n$plan")
    val nSize = "size\\(".r.findAllIn(plan).length
    assert(nSize <= 4, s"fixpoint re-injection suspected: $nSize size() reads in:\n$plan")
  }

  test("injects the two size bounds (and only once under fixpoint)") {
    assertBoundsInjectedOnce(filtered(0.5).queryExecution.optimizedPlan.toString)
  }

  test("same rows as the threshold alone, at several thresholds") {
    for (t <- Seq(0.01, 0.25, 0.5, 0.9)) {
      val got = filtered(t).select("id").as[Long].collect().sorted.toSeq
      val exp = pairs.collect().map { r =>
        val a = r.getSeq[Long](1).toSet
        val b = r.getSeq[Long](2).toSet
        (r.getLong(0), a.intersect(b).size.toDouble / a.union(b).size)
      }.collect { case (id, j) if j >= t => id }.sorted.toSeq
      assert(got == exp, s"threshold $t")
    }
  }

  test("length-skewed pairs are prunable by the bounds alone") {
    // id=4: sizes 1 vs 100 → min/max = 0.01 < 0.5 → bound must reject it
    // without the kernel; semantic check: it is absent from the output.
    assert(!filtered(0.5).select("id").as[Long].collect().contains(4L))
  }

  test("no injection without a jaccard threshold conjunct") {
    val plan = pairs.where(col("id") > 1L).queryExecution.optimizedPlan.toString
    assert(!plan.contains("size("), plan)
  }

  // the verification filters in the prefix/minhash paths round the score
  // before comparing — the rule must still fire, at the relaxed threshold
  private def roundFiltered(t: Double) =
    pairs.where(round(KernelExpressions.jaccard_sorted(col("a"), col("b")), 4) >= t)

  test("rounded threshold: bounds injected and rows preserved") {
    val plan = roundFiltered(0.5).queryExecution.optimizedPlan.toString
    assertBoundsInjectedOnce(plan)
    val got = roundFiltered(0.5).select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L), s"rounded-filter rows changed: $got")
    // the skewed pair must still be pruned semantically
    assert(!got.contains(4L))
  }

  test("join-condition injection: bounds land inside the join, rows preserved") {
    // the optimizer pushes a post-join threshold filter INTO the join
    // condition before the extra batch runs — the rule must fire there
    val left = pairs.select(col("id").as("lid"), col("a"))
    val right = pairs.select(col("id").as("rid"), col("b"))
    val joined = left.join(right,
      round(KernelExpressions.jaccard_sorted(col("a"), col("b")), 4) >= 0.5 &&
        col("lid") <= col("rid"))
    val plan = joined.queryExecution.optimizedPlan.toString
    assertBoundsInjectedOnce(plan)
    // semantics: same pairs as the un-bounded cross check
    val got = joined.select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val rows = pairs.collect().map(r =>
      (r.getLong(0), r.getSeq[Long](1).toSet, r.getSeq[Long](2).toSet))
    val exp = (for {
      (li, a, _) <- rows; (ri, _, b) <- rows
      if li <= ri
      j = a.intersect(b).size.toDouble / a.union(b).size
      if BigDecimal(j).setScale(4, BigDecimal.RoundingMode.HALF_UP) >= 0.5
    } yield (li, ri)).sorted.toSeq
    assert(got == exp)
  }

  test("rounded threshold at the boundary: round-half-up rows survive the relaxed bounds") {
    // id=3: J = 0.25 exactly; round(J,4) >= 0.25 must keep it — the
    // relaxed bound (0.25 - 1e-4) cannot prune a qualifying row
    val got = roundFiltered(0.25).select("id").as[Long].collect().sorted.toSeq
    assert(got.contains(3L), s"boundary row lost: $got")
  }
}

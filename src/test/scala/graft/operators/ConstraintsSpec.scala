package graft.operators

import org.apache.spark.sql.functions.lit
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class ConstraintsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dirty = Seq(
    (Some(1L), 10.0, "ok"),
    (Some(2L), -5.0, "ok"),    // range violation
    (None, 3.0, "ok"),         // null key
    (Some(4L), 7.0, "BAD"),    // set violation
    (Some(4L), 8.0, "ok")      // duplicate key
  ).toDF("k", "price", "status")

  test("conditional-count checks find each planted violation exactly once") {
    val out = Constraints.evaluate(dirty, Seq(
        Constraints.notNull("k"),
        Constraints.atLeast("price", 0.0),
        Constraints.isIn("status", Seq("ok"))),
        uniqueKey = Some("k"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out("not_null(k)") === ((1L, false)))
    assert(out("min(price)>=0.0") === ((1L, false)))
    assert(out("in_set(status)") === ((1L, false)))
    assert(out("unique(k)") === ((1L, false))) // one duplicated key value
  }

  test("clean data passes every check") {
    val clean = Seq((1L, 1.0, "ok"), (2L, 2.0, "ok")).toDF("k", "price", "status")
    val out = Constraints.evaluate(clean, Seq(
        Constraints.notNull("k"), Constraints.atLeast("price", 0.0)),
        uniqueKey = Some("k")).collect()
    assert(out.length === 3)
    assert(out.forall(_.getAs[Boolean]("passed")))
    assert(out.forall(_.getAs[Long]("violations") === 0L))
  }

  test("referential check counts orphans (including null fks)") {
    val child = Seq(Some(1L), Some(2L), Some(99L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val out = Constraints.referential(child, "fk", parent, "pk").collect().head
    assert(out.getString(0) === "ref(fk->pk)")
    assert(out.getLong(1) === 2L) // 99 and NULL
    assert(!out.getBoolean(2))
  }

  test("histogramDrift: identical distributions give zero chi-square everywhere") {
    val a = (1 to 1000).map(i => (i % 10) * 10.0 + 1).toDF("v")
    val out = Constraints.histogramDrift(a, a, "v", binWidth = 10.0, nBins = 10)
      .collect()
    assert(out.length === 10)
    out.foreach(r => assert(r.getAs[Double]("chi2") === 0.0))
  }

  test("histogramDrift: empty or all-NULL side fails loudly, not NaN rows") {
    val data = (1 to 100).map(i => (i % 10) * 10.0 + 1).toDF("v")
    val empty = data.where(lit(false))
    val allNull = (1 to 5).map(_ => Option.empty[Double]).toDF("v")
    for (bad <- Seq(empty, allNull)) {
      val e1 = intercept[IllegalArgumentException] {
        Constraints.histogramDrift(bad, data, "v", binWidth = 10.0, nBins = 10)
      }
      assert(e1.getMessage.contains("non-NULL"))
      val e2 = intercept[IllegalArgumentException] {
        Constraints.histogramDrift(data, bad, "v", binWidth = 10.0, nBins = 10)
      }
      assert(e2.getMessage.contains("non-NULL"))
    }
  }

  test("histogramDrift: a shifted bin dominates the chi-square") {
    val ref = (1 to 1000).map(i => (i % 10) * 10.0 + 1).toDF("v")
    // current: bin 0 mass moved to bin 9
    val cur = (1 to 1000).map { i =>
      val b = i % 10; (if (b == 0) 9 else b) * 10.0 + 1
    }.toDF("v")
    val out = Constraints.histogramDrift(ref, cur, "v", binWidth = 10.0, nBins = 10)
      .collect().map(r => (r.getAs[Long]("bin"), r.getAs[Double]("chi2"))).toMap
    val quiet = (1L to 8L).map(out)
    assert(out(0L) > 10 * quiet.max, s"bin 0 should dominate: $out")
    assert(out(9L) > 10 * quiet.max, s"bin 9 should dominate: $out")
    quiet.foreach(c => assert(c === 0.0)) // untouched bins match exactly
  }

  test("ksStatistic: disjoint supports hit D = 1, shared support is exact by hand") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val disjoint = Seq((1.0, true), (2.0, true), (3.0, false), (4.0, false))
      .toDF("v", "a")
    val r1 = Constraints.ksStatistic(disjoint, col("v"), col("a")).collect().head
    assert((r1.getLong(0), r1.getLong(1), r1.getDouble(2)) === ((2L, 2L, 1.0)))
    // A={1,3}, B={2,3}: CDFs at levels 1,2,3 → A .5/.5/1, B 0/.5/1 →
    // D = .5 at level 1 (the level-3 tie contributes 0)
    val mixed = Seq((1.0, true), (3.0, true), (2.0, false), (3.0, false))
      .toDF("v", "a")
    val r2 = Constraints.ksStatistic(mixed, col("v"), col("a")).collect().head
    assert(r2.getDouble(2) === 0.5)
  }

  test("ksStatistic: an empty side yields NULL ks, never a division error") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val oneSided = Seq((1.0, true), (2.0, true)).toDF("v", "a")
    val r = Constraints.ksStatistic(oneSided, col("v"), col("a")).collect().head
    assert(r.getLong(0) === 2L && r.getLong(1) === 0L && r.isNullAt(2))
  }

  test("all conditional checks compile into a single scan") {
    val plan = Constraints.evaluate(dirty, Seq(
        Constraints.notNull("k"),
        Constraints.atLeast("price", 0.0),
        Constraints.isIn("status", Seq("ok"))))
      .queryExecution.executedPlan.toString
    val scans = "LocalTableScan".r.findAllIn(plan).length
    assert(scans === 1, s"expected one scan:\n$plan")
  }
}

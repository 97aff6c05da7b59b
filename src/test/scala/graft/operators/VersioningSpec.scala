package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class VersioningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def hist(rows: Seq[(Long, String, Int)]) =
    Versioning.scd2(rows.toDF("k", "v", "ver"), "k", "v", "ver")
      .select($"k", $"v", $"valid_from", $"valid_to", $"is_current")
      .orderBy($"k", $"valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        Option(r.get(3)).map(_.asInstanceOf[Int]), r.getBoolean(4)))

  test("unchanged key keeps one open interval") {
    val h = hist(Seq((1L, "a", 1), (1L, "a", 2), (1L, "a", 3)))
    assert(h === Seq((1L, "a", 1, None, true)))
  }

  test("each change closes the prior interval at the changing version") {
    val h = hist(Seq((1L, "a", 1), (1L, "b", 2), (1L, "b", 3), (1L, "c", 4)))
    assert(h === Seq(
      (1L, "a", 1, Some(2), false),
      (1L, "b", 2, Some(4), false),
      (1L, "c", 4, None, true)))
  }

  test("key appearing only in a later snapshot opens at that version") {
    val h = hist(Seq((2L, "x", 3)))
    assert(h === Seq((2L, "x", 3, None, true)))
  }

  test("NULL values version null-safely") {
    val rows = Seq[(Long, String, Int)]((1L, null, 1), (1L, null, 2), (1L, "a", 3))
    val h = Versioning.scd2(rows.toDF("k", "v", "ver"), "k", "v", "ver")
      .orderBy($"valid_from").collect()
    assert(h.length === 2)
    assert(h(0).getAs[String]("v") === null)
    assert(h(0).getAs[Int]("valid_to") === 3)
    assert(h(1).getAs[String]("v") === "a")
    assert(h(1).getAs[Boolean]("is_current"))
  }

  test("windows share one exchange: a single shuffle on the key") {
    val df = (1L to 100L).flatMap(k => Seq((k, "a", 1), (k, "b", 2))).toDF("k", "v", "ver")
    // string-count: AQE wraps the plan, hiding children from collect()
    val plan = Versioning.scd2(df, "k", "v", "ver").queryExecution.executedPlan.toString
    val exchanges = "(?m)^\\s*\\+?-?\\s*Exchange ".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected 1 shuffle, got:\n$plan")
    assert("Window \\[".r.findAllIn(plan).length === 2, s"expected 2 windows:\n$plan")
  }
}

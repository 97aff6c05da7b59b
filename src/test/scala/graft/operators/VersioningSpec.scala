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

  private def diff(old: Seq[(Long, String)], neu: Seq[(Long, String)]): Map[Long, String] =
    Versioning.snapshotDiff(old.toDF("k", "v"), neu.toDF("k", "v"), "k", Seq("v"))
      .collect().map(r => r.getAs[Long]("key") -> r.getAs[String]("status")).toMap

  test("snapshotDiff classifies inserted/deleted/updated/unchanged") {
    val got = diff(
      old = Seq(1L -> "a", 2L -> "b", 3L -> "c"),
      neu = Seq(2L -> "b", 3L -> "x", 4L -> "d"))
    assert(got === Map(1L -> "deleted", 2L -> "unchanged",
      3L -> "updated", 4L -> "inserted"))
  }

  test("snapshotDiff compares NULL-safely: null->value and value->null are updates") {
    val got = diff(
      old = Seq[(Long, String)](1L -> null, 2L -> "b", 3L -> null),
      neu = Seq[(Long, String)](1L -> "a", 2L -> null, 3L -> null))
    assert(got === Map(1L -> "updated", 2L -> "updated", 3L -> "unchanged"))
  }

  test("snapshotDiff on multiple compare columns: any difference is an update") {
    val old = Seq((1L, "a", 10), (2L, "b", 20)).toDF("k", "v", "w")
    val neu = Seq((1L, "a", 11), (2L, "b", 20)).toDF("k", "v", "w")
    val got = Versioning.snapshotDiff(old, neu, "k", Seq("v", "w"))
      .collect().map(r => r.getAs[Long]("key") -> r.getAs[String]("status")).toMap
    assert(got === Map(1L -> "updated", 2L -> "unchanged"))
  }

  test("snapshotDiff carries both sides' payloads for the diff report") {
    val r = Versioning.snapshotDiff(
        Seq(1L -> "a").toDF("k", "v"), Seq(1L -> "z").toDF("k", "v"), "k", Seq("v"))
      .collect().head
    assert(r.getAs[String]("old_v") === "a" && r.getAs[String]("new_v") === "z")
  }
}

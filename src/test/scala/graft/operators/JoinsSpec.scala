package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class JoinsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val trades = Seq(
    // key, time, trade id
    (1L, ts("2020-01-01 00:00:05"), 100L),
    (1L, ts("2020-01-01 00:00:10"), 101L),
    (1L, ts("2020-01-01 00:00:01"), 102L), // before any quote -> no match
    (2L, ts("2020-01-01 00:00:05"), 200L), // equal-time quote -> included
    (3L, ts("2020-01-01 00:00:05"), 300L)  // key with no quotes at all
  ).toDF("sym", "t", "trade_id")

  private lazy val quotes = Seq(
    // key, time, quote id, px
    (1L, ts("2020-01-01 00:00:03"), 10L, 1.0),
    (1L, ts("2020-01-01 00:00:07"), 11L, 2.0),
    (1L, ts("2020-01-01 00:00:07"), 12L, 3.0), // tie on time -> greatest id wins
    (2L, ts("2020-01-01 00:00:05"), 20L, 4.0)
  ).toDF("sym", "qt", "quote_id", "px")

  test("asofJoinBackward picks most recent prior row, inclusive, with tiebreak") {
    val out = Joins.asofJoinBackward(
        trades, quotes,
        leftKey = "sym", rightKey = "sym",
        leftTime = "t", rightTime = "qt",
        leftOut = Seq("trade_id"),
        rightPayload = Seq("quote_id", "px"),
        tieBreak = "quote_id")
      .orderBy($"trade_id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]), Option(r.get(2))))

    assert(out.toSeq === Seq(
      (100L, Some(10L), Some(1.0)),  // 00:05 -> quote at 00:03
      (101L, Some(12L), Some(3.0)),  // 00:10 -> tie at 00:07, id 12 wins
      (102L, None, None),            // before first quote
      (200L, Some(20L), Some(4.0)),  // equal time is inclusive
      (300L, None, None)))           // key never quoted
  }

  test("asofJoinBackward: a NULL tieBreak LOSES to any non-null tieBreak " +
      "at equal time (r17: nulls_last made the null row the fill winner)") {
    val q = Seq(
      (1L, ts("2020-01-01 00:00:07"), Some(9L), 1.0),
      (1L, ts("2020-01-01 00:00:07"), None: Option[Long], 2.0))
      .toDF("sym", "qt", "quote_id", "px")
    val t = Seq((1L, ts("2020-01-01 00:00:08"), 500L)).toDF("sym", "t", "trade_id")
    val out = Joins.asofJoinBackward(t, q,
        leftKey = "sym", rightKey = "sym", leftTime = "t", rightTime = "qt",
        leftOut = Seq("trade_id"), rightPayload = Seq("quote_id", "px"),
        tieBreak = "quote_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getDouble(2)))
    assert(out.toSeq === Seq((500L, Some(9L), 1.0)),
      "the non-null tieBreak row must win the forward fill")
  }

  test("asofJoinBackward plans no nested-loop or cartesian join") {
    val out = Joins.asofJoinBackward(trades, quotes, "sym", "sym", "t", "qt",
      Seq("trade_id"), Seq("quote_id"), "quote_id")
    val plan = out.queryExecution.executedPlan
    assert(plan.collect {
      case b: BroadcastNestedLoopJoinExec => b
      case c: CartesianProductExec => c
    }.isEmpty, plan.toString)
  }

  test("rangeJoinAgg counts containing intervals across bucket boundaries") {
    // bucket width = interval length = 2 days; interval B spans two buckets
    val points = Seq(
      (1L, ts("2020-01-02 12:00:00")), // inside A only
      (2L, ts("2020-01-03 12:00:00")), // inside A and B (B started Jan 2)
      (3L, ts("2020-01-04 23:00:00")), // inside C only; C starts mid-bucket
      (4L, ts("2020-03-01 00:00:00"))  // inside nothing
    ).toDF("pid", "pt")
    val intervals = Seq(
      (10L, ts("2020-01-02 00:00:00"), 5.0), // A: [Jan2, Jan4)
      (11L, ts("2020-01-02 06:00:00"), 7.0), // B: [Jan2 06:00, Jan4 06:00)
      (12L, ts("2020-01-04 20:00:00"), 9.0)  // C: [Jan4 20:00, Jan6 20:00)
    ).toDF("iid", "istart", "w")

    val out = Joins.rangeJoinAgg(points, intervals, "pid", "pt", "istart",
        lengthDays = 2,
        aggs = Seq(count($"iid").as("n"), sum($"w").as("sw")))
      .orderBy($"pid")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2))))

    assert(out.toSeq === Seq(
      (1L, 2L, Some(12.0)), // A and B both contain Jan 2 12:00
      (2L, 2L, Some(12.0)),
      (3L, 1L, Some(9.0)),
      (4L, 0L, None)))
  }

  test("rangeJoinAgg finds points past a bucket boundary when the interval " +
      "start has fractional seconds") {
    // interval [Jan 1 00:00:00.500, Jan 3 00:00:00.500): unix_timestamp
    // truncates the start to bucket 0, but the point below sits in bucket 1
    // (epoch 172800) AND inside the interval — the old end-bucket -1 math
    // never exploded bucket 1 and silently dropped it
    val intervals = Seq((10L, java.sql.Timestamp.valueOf("2020-01-01 00:00:00.5")))
      .toDF("iid", "istart")
    val points = Seq(
      (1L, java.sql.Timestamp.valueOf("2020-01-03 00:00:00.2")), // inside, bucket+1
      (2L, java.sql.Timestamp.valueOf("2020-01-03 00:00:00.7"))  // outside (>= end)
    ).toDF("pid", "pt")
    val out = Joins.rangeJoinAgg(points, intervals, "pid", "pt", "istart", 2,
      Seq(count($"iid").as("n")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 0L), s"got $out")
  }

  test("rangeJoinAgg plans no nested-loop or cartesian join") {
    val points = Seq((1L, ts("2020-01-02 12:00:00"))).toDF("pid", "pt")
    val intervals = Seq((10L, ts("2020-01-02 00:00:00"), 5.0)).toDF("iid", "istart", "w")
    val out = Joins.rangeJoinAgg(points, intervals, "pid", "pt", "istart", 2,
      Seq(count($"iid").as("n")))
    val plan = out.queryExecution.executedPlan
    assert(plan.collect {
      case b: BroadcastNestedLoopJoinExec => b
      case c: CartesianProductExec => c
    }.isEmpty, plan.toString)
  }

  // ---- rangeJoinAggCollapsed ---------------------------------------------

  test("rangeJoinAggCollapsed matches rangeJoinAgg on the boundary fixture, " +
      "including duplicate interval starts") {
    val points = Seq(
      (1L, ts("2020-01-02 12:00:00")),
      (2L, ts("2020-01-03 12:00:00")),
      (3L, ts("2020-01-04 23:00:00")),
      (4L, ts("2020-03-01 00:00:00"))
    ).toDF("pid", "pt")
    // B2 duplicates B's start exactly: the collapse must pre-merge them
    val intervals = Seq(
      (10L, ts("2020-01-02 00:00:00"), 5.0),
      (11L, ts("2020-01-02 06:00:00"), 7.0),
      (13L, ts("2020-01-02 06:00:00"), 11.0),
      (12L, ts("2020-01-04 20:00:00"), 9.0)
    ).toDF("iid", "istart", "w")

    def norm(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"pid").collect()
        .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSeq

    val direct = norm(Joins.rangeJoinAgg(points, intervals, "pid", "pt",
      "istart", 2, Seq(count($"iid").as("n"), sum($"w").as("sw"))))
    val collapsed = norm(Joins.rangeJoinAggCollapsed(points, intervals,
      "pid", "pt", "istart", 2,
      perStartAggs = Seq(count($"iid").as("__n"), sum($"w").as("__p")),
      mergeAggs = Seq(coalesce(sum($"__n"), lit(0L)).as("n"),
        sum($"__p").as("sw"))))
    assert(collapsed === direct, s"collapsed=$collapsed direct=$direct")
    assert(direct.map(t => (t._1, t._2)) ===
      Seq((1L, 3L), (2L, 3L), (3L, 1L), (4L, 0L)))
  }

  test("rangeJoinAggCollapsed handles fractional-second starts across the " +
      "bucket boundary (same +secs end-bucket math)") {
    val intervals = Seq((10L, java.sql.Timestamp.valueOf("2020-01-01 00:00:00.5")))
      .toDF("iid", "istart")
    val points = Seq(
      (1L, java.sql.Timestamp.valueOf("2020-01-03 00:00:00.2")),
      (2L, java.sql.Timestamp.valueOf("2020-01-03 00:00:00.7"))
    ).toDF("pid", "pt")
    val out = Joins.rangeJoinAggCollapsed(points, intervals, "pid", "pt",
        "istart", 2,
        perStartAggs = Seq(count($"iid").as("__n")),
        mergeAggs = Seq(coalesce(sum($"__n"), lit(0L)).as("n")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 0L), s"got $out")
  }

  test("rangeJoinAggCollapsed broadcasts the collapsed interval side — the " +
      "points never shuffle for the join") {
    val points = Seq((1L, ts("2020-01-02 12:00:00"))).toDF("pid", "pt")
    val intervals = Seq((10L, ts("2020-01-02 00:00:00"), 5.0)).toDF("iid", "istart", "w")
    val out = Joins.rangeJoinAggCollapsed(points, intervals, "pid", "pt",
      "istart", 2,
      perStartAggs = Seq(count($"iid").as("__n"), sum($"w").as("__p")),
      mergeAggs = Seq(coalesce(sum($"__n"), lit(0L)).as("n"), sum($"__p").as("sw")))
    // string-match the plan text (the PlanSpec idiom): under AQE the join
    // sits inside an unexecuted AdaptiveSparkPlan node that collect() does
    // not traverse
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"),
      s"expected a broadcast hash join for the collapsed side:\n$p")
  }

  // ---- intervalOverlapSelfJoin -------------------------------------------

  // 7-day windows. Fixture plants: an overlapping pair straddling a bucket
  // boundary, an exact-touch pair (end == start, half-open -> NO overlap),
  // identical starts, a cross-key near-miss, and a bucket-aligned start.
  private lazy val windows = Seq(
    (1L, 10L, ts("2020-01-01 00:00:00")),
    (1L, 11L, ts("2020-01-05 00:00:00")), // overlaps 10 by 3 days
    (1L, 12L, ts("2020-01-08 00:00:00")), // touches 10's end exactly: no; overlaps 11
    (1L, 13L, ts("2020-03-01 00:00:00")), // isolated
    (2L, 20L, ts("2020-01-05 00:00:00")), // same time as 11, other key
    (3L, 30L, ts("2020-02-01 00:00:00")),
    (3L, 31L, ts("2020-02-01 00:00:00")), // identical starts: full overlap
    (3L, 32L, ts("2020-02-07 23:59:59"))  // 1s before 30/31 end: 1s overlap
  ).toDF("k", "id", "s")

  private def bruteOverlaps(lenDays: Int): Set[(Long, Long, Long, Long)] = {
    val rows = windows.collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    val L = lenDays * 86400L
    (for {
      (ka, a, sa) <- rows; (kb, b, sb) <- rows
      if ka == kb && a < b
      da = sa.getTime / 1000; db = sb.getTime / 1000
      if da < db + L && db < da + L
    } yield (ka, a, b, L - math.abs(da - db))).toSet
  }

  test("intervalOverlapSelfJoin equals brute force incl. boundary cases") {
    val got = Joins.intervalOverlapSelfJoin(windows, "k", "id", "s", 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == bruteOverlaps(7), s"got $got\nexp ${bruteOverlaps(7)}")
    // half-open: the exact-touch pair (10, 12) must be absent
    assert(!got.exists(t => t._2 == 10L && t._3 == 12L))
    // identical starts overlap fully
    assert(got.contains((3L, 30L, 31L, 7L * 86400)))
  }

  test("intervalOverlapSelfJoin emits each pair exactly once (no dropDuplicates)") {
    val out = Joins.intervalOverlapSelfJoin(windows, "k", "id", "s", 7)
      .groupBy($"a", $"b").count().where($"count" > 1)
    assert(out.isEmpty)
  }

  test("intervalOverlapSelfJoin plans no nested-loop or cartesian join") {
    val plan = Joins.intervalOverlapSelfJoin(windows, "k", "id", "s", 7)
      .queryExecution.executedPlan
    assert(plan.collect {
      case b: BroadcastNestedLoopJoinExec => b
      case c: CartesianProductExec => c
    }.isEmpty, plan.toString)
  }

  // ---- intervalOverlapCountsCollapsed --------------------------------------

  private def pairAggOf(df: org.apache.spark.sql.DataFrame) =
    Joins.intervalOverlapSelfJoin(df, "k", "id", "s", 7)
      .groupBy($"key")
      .agg(count(lit(1)).as("n_overlaps"), sum($"overlap_secs").as("s_ov"))

  private def asMap(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
    df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("intervalOverlapCountsCollapsed equals aggregating the pair relation " +
      "(schema incl. LongType sums)") {
    val collapsed = Joins.intervalOverlapCountsCollapsed(windows, "k", "s", 7)
    assert(collapsed.schema.fields.map(f => (f.name, f.dataType.typeName)).toSeq ==
      Seq(("key", "long"), ("n_overlaps", "long"), ("s_ov", "long")),
      collapsed.schema.treeString)
    assert(asMap(collapsed) == asMap(pairAggOf(windows)))
  }

  test("intervalOverlapCountsCollapsed is exact under R-fold replication " +
      "(pairs grow R-squared, the collapsed join does not)") {
    // the SCALE.md fixture protocol: replicate rows with shifted ids —
    // every original pair becomes R², plus C(R,2) full-overlap pairs per
    // original row at its own timestamp
    val reps = 3
    val replicated = (0 until reps).map(r =>
      windows.select($"k", ($"id" + lit(r * 1000L)).as("id"), $"s"))
      .reduce(_ unionByName _)
    assert(asMap(Joins.intervalOverlapCountsCollapsed(replicated, "k", "s", 7)) ==
      asMap(pairAggOf(replicated)))
  }
}

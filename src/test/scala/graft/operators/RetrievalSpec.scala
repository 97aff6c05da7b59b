package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "spark join spark window"),
    (2L, "join window group sort"),
    (3L, "dup dup dup spark"),
    (4L, "sort group order filter"),
    (5L, "window window window window window window window window")
  ).toDF("doc_id", "text")

  test("bm25: rare-term documents outrank common-term documents") {
    val out = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("spark", "dup"), 5)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id")))
    // doc 3 holds 'dup' (df=1 → huge idf) plus 'spark' — must be rank 1
    assert(out.head === (1, 3L))
    // docs 4 and 5 match nothing → score 0, tie broken by doc_id at the tail
    assert(out.takeRight(2).map(_._2) === Array(4L, 5L))
  }

  test("bm25: zero-match documents score exactly 0 and length-norm penalizes long docs") {
    val scored = Retrieval.bm25(docs, "doc_id", "text", Seq("window"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toMap
    assert(scored(4L) === 0.0)
    // doc 5 is all 'window' (tf 8) but saturation + length norm keep its
    // advantage over doc 1 (tf 1, short) bounded well under 8x
    assert(scored(5L) > scored(1L))
    assert(scored(5L) < 4 * scored(1L))
  }

  test("invertedIndexStats: df/tf/posting checksum are exact") {
    val out = Retrieval.invertedIndexStats(docs, "doc_id", "text")
      .collect().map(r => r.getAs[String]("tok") ->
        ((r.getAs[Long]("df"), r.getAs[Long]("tf"), r.getAs[Long]("posting_sum")))).toMap
    assert(out("spark") === ((2L, 3L, 4L)))  // docs 1 (tf 2) and 3 (tf 1)
    assert(out("dup") === ((1L, 3L, 3L)))
    assert(out("window") === ((3L, 10L, 8L))) // docs 1, 2, 5
  }

  test("cooccurrenceLift: pair counts and lift match hand computation") {
    val out = Retrieval.cooccurrenceLift(docs, "doc_id", "text",
      Seq("spark", "join", "window"))
      .collect().map(r => (r.getAs[String]("tok_a"), r.getAs[String]("tok_b")) ->
        ((r.getAs[Long]("n_both"), r.getAs[Double]("lift")))).toMap
    // spark in {1,3}, join in {1,2}, window in {1,2,5}; N=5
    assert(out(("join", "spark")) === ((1L, 5.0 / 4)))   // 1*5/(2*2)
    assert(out(("join", "window"))._1 === 2L)
    assert(math.abs(out(("join", "window"))._2 - 1.6667) < 1e-9) // round(2*5/6, 4)
    assert(out(("spark", "window"))._1 === 1L)
  }

  test("reciprocalRankFusion: agreement wins, one-sided ids still fuse") {
    val a = Seq((10L, 1), (11L, 2), (12L, 3)).toDF("id", "rank")
    val b = Seq((11L, 1), (10L, 2), (13L, 3)).toDF("id", "rank")
    val out = Retrieval.reciprocalRankFusion(a, b, "id", c = 60, k = 4)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("id"),
        r.getAs[Double]("fused")))
    // 10: 1/61+1/62, 11: 1/62+1/61 → tie broken by id; 12/13 one-sided
    assert(out(0)._2 === 10L && out(1)._2 === 11L)
    assert(out(0)._3 === out(1)._3)
    assert(out.map(_._2).toSet === Set(10L, 11L, 12L, 13L))
    assert(out(2)._3 > out(3)._3 || out(2)._2 < out(3)._2)
  }

  test("sessionize: gaps split sessions, ties break by sequence column") {
    val m = 60L * 1000000 // one minute in micros
    val ev = Seq(
      (1L, 101L, 0 * m), (1L, 102L, 10 * m), (1L, 103L, 50 * m), // gap 40m splits
      (1L, 104L, 55 * m),
      (2L, 201L, 0 * m) // single-event session
    ).toDF("user_id", "event_id", "us")
    val out = Sessions.sessionize(ev, "user_id", "us", "event_id", gapMicros = 30 * m)
      .orderBy($"user_id", $"session_id")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"),
        r.getAs[Long]("n_events"), r.getAs[Long]("end_us") - r.getAs[Long]("start_us")))
    assert(out === Array((1L, 1L, 2L, 10 * m), (1L, 2L, 2L, 5 * m), (2L, 1L, 1L, 0L)))
  }

  test("funnel: strict ordering, out-of-order steps don't count, ties excluded") {
    val ev = Seq(
      (1L, "view", 1L), (1L, "click", 2L), (1L, "purchase", 3L), // full funnel
      (2L, "click", 1L), (2L, "view", 2L), (2L, "purchase", 3L), // click BEFORE view → stage 1 only (purchase needs a post-view click)
      (3L, "view", 1L), (3L, "click", 5L),                       // stages 1-2
      (4L, "purchase", 1L),                                      // never enters
      (5L, "view", 7L), (5L, "click", 7L)                        // tie: click not strictly after
    ).toDF("user_id", "event_type", "us")
    val out = Sessions.funnel(ev, "user_id", "us", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy($"stage")
      .collect().map(r => (r.getAs[Int]("stage"), r.getAs[String]("step"),
        r.getAs[Long]("users"), r.getAs[Double]("conv_from_first")))
    assert(out === Array(
      (1, "view", 4L, 1.0),
      (2, "click", 2L, 0.5),
      (3, "purchase", 1L, 0.25)))
  }

  test("retention cohorts: hand-computed matrix, boundary lands in next period") {
    val p = 100L // period micros, for readable fixtures
    val ev = Seq(
      (1L, 10L), (1L, 110L), (1L, 250L), // cohort 0, active 0/1/2
      (2L, 50L), (2L, 60L),              // cohort 0, active 0 only (same period twice)
      (3L, 100L),                        // exactly on the boundary → cohort 1
      (4L, 120L), (4L, 210L)             // cohort 1, active 1/2 → offsets 0,1
    ).toDF("user_id", "us")
    val out = Sessions.retentionCohorts(ev, "user_id", "us", p)
      .orderBy($"cohort_week", $"week_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(out === Array(
      (0L, 0L, 2L, 2L, 1.0),   // users 1,2 in week 0
      (0L, 1L, 1L, 2L, 0.5),   // only user 1 returns
      (0L, 2L, 1L, 2L, 0.5),
      (1L, 0L, 2L, 2L, 1.0),   // users 3,4
      (1L, 1L, 1L, 2L, 0.5)))  // only user 4
  }

  test("session funnel: conversion only counts within one session") {
    val m = 60L * 1000000
    val ev = Seq(
      // user 1, session 1: full in-session funnel
      (1L, 1L, "view", 0 * m), (1L, 2L, "click", 1 * m), (1L, 3L, "purchase", 2 * m),
      // user 2: view in session 1, click+purchase in session 2 (40m gap)
      // → session 1 reaches stage 1 only; session 2 never saw a view
      (2L, 4L, "view", 0 * m), (2L, 5L, "click", 45 * m), (2L, 6L, "purchase", 46 * m),
      // user 3, one session: click before view → stage 1 only
      (3L, 7L, "click", 0 * m), (3L, 8L, "view", 1 * m)
    ).toDF("user_id", "event_id", "event_type", "us")
    val out = Sessions.sessionFunnel(ev, "user_id", "us", "event_id",
        "event_type", gapMicros = 30 * m, Seq("view", "click", "purchase"))
      .orderBy($"stage")
      .collect().map(r => (r.getAs[Int]("stage"), r.getAs[Long]("sessions")))
    // sessions with a view: u1s1, u2s1, u3s1 = 3; in-session conversions: u1s1 only
    assert(out === Array((1, 3L), (2, 1L), (3, 1L)))
  }

  test("daily active users: hand-computed DAU, new, cumulative-new curves") {
    val day = 86400000000L
    val ev = Seq(
      (1L, 0L), (1L, 1L), (2L, 10L),           // day 0: users 1,2 (both new); user 1 twice
      (1L, day + 5L), (3L, day + 6L),          // day 1: users 1,3 (3 new)
      (2L, 3 * day)                            // day 3: user 2 (day 2 empty — absent row)
    ).toDF("user_id", "us")
    val out = Sessions.dailyActiveUsers(ev, "user_id", "us")
      .orderBy($"day")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out === Array(
      (0L, 2L, 2L, 2L),
      (1L, 2L, 1L, 3L),
      (3L, 1L, 0L, 3L)))
  }

  test("transition matrix: hand-computed pair counts and shares, ties by seq") {
    val ev = Seq(
      // user 1: view -> click -> view  (pairs: v->c, c->v)
      (1L, 1L, "view", 0L), (1L, 2L, "click", 10L), (1L, 3L, "view", 20L),
      // user 2: view -> view (tie on ts: event_id orders 4 before 5)
      (2L, 4L, "view", 0L), (2L, 5L, "view", 0L),
      // user 3: single event — no pair
      (3L, 6L, "purchase", 0L)
    ).toDF("user_id", "event_id", "event_type", "us")
    val out = Sessions.transitionMatrix(ev, "user_id", "us", "event_id", "event_type")
      .orderBy($"prev_type", $"next_type")
      .collect().map(r => (r.getAs[String]("prev_type"), r.getAs[String]("next_type"),
        r.getAs[Long]("n"), r.getAs[Double]("share")))
    assert(out === Array(
      ("click", "view", 1L, 1.0),
      ("view", "click", 1L, 0.5),
      ("view", "view", 1L, 0.5)))
  }

  test("transition matrix: pairs never cross users") {
    val ev = Seq((1L, 1L, "a", 0L), (2L, 2L, "b", 1L))
      .toDF("user_id", "event_id", "event_type", "us")
    assert(Sessions.transitionMatrix(ev, "user_id", "us", "event_id", "event_type")
      .count() === 0L)
  }

  test("bm25ContextAssembly: per-query ranking, inclusive budget boundary cut") {
    val d = Seq(
      (1L, "x x x a"),   // dl 4, tf_a 1
      (2L, "a a y"),     // dl 3, tf_a 2 — top for qa
      (3L, "b b b b b"), // dl 5, tf_b 5 — top for qb
      (4L, "a b")        // dl 2, shorter doc outranks doc 1 for qa
    ).toDF("doc_id", "text")
    val got = Retrieval.bm25ContextAssembly(d, "doc_id", "text",
        Seq("qa" -> Seq("a"), "qb" -> Seq("b")), k = 3, budgetTokens = 7L)
      .orderBy("qid", "rank").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(4)))
    assert(got === Seq(
      // qa: doc2 (cum 3), doc4 (cum 5); doc1 would push cum to 9 > 7 — cut
      ("qa", 1, 2L, 3L), ("qa", 2, 4L, 5L),
      // qb: doc3 (cum 5), doc4 (cum 7 = budget — inclusive boundary keeps it)
      ("qb", 1, 3L, 5L), ("qb", 2, 4L, 7L)))
  }
}

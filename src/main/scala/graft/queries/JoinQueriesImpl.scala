package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Joins

/** Temporal-join queries: point-in-time (as-of) and range joins — the
  * feature-lookup shapes a training pipeline runs constantly and Spark has
  * no built-in operator for. Both avoid the O(n*m) inequality-join plan
  * (see [[graft.operators.Joins]] scale notes).
  *
  * Events live in 2024 while orders span 1995–2001, so each event derives a
  * deterministic `as_of_ts` inside the order history (event_id % 2400 days
  * from 1995-01-01) — every lookup lands at a different point of the
  * history, exercising early/late/no-match cases.
  */
object JoinQueriesImpl {

  private def withAsOfTs(e: org.apache.spark.sql.DataFrame) =
    e.withColumn("as_of_ts",
      expr("cast(date_add(date'1995-01-01', cast(event_id % 2400 as int)) as timestamp)"))

  /** As-of join: each event → the user's most recent order at or before
    * as_of_ts (ties → greatest o_orderkey). Oracle replays it as a
    * windowed left join in DuckDB. */
  val asofJoin = Q(
    "q_asof_join",
    (s, dir) => {
      val events = withAsOfTs(Tables.events(s, dir))
      val orders = Tables.orders(s, dir).select(
        col("o_custkey"), col("o_orderdate"),
        col("o_orderkey").as("asof_orderkey"),
        round(col("o_totalprice"), 2).as("asof_price"))
      Joins.asofJoinBackward(
        events, orders,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "as_of_ts", rightTime = "o_orderdate",
        leftOut = Seq("event_id", "user_id", "as_of_ts"),
        rightPayload = Seq("asof_orderkey", "asof_price"),
        tieBreak = "asof_orderkey")
        .orderBy(col("event_id"))
    },
    Some("""WITH e AS (
        SELECT event_id, user_id,
          CAST(DATE '1995-01-01' + INTERVAL (event_id % 2400) DAY AS TIMESTAMP) AS as_of_ts
        FROM events),
      j AS (
        SELECT e.event_id, e.user_id, e.as_of_ts,
          o.o_orderkey, o.o_totalprice,
          row_number() OVER (PARTITION BY e.event_id
            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        FROM e LEFT JOIN orders o
          ON e.user_id = o.o_custkey AND o.o_orderdate <= e.as_of_ts)
      SELECT event_id, user_id, as_of_ts,
        o_orderkey AS asof_orderkey, round(o_totalprice, 2) AS asof_price
      FROM j WHERE rn = 1 ORDER BY event_id"""))

  /** Range join: per event, how many urgent-order 7-day windows contain its
    * as_of_ts, and their total price. Collapse-first bucketed equi-join:
    * count/sum are decomposable, so urgent orders pre-aggregate per
    * distinct o_orderdate (~2 400 dates at ANY replication of the fact)
    * and the tiny collapsed side broadcasts — events never shuffle for
    * the join and the fan-out is ≤ O(lengthDays) candidate dates per
    * event instead of every matching order row (which grows R²× when
    * both sides replicate R×; the round-12 honest probe measured the
    * non-collapsed form join-fanout-bound at 100×). Oracle is the direct
    * inequality join. */
  val rangeJoin = Q(
    "q_range_join",
    (s, dir) => {
      val events = withAsOfTs(Tables.events(s, dir))
      val urgent = Tables.orders(s, dir)
        .where(col("o_orderpriority") === "1-URGENT")
      Joins.rangeJoinAggCollapsed(
        points = events, intervals = urgent,
        pointId = "event_id", pointTime = "as_of_ts",
        intervalStart = "o_orderdate", lengthDays = 7,
        perStartAggs = Seq(
          count(col("o_orderkey")).as("__n"),
          sum(col("o_totalprice")).as("__p")),
        mergeAggs = Seq(
          coalesce(sum(col("__n")), lit(0L)).as("n_open"),
          round(sum(col("__p")), 2).as("open_price")))
        .orderBy(col("event_id"))
    },
    Some("""WITH e AS (
        SELECT event_id,
          CAST(DATE '1995-01-01' + INTERVAL (event_id % 2400) DAY AS TIMESTAMP) AS as_of_ts
        FROM events),
      u AS (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT')
      SELECT e.event_id, count(u.o_orderkey) AS n_open,
        round(sum(u.o_totalprice), 2) AS open_price
      FROM e LEFT JOIN u
        ON e.as_of_ts >= u.o_orderdate
       AND e.as_of_ts < u.o_orderdate + INTERVAL 7 DAY
      GROUP BY e.event_id ORDER BY e.event_id"""))

  /** Anti join: customers with NO urgent order, profiled per market
    * segment. Spark plans left_anti as a broadcast/shuffled hash anti
    * join — one pass, no materialized NOT-IN list. The curation twin of
    * decontamination's semi join (rows that do NOT hit the reference
    * set). The urgent-priority filter makes the anti set non-trivial at
    * every verified scale (18 / 203 / 1986 customers at sf0.001/0.01/0.1)
    * — an unfiltered orders side matches every customer, which would
    * verify nothing about anti semantics. */
  val antiJoin = Q(
    "q_anti_join",
    (s, dir) => {
      val cust = Tables.customer(s, dir)
      val ord = Tables.orders(s, dir)
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          min(col("c_custkey")).as("min_key"),
          max(col("c_custkey")).as("max_key"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""SELECT c_mktsegment, count(*) AS n,
        min(c_custkey) AS min_key, max(c_custkey) AS max_key
      FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** Fuzzy string self-join: part-name pairs within edit distance 2 —
    * the entity-resolution screen (typo'd product titles) as an EXACT
    * operator: q-gram prefix-filter candidates, `levenshtein` verify
    * (recall 1.0; see [[graft.operators.Fuzzy]] scale notes). Runs over
    * DISTINCT names (exact-collapse: 2000 parts → 64 names at sf0.01),
    * then attaches per-name part counts. Oracle is the brute-force
    * all-pairs DuckDB `levenshtein` — tractable exactly because it runs
    * on the collapsed name set. */
  val fuzzyJoin = Q(
    "q_fuzzy_join",
    (s, dir) => {
      val names = Tables.part(s, dir).groupBy(col("p_name"))
        .agg(count(lit(1)).as("n_parts"))
      val pairs = graft.operators.Fuzzy.editDistanceSelfJoin(
        names.select(col("p_name")), "p_name", "p_name", maxDist = 2)
      pairs
        .join(names.select(col("p_name").as("a"), col("n_parts").as("n_parts_a")), "a")
        .join(names.select(col("p_name").as("b"), col("n_parts").as("n_parts_b")), "b")
        .select(col("a").as("name_a"), col("b").as("name_b"), col("dist"),
          col("n_parts_a"), col("n_parts_b"))
        .orderBy(col("name_a"), col("name_b"))
    },
    Some("""WITH n AS (SELECT p_name, count(*) AS n_parts FROM part GROUP BY p_name)
      SELECT a.p_name AS name_a, b.p_name AS name_b,
        levenshtein(a.p_name, b.p_name) AS dist,
        a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
      FROM n a JOIN n b ON a.p_name < b.p_name
        AND levenshtein(a.p_name, b.p_name) <= 2
      ORDER BY name_a, name_b"""))

  /** Interval-overlap self-join: per customer, pairs of orders whose
    * 7-day open windows overlap (concurrently open orders), rolled up
    * into a histogram over per-customer overlap counts. Bucketed
    * equi-join with exactly-once ownership emission — no nested loop, no
    * distinct (see [[graft.operators.Joins.intervalOverlapSelfJoin]]).
    * All output arithmetic is integer (epoch seconds), so the oracle's
    * direct inequality join reproduces it bit-for-bit. */
  val intervalOverlap = Q(
    "q_interval_overlap",
    (s, dir) => {
      // collapse-first counts: the pair relation grows R²× under R×
      // replication while this form's join runs over distinct
      // (custkey, date) rows — bit-identical aggregates (JoinsSpec pins
      // equality with aggregating intervalOverlapSelfJoin's pairs)
      Joins.intervalOverlapCountsCollapsed(
          Tables.orders(s, dir), "o_custkey", "o_orderdate", 7)
        .groupBy(col("n_overlaps"))
        .agg(count(lit(1)).as("n_customers"), min(col("key")).as("min_custkey"),
          sum(col("s_ov")).as("total_overlap_secs"))
        .orderBy(col("n_overlaps"))
    },
    Some("""WITH p AS (
        SELECT o1.o_custkey AS ck,
          604800 - date_diff('second',
            least(o1.o_orderdate, o2.o_orderdate),
            greatest(o1.o_orderdate, o2.o_orderdate)) AS ov
        FROM orders o1 JOIN orders o2
          ON o1.o_custkey = o2.o_custkey AND o1.o_orderkey < o2.o_orderkey
         AND o1.o_orderdate < o2.o_orderdate + INTERVAL 7 DAY
         AND o2.o_orderdate < o1.o_orderdate + INTERVAL 7 DAY),
      c AS (SELECT ck, count(*) AS n_overlaps, CAST(sum(ov) AS BIGINT) AS s_ov
        FROM p GROUP BY ck)
      SELECT n_overlaps, count(*) AS n_customers, min(ck) AS min_custkey,
        CAST(sum(s_ov) AS BIGINT) AS total_overlap_secs
      FROM c GROUP BY n_overlaps ORDER BY n_overlaps"""))

  /** Join fan-out profile: the distribution of orders-per-customer (a
    * count-of-counts histogram, INCLUDING the zero-order customers via
    * the left join) with a cumulative share column — the pre-join audit
    * that predicts a join's output size and flags skewed keys before
    * they melt a shuffle at 100 TB. Two partial-aggregable groupBys; the
    * cumulative window runs over the tiny histogram (|distinct fanout|
    * rows). */
  val fanoutProfile = Q(
    "q_fanout_profile",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val f = Tables.customer(s, dir)
        .join(Tables.orders(s, dir),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("fanout"))
      val g = f.groupBy(col("fanout")).agg(count(lit(1)).as("n_customers"))
      val cum = Window.orderBy(col("fanout"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      g.select(col("fanout"), col("n_customers"),
          round(sum(col("n_customers")).over(cum).cast("double") /
            sum(col("n_customers")).over(
              Window.rowsBetween(Window.unboundedPreceding,
                Window.unboundedFollowing)), 6).as("cum_share"))
        .orderBy(col("fanout"))
    },
    Some("""WITH f AS (SELECT c_custkey, count(o_orderkey) AS fanout
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey),
      g AS (SELECT fanout, CAST(count(*) AS BIGINT) AS n_customers
          FROM f GROUP BY fanout)
      SELECT fanout, n_customers,
        round(CAST(sum(n_customers) OVER (ORDER BY fanout
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) /
          sum(n_customers) OVER (), 6) AS cum_share
      FROM g ORDER BY fanout"""))

  def all: Seq[Q] = Seq(asofJoin, rangeJoin, antiJoin, fuzzyJoin,
    intervalOverlap, fanoutProfile)
}

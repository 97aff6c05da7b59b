package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Retrieval, Sessions}

/** Sparse-retrieval and sessionization queries: BM25 corpus search,
  * inverted-index statistics, term association, rank fusion, and batch
  * sessionization. All five are hash-checked against DuckDB oracles —
  * the BM25 family stays exactly replayable because the scores are
  * rational arithmetic over exact counts (see operators/Retrieval.scala's
  * no-log policy).
  */
object RetrievalQueriesImpl {

  /** events.ts is epoch-NANOS long on the driver fixtures (parquet
    * TIMESTAMP(NANOS) + nanosAsLong) but a plain µs TIMESTAMP on rebuilt
    * probe fixtures — normalize either to epoch MICROS. One definition
    * for every event query (the dispatch was copy-pasted 11 times before
    * the r17 review; a third ts encoding now lands in exactly one place).
    * µs fixtures surface as TIMESTAMP or TIMESTAMP_NTZ depending on the
    * writer; the cast unifies both before unix_micros. */
  private def eventMicros(ev0: org.apache.spark.sql.DataFrame): org.apache.spark.sql.Column =
    ev0.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }


  /** The fixed query-term set: three common terms plus the rare 'dup'
    * (df 25 of 500 docs at sf0.01) so idf actually separates ranks. */
  private val qterms = Seq("spark", "join", "window", "dup")

  /** BM25 top-10 over documents. TakeOrderedAndProject for the cut — the
    * corpus is scanned once, never globally sorted. */
  val bm25TopK = Q(
    "q_bm25_topk",
    (s, dir) =>
      Retrieval.bm25TopK(Tables.documents(s, dir), "doc_id", "text", qterms, 10),
    Some(Retrieval.bm25OracleSql("documents", "doc_id", "text", qterms) +
      s""",
        |r AS (SELECT doc_id, score,
        |        row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM sc)
        |SELECT rank, doc_id, score FROM r WHERE rank <= 10 ORDER BY rank""".stripMargin))

  /** Batched retrieval + context packing ([[Retrieval.bm25ContextAssembly]]):
    * three queries share ONE corpus scan (union-of-terms kernel pass,
    * per-query scores as column arithmetic), each takes its BM25 top-10
    * and keeps the rank prefix fitting a 250-token context budget — the
    * RAG prompt-assembly step, batched the way a 100 TB serving pipeline
    * must batch it (scan cost amortized across the query set). */
  private val ctxQueries = Seq(
    "qa" -> Seq("spark", "join"),
    "qb" -> Seq("window", "dup"),
    "qc" -> Seq("spark", "window", "dup"))

  val ragContext = Q(
    "q_rag_context_budget",
    (s, dir) =>
      Retrieval.bm25ContextAssembly(Tables.documents(s, dir), "doc_id", "text",
          ctxQueries, 10, 250L)
        .orderBy(col("qid"), col("rank")),
    Some(Retrieval.bm25ContextOracleSql("documents", "doc_id", "text",
      ctxQueries, 10, 250L)))

  /** Posting-list statistics for every distinct token: df, tf, posting
    * bounds and a sum-of-doc-ids checksum that pins WHICH documents carry
    * each token. */
  val invertedIndex = Q(
    "q_inverted_index",
    (s, dir) =>
      Retrieval.invertedIndexStats(Tables.documents(s, dir), "doc_id", "text"),
    Some("""WITH t AS (SELECT doc_id,
        unnest(regexp_split_to_array(trim(text), '[\t\n\x0B\f\r ]+')) AS tok FROM documents)
      SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
        count(*) AS tf,
        min(doc_id) AS first_doc, max(doc_id) AS last_doc,
        CAST(sum(DISTINCT doc_id) AS BIGINT) AS posting_sum
      FROM t GROUP BY tok ORDER BY tok"""))

  private val vocab = Seq("spark", "join", "window", "dup", "vector", "stream")
  private val vocabSql = vocab.map(t => s"'$t'").mkString(", ")

  /** Document-level term co-occurrence with lift over a fixed vocabulary. */
  val cooccurLift = Q(
    "q_cooccur_lift",
    (s, dir) =>
      Retrieval.cooccurrenceLift(Tables.documents(s, dir), "doc_id", "text", vocab),
    Some(s"""WITH p AS (
        SELECT DISTINCT doc_id, tok FROM (
          SELECT doc_id, unnest(regexp_split_to_array(trim(text), '[\\t\\n\\x0B\\f\\r ]+')) AS tok
          FROM documents)
        WHERE tok IN ($vocabSql)),
      c AS (SELECT tok, count(*) AS n FROM p GROUP BY tok),
      n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM documents),
      pairs AS (
        SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS n_both
        FROM p a JOIN p b ON a.doc_id = b.doc_id AND a.tok < b.tok
        GROUP BY a.tok, b.tok)
      SELECT tok_a, tok_b, n_both, ca.n AS n_a, cb.n AS n_b,
        round((CAST(n_both AS DOUBLE) * total) / (CAST(ca.n AS DOUBLE) * cb.n), 4) AS lift
      FROM pairs JOIN c ca ON ca.tok = pairs.tok_a
                 JOIN c cb ON cb.tok = pairs.tok_b
      CROSS JOIN n ORDER BY tok_a, tok_b"""))

  /** RRF fusion of two corpus rankings: BM25 (quality-weighted term
    * relevance) and raw query-term frequency (pure count). Rational
    * arithmetic end to end. */
  val rankFusion = Q(
    "q_rank_fusion",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, dir)
      val byBm25 = Retrieval.bm25(docs, "doc_id", "text", qterms)
        .orderBy(col("score").desc, col("doc_id")).limit(20)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id"))))
      val byTf = Retrieval.termCountsPerDoc(docs, "doc_id", "text", qterms)
        .select(col("doc_id"),
          qterms.map(t => col(s"tf_$t")).reduceLeft(_ + _).as("tf_sum"))
        .orderBy(col("tf_sum").desc, col("doc_id")).limit(20)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("tf_sum").desc, col("doc_id"))))
      Retrieval.reciprocalRankFusion(byBm25, byTf, "doc_id", c = 60, k = 10)
    },
    Some(Retrieval.bm25OracleSql("documents", "doc_id", "text", qterms) +
      s""",
        |ra AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank_a
        |       FROM sc ORDER BY score DESC, doc_id LIMIT 20),
        |tfs AS (SELECT doc_id, ${qterms.map(t => s"tf_$t").mkString(" + ")} AS tf_sum FROM d),
        |rb AS (SELECT doc_id, row_number() OVER (ORDER BY tf_sum DESC, doc_id) AS rank_b
        |       FROM tfs ORDER BY tf_sum DESC, doc_id LIMIT 20),
        |fused AS (
        |  SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id, rank_a, rank_b,
        |    round(COALESCE(1.0 / (60 + rank_a), 0.0)
        |        + COALESCE(1.0 / (60 + rank_b), 0.0), 6) AS fused
        |  FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id),
        |top AS (SELECT *, row_number() OVER (ORDER BY fused DESC, doc_id) AS rank
        |        FROM fused)
        |SELECT rank, doc_id, rank_a, rank_b, fused FROM top
        |WHERE rank <= 10 ORDER BY rank""".stripMargin))

  /** Activity seasonality: the (day-of-week × hour) event matrix — the
    * traffic-shape profile capacity planning and anomaly baselines read.
    * Day-of-week and hour come from PURE integer arithmetic on epoch
    * micros (epoch day 0 = Thursday; Sunday = 0 ⇒ dow = (day+4) mod 7) —
    * no engine calendar functions whose week-start conventions differ,
    * so the replay is trivial. ONE partial-aggregable pass; ≤168 output
    * rows at any scale. */
  val eventSeasonality = Q(
    "q_event_seasonality",
    (s, dir) => {
      val ev0 = Tables.events(s, dir)
      val us = eventMicros(ev0)
      ev0.select(us.as("us"), col("value"))
        .select(pmod(expr("us div 86400000000") + 4, lit(7)).as("dow"),
          expr("(us % 86400000000) div 3600000000").as("hour"), col("value"))
        .groupBy(col("dow"), col("hour"))
        .agg(count(lit(1)).as("n"), round(avg(col("value")), 4).as("avg_value"))
        .orderBy(col("dow"), col("hour"))
    },
    Some("""WITH e AS (SELECT epoch_us(ts) AS us, value FROM events),
      b AS (SELECT ((us // 86400000000 + 4) % 7 + 7) % 7 AS dow,
          (us % 86400000000) // 3600000000 AS hour, value FROM e)
      SELECT dow, hour, count(*) AS n, round(avg(value), 4) AS avg_value
      FROM b GROUP BY dow, hour ORDER BY dow, hour"""))

  /** Batch gap-sessionization of the event stream (30-minute gap), rolled
    * up per user. Timestamps are integral epoch-microseconds throughout,
    * so gaps and durations are exact in both engines. */
  val sessionizeBatch = Q(
    "q_sessionize_batch",
    (s, dir) => {
      val ev0 = Tables.events(s, dir)
      // events.ts is epoch-NANOS long on the driver fixtures (parquet
      // TIMESTAMP(NANOS) + nanosAsLong) but a plain µs TIMESTAMP on
      // rebuilt probe fixtures — normalize either to epoch micros
      val us = eventMicros(ev0)
      val ev = ev0.select(col("user_id"), col("event_id"), us.as("us"))
      Sessions.sessionize(ev, "user_id", "us", "event_id", gapMicros = 1800000000L)
        .withColumn("dur_sec", expr("(end_us - start_us) div 1000000"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_events")).as("n_events"),
          max(col("n_events")).as("max_session_events"),
          max(col("dur_sec")).as("max_dur_sec"))
        .orderBy(col("user_id"))
    },
    Some("""WITH e AS (
        SELECT user_id, event_id, epoch_us(ts) AS us,
          CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
               OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
               THEN 1 ELSE 0 END AS new_s
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
      s AS (
        SELECT user_id, us, event_id,
          sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM e),
      g AS (SELECT user_id, session_id, count(*) AS n_events,
              (max(us) - min(us)) // 1000000 AS dur_sec
            FROM s GROUP BY user_id, session_id)
      SELECT user_id, count(*) AS n_sessions,
        CAST(sum(n_events) AS BIGINT) AS n_events,
        max(n_events) AS max_session_events,
        CAST(max(dur_sec) AS BIGINT) AS max_dur_sec
      FROM g GROUP BY user_id ORDER BY user_id"""))

  /** Ordered-step conversion funnel ([[Sessions.funnel]]) over the event
    * log: view → click (strictly after) → purchase (strictly after).
    * Timestamps normalize to integral epoch-micros (both fixture
    * flavors), so the strict-order compares are exact in both engines. */
  val eventFunnel = Q(
    "q_event_funnel",
    (s, dir) => {
      val ev0 = Tables.events(s, dir)
      val us = eventMicros(ev0)
      val ev = ev0.select(col("user_id"), col("event_type"), us.as("us"))
      Sessions.funnel(ev, "user_id", "us", "event_type",
          Seq("view", "click", "purchase"))
        .orderBy(col("stage"))
    },
    Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      s1 AS (SELECT user_id, min(CASE WHEN event_type = 'view' THEN us END) AS t1
             FROM e GROUP BY user_id),
      s2 AS (SELECT e.user_id, min(us) AS t2 FROM e JOIN s1 USING (user_id)
             WHERE event_type = 'click' AND us > t1 GROUP BY e.user_id),
      s3 AS (SELECT e.user_id, min(us) AS t3 FROM e JOIN s2 USING (user_id)
             WHERE event_type = 'purchase' AND us > t2 GROUP BY e.user_id),
      u AS (SELECT (SELECT count(t1) FROM s1) AS u0,
                   (SELECT count(*) FROM s2) AS u1,
                   (SELECT count(*) FROM s3) AS u2)
      SELECT * FROM (
        SELECT 1 AS stage, 'view' AS step, CAST(u0 AS BIGINT) AS users,
          CASE WHEN u0 > 0 THEN round(CAST(u0 AS DOUBLE) / u0, 6) END AS conv_from_first
        FROM u
        UNION ALL
        SELECT 2, 'click', CAST(u1 AS BIGINT),
          CASE WHEN u0 > 0 THEN round(CAST(u1 AS DOUBLE) / u0, 6) END FROM u
        UNION ALL
        SELECT 3, 'purchase', CAST(u2 AS BIGINT),
          CASE WHEN u0 > 0 THEN round(CAST(u2 AS DOUBLE) / u0, 6) END FROM u)
      ORDER BY stage"""))

  /** Weekly retention cohorts ([[Sessions.retentionCohorts]]): users
    * cohorted by first-active week (integral epoch-week buckets), the
    * classic growth-analytics matrix. Everything is integer until the
    * final ratio. */
  val retention = Q(
    "q_event_retention",
    (s, dir) => {
      val ev0 = Tables.events(s, dir)
      val us = eventMicros(ev0)
      val ev = ev0.select(col("user_id"), us.as("us"))
      Sessions.retentionCohorts(ev, "user_id", "us", 604800000000L)
        .orderBy(col("cohort_week"), col("week_offset"))
    },
    Some("""WITH e AS (SELECT user_id, epoch_us(ts) // 604800000000 AS w FROM events),
      uw AS (SELECT DISTINCT user_id, w FROM e),
      fw AS (SELECT user_id, min(w) AS f FROM uw GROUP BY user_id),
      ch AS (SELECT f, count(*) AS cohort_size FROM fw GROUP BY f),
      act AS (SELECT f, w - f AS week_offset, count(*) AS active_users
              FROM uw JOIN fw USING (user_id) GROUP BY f, w - f)
      SELECT f AS cohort_week, week_offset,
        CAST(active_users AS BIGINT) AS active_users,
        CAST(cohort_size AS BIGINT) AS cohort_size,
        round(CAST(active_users AS DOUBLE) / cohort_size, 6) AS retention
      FROM act JOIN ch USING (f) ORDER BY cohort_week, week_offset"""))

  /** DAU / new-user / cumulative growth curves
    * ([[Sessions.dailyActiveUsers]]), integral day buckets. */
  val dau = Q(
    "q_event_dau",
    (s, dir) => {
      val ev0 = Tables.events(s, dir)
      val us = eventMicros(ev0)
      Sessions.dailyActiveUsers(
          ev0.select(col("user_id"), us.as("us")), "user_id", "us")
        .orderBy(col("day"))
    },
    Some("""WITH ud AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d FROM events),
      fd AS (SELECT user_id, min(d) AS fd FROM ud GROUP BY user_id),
      dau AS (SELECT d, count(*) AS active_users FROM ud GROUP BY d),
      nu AS (SELECT fd AS d, count(*) AS new_users FROM fd GROUP BY fd)
      SELECT dau.d AS day, CAST(active_users AS BIGINT) AS active_users,
        CAST(coalesce(new_users, 0) AS BIGINT) AS new_users,
        CAST(sum(coalesce(new_users, 0)) OVER (ORDER BY dau.d
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_new_users
      FROM dau LEFT JOIN nu ON nu.d = dau.d ORDER BY day"""))

  /** Hourly anomaly screen: per (event_type, hour) counts z-scored
    * against the trailing 24 OBSERVED hours — the monitoring query a
    * pipeline runs on its own telemetry. Cross-engine exactness: the
    * window moments (Σn, Σn², count) are INTEGERS, and the mean/var/z
    * doubles are written token-for-token identically in both engines
    * (sqrt is IEEE-correctly-rounded, so identical inputs give identical
    * outputs). Frames need ≥12 observed baseline hours and positive
    * variance. Plan: one partial-agg count shuffle, then ONE window
    * shuffle on event_type, then TakeOrderedAndProject for the top-20. */
  val anomaly = Q(
    "q_event_anomaly",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev0 = Tables.events(s, dir)
      val us = eventMicros(ev0)
      val hc = ev0.select(col("event_type"), us.as("us"))
        .groupBy(col("event_type"), expr("us div 3600000000").as("h"))
        .agg(count(lit(1)).as("n"))
      val fr = Window.partitionBy(col("event_type")).orderBy(col("h"))
        .rowsBetween(-24, -1)
      hc.withColumn("sw", sum(col("n")).over(fr))
        .withColumn("sq", sum(col("n") * col("n")).over(fr))
        .withColumn("cw", count(lit(1)).over(fr))
        .where(col("cw") >= 12)
        .withColumn("mean", col("sw").cast("double") / col("cw"))
        .withColumn("varr",
          (col("sq").cast("double") - col("sw").cast("double") * col("sw") / col("cw"))
            / (col("cw") - 1))
        .where(col("varr") > 0)
        .withColumn("z", round((col("n") - col("mean")) / sqrt(col("varr")), 4))
        .orderBy(abs(col("z")).desc, col("event_type"), col("h"))
        .limit(20)
        .select(col("event_type"), col("h").as("hour"), col("n"),
          round(col("mean"), 4).as("mean"), col("z"))
    },
    Some("""WITH hc AS (SELECT event_type, epoch_us(ts) // 3600000000 AS h,
          CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY event_type, h),
      w AS (SELECT event_type, h, n,
          sum(n) OVER fr AS sw, sum(n*n) OVER fr AS sq, count(*) OVER fr AS cw
        FROM hc WINDOW fr AS (PARTITION BY event_type ORDER BY h
          ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
      zt AS (SELECT event_type, h, n,
          CAST(sw AS DOUBLE) / cw AS mean,
          (CAST(sq AS DOUBLE) - CAST(sw AS DOUBLE) * sw / cw) / (cw - 1) AS varr
        FROM w WHERE cw >= 12)
      SELECT event_type, h AS hour, n, round(mean, 4) AS mean,
        round((n - mean) / sqrt(varr), 4) AS z
      FROM zt WHERE varr > 0
      ORDER BY abs(round((n - mean) / sqrt(varr), 4)) DESC, event_type, h
      LIMIT 20"""))

  /** Session-scoped funnel ([[Sessions.sessionFunnel]], 30-minute gap):
    * conversion counted only when the steps happen inside ONE session —
    * the strict attribution reading next to q_event_funnel's lifetime
    * one. */
  val sessionFunnelQ = Q(
    "q_session_funnel",
    (s, dir) => {
      val ev0 = Tables.events(s, dir)
      val us = eventMicros(ev0)
      val ev = ev0.select(col("user_id"), col("event_id"), col("event_type"),
        us.as("us"))
      Sessions.sessionFunnel(ev, "user_id", "us", "event_id", "event_type",
          gapMicros = 1800000000L, Seq("view", "click", "purchase"))
        .orderBy(col("stage"))
    },
    Some("""WITH e AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
          CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
               OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
               THEN 1 ELSE 0 END AS new_s
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
      s AS (SELECT user_id, event_type, us,
          sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM e),
      f1 AS (SELECT user_id, sid, min(CASE WHEN event_type = 'view' THEN us END) AS t1
             FROM s GROUP BY user_id, sid),
      f2 AS (SELECT s.user_id, s.sid, min(us) AS t2
             FROM s JOIN f1 ON f1.user_id = s.user_id AND f1.sid = s.sid
             WHERE event_type = 'click' AND us > t1 GROUP BY s.user_id, s.sid),
      f3 AS (SELECT s.user_id, s.sid, min(us) AS t3
             FROM s JOIN f2 ON f2.user_id = s.user_id AND f2.sid = s.sid
             WHERE event_type = 'purchase' AND us > t2 GROUP BY s.user_id, s.sid),
      u AS (SELECT (SELECT count(t1) FROM f1) AS u0,
                   (SELECT count(*) FROM f2) AS u1,
                   (SELECT count(*) FROM f3) AS u2)
      SELECT * FROM (
        SELECT 1 AS stage, 'view' AS step, CAST(u0 AS BIGINT) AS sessions,
          CASE WHEN u0 > 0 THEN round(CAST(u0 AS DOUBLE) / u0, 6) END AS conv_from_first
        FROM u
        UNION ALL
        SELECT 2, 'click', CAST(u1 AS BIGINT),
          CASE WHEN u0 > 0 THEN round(CAST(u1 AS DOUBLE) / u0, 6) END FROM u
        UNION ALL
        SELECT 3, 'purchase', CAST(u2 AS BIGINT),
          CASE WHEN u0 > 0 THEN round(CAST(u2 AS DOUBLE) / u0, 6) END FROM u)
      ORDER BY stage"""))

  /** First-order Markov transition matrix ([[Sessions.transitionMatrix]])
    * over per-user event sequences: which event type follows which — the
    * next-event-prediction base table. The lag pairing is deterministic
    * (ties on ts broken by event_id in BOTH engines); counts integral,
    * one rounded double division per output row. */
  val eventTransitions = Q(
    "q_event_transitions",
    (s, dir) => {
      val ev0 = Tables.events(s, dir)
      val us = eventMicros(ev0)
      val ev = ev0.select(col("user_id"), col("event_id"), col("event_type"),
        us.as("us"))
      Sessions.transitionMatrix(ev, "user_id", "us", "event_id", "event_type")
        .orderBy(col("prev_type"), col("next_type"))
    },
    Some("""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        FROM events),
      p AS (SELECT event_type AS next_type,
          lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id)
            AS prev_type
        FROM e),
      m AS (SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
        FROM p WHERE prev_type IS NOT NULL GROUP BY prev_type, next_type)
      SELECT prev_type, next_type, n,
        round(CAST(n AS DOUBLE) /
          sum(n) OVER (PARTITION BY prev_type), 6) AS share
      FROM m ORDER BY prev_type, next_type"""))

  /** 7-day rolling distinct users (WAU-style): each distinct (user, day)
    * activity CONTRIBUTES to the 7 calendar days it falls inside — an
    * explode of `sequence(day, day+6)` — so the rolling-distinct count is
    * one partial-aggregable distinct per (window-day, user), NO range
    * join and NO nested loop. The classic exact sliding-distinct done
    * scalably: reduce to (user, day) first (the only shuffle that sees
    * raw events), fan out 7×, aggregate. Output trimmed to observed
    * days so the window is fully contained in the data span. */
  val rollingActive = Q(
    "q_rolling_active_users",
    (s, dir) => {
      val ev0 = Tables.events(s, dir)
      val us = eventMicros(ev0)
      val ud = ev0.select(col("user_id"), (us.cast("long")).as("us"))
        .select(col("user_id"), expr("us div 86400000000").as("day"))
        .distinct()
      val dau = ud.groupBy(col("day")).agg(countDistinct(col("user_id")).as("dau"))
      val wau = ud
        .select(col("user_id"), explode(sequence(col("day"), col("day") + 6)).as("day"))
        .groupBy(col("day")).agg(countDistinct(col("user_id")).as("wau7"))
      dau.join(wau, Seq("day"))
        .select(col("day"), col("dau"), col("wau7"))
        .orderBy(col("day"))
    },
    Some("""WITH ud AS (SELECT DISTINCT user_id,
          epoch_us(ts) // 86400000000 AS day FROM events),
      dau AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        FROM ud GROUP BY day),
      f AS (SELECT user_id, unnest(generate_series(day, day + 6)) AS day
        FROM ud),
      wau AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau7
        FROM f GROUP BY day)
      SELECT day, dau, wau7 FROM dau JOIN wau USING (day) ORDER BY day"""))

  /** Inter-event gap distribution per user (the data that justifies a
    * sessionization gap threshold): lag-window gaps in minutes, capped
    * at 120, bucketed — counts integral, one rounded division for the
    * cumulative share over the tiny histogram. */
  val gapHistogram = Q(
    "q_gap_histogram",
    (s, dir) => {
      val ev0 = Tables.events(s, dir)
      val us = eventMicros(ev0)
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      val gaps = ev0.select(col("user_id"), col("event_id"), us.as("us"))
        .select((col("us") - lag(col("us"), 1).over(w)).as("gap"))
        .where(col("gap").isNotNull)
        .select(least(expr("gap div 60000000"), lit(120L)).as("gap_min"))
      val g = gaps.groupBy(col("gap_min")).agg(count(lit(1)).as("n"))
      val cum = Window.orderBy(col("gap_min"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      g.select(col("gap_min"), col("n"),
          round(sum(col("n")).over(cum).cast("double") /
            sum(col("n")).over(Window.rowsBetween(
              Window.unboundedPreceding, Window.unboundedFollowing)), 6)
            .as("cum_share"))
        .orderBy(col("gap_min"))
    },
    Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
      d AS (SELECT us - lag(us) OVER (PARTITION BY user_id
            ORDER BY us, event_id) AS gap FROM e),
      b AS (SELECT least(gap // 60000000, 120) AS gap_min FROM d
        WHERE gap IS NOT NULL),
      g AS (SELECT gap_min, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY gap_min)
      SELECT gap_min, n,
        round(CAST(sum(n) OVER (ORDER BY gap_min
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) /
          sum(n) OVER (), 6) AS cum_share
      FROM g ORDER BY gap_min"""))

  /** Recency-weighted engagement score WITHOUT transcendentals: the
    * usual exponential decay hangs cross-engine parity on math-library
    * `exp` ulps, so the decay is a PIECEWISE INTEGER weight (≤7 days →
    * 4×, ≤30 days → 2×, older → 1×) anchored at the corpus max
    * timestamp, and the value column goes through DECIMAL so the
    * weighted sum is order-independent. Top 20 users by score. The
    * 1-row anchor broadcasts; everything else is one partial-aggregable
    * groupBy. */
  val decayScore = Q(
    "q_decay_score",
    (s, dir) => {
      val ev0 = Tables.events(s, dir)
      val us = eventMicros(ev0)
      val ev = ev0.select(col("user_id"), us.as("us"),
        col("value").cast("decimal(18,6)").as("v"))
      val anchor = ev.agg(max(col("us")).as("max_us"))
      ev.crossJoin(broadcast(anchor))
        .select(col("user_id"), col("v"),
          expr("(max_us - us) div 86400000000").as("age_d"))
        .select(col("user_id"),
          (col("v") * when(col("age_d") <= 7, 4L)
            .when(col("age_d") <= 30, 2L).otherwise(1L)).as("wv"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("wv")).cast("double"), 4).as("score"))
        .orderBy(col("score").desc, col("user_id"))
        .limit(20)
    },
    Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS us,
          CAST(value AS DECIMAL(18,6)) AS v FROM events),
      a AS (SELECT max(us) AS max_us FROM e),
      w AS (SELECT user_id,
          v * (CASE WHEN (max_us - us) // 86400000000 <= 7 THEN 4
                    WHEN (max_us - us) // 86400000000 <= 30 THEN 2
                    ELSE 1 END) AS wv
        FROM e, a)
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        round(CAST(sum(wv) AS DOUBLE), 4) AS score
      FROM w GROUP BY user_id ORDER BY score DESC, user_id LIMIT 20"""))

  def all: Seq[Q] = Seq(bm25TopK, ragContext, invertedIndex, cooccurLift, rankFusion, eventSeasonality,
    sessionizeBatch, eventFunnel, retention, dau, anomaly, sessionFunnelQ,
    eventTransitions, rollingActive, gapHistogram, decayScore)
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization: the batch twin of the streaming
  * session-window query (streaming/EventStreams.sessionize). A session is
  * a maximal run of one user's events with no gap above `gapMicros`.
  *
  * Plan shape: ONE shuffle on the user key feeds both windows (lag and
  * running sum share the partitioning and sort), then a partial-aggregable
  * groupBy on (user, session). At 100 TB this is the canonical
  * sessionize: state per task is one user's event run, the sort is
  * per-partition, and nothing global exists. Skewed users (bots with
  * millions of events) are the known hazard — the upstream skew tooling
  * (operators/Skew.scala) applies if one user dominates a partition.
  */
object Sessions {

  /** One row per (user, session): event count and duration.
    * `tsMicrosCol` must be epoch MICROseconds (a long) — integral, so the
    * gap compare and duration are exact in any engine. Ties on the
    * timestamp are broken by `seqCol` to keep session ids deterministic. */
  /** Row-level session assignment: the input columns plus `session_id`
    * (1-based per user). Both windows (lag flag + running sum) share ONE
    * user-key shuffle. The building block under [[sessionize]] and
    * [[sessionFunnel]]. */
  def assignSessions(events: DataFrame, userCol: String, tsMicrosCol: String,
      seqCol: String, gapMicros: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsMicrosCol), col(seqCol))
    events
      .withColumn("new_s",
        when(lag(col(tsMicrosCol), 1).over(w).isNull ||
          col(tsMicrosCol) - lag(col(tsMicrosCol), 1).over(w) > gapMicros, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("new_s")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("new_s")
  }

  def sessionize(events: DataFrame, userCol: String, tsMicrosCol: String,
      seqCol: String, gapMicros: Long): DataFrame = {
    assignSessions(events.select(col(userCol), col(tsMicrosCol), col(seqCol)),
        userCol, tsMicrosCol, seqCol, gapMicros)
      .groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsMicrosCol)).as("start_us"),
        max(col(tsMicrosCol)).as("end_us"))
  }

  /** Ordered-step funnel over an event log: how many users perform
    * `steps(0)`, then `steps(1)` STRICTLY after it, then `steps(2)`
    * strictly after that, and so on — the product-analytics conversion
    * query. Returns one row per stage: (stage, step, users,
    * conv_from_first).
    *
    * Plan: ONE groupBy(user) collects each step's event times into a
    * per-user array (map-side partial collect; per-user arrays are
    * bounded by that user's activity, the same per-user-state bound
    * sessionize lives with), then the step-chaining fold is a per-row
    * array expression — min of each step's times strictly after the
    * previous stage's time. The final stage counts aggregate a 1-row
    * frame. No joins, no window, one shuffle total. */
  def funnel(events: DataFrame, userCol: String, tsMicrosCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2 && steps.size == steps.distinct.size,
      s"funnel needs >= 2 distinct ordered steps; got $steps")
    funnelStages(events, Seq(col(userCol)), tsMicrosCol, typeCol, steps,
      countLabel = "users")
  }

  /** Shared funnel pipeline over a pre-grouped frame: per-step
    * collect_list arrays keyed by `groupCols`, the strictly-after
    * step-chaining fold, the 1-row stage totals, and the inline stage
    * rows. ONE home for [[funnel]] and [[sessionFunnel]] (r17 review —
    * a step-chaining fix applied to one 20-line copy could silently
    * miss the other); only the grouping key and the count's column
    * name differ between the two. */
  private def funnelStages(events: DataFrame,
      groupCols: Seq[org.apache.spark.sql.Column],
      tsMicrosCol: String, typeCol: String, steps: Seq[String],
      countLabel: String): DataFrame = {
    val arrays = events.groupBy(groupCols: _*)
      .agg(steps.zipWithIndex.map { case (st, i) =>
        collect_list(when(col(typeCol) === st, col(tsMicrosCol))).as(s"a$i")
      }.head, steps.zipWithIndex.tail.map { case (st, i) =>
        collect_list(when(col(typeCol) === st, col(tsMicrosCol))).as(s"a$i")
      }: _*)
    val staged = steps.indices.foldLeft(arrays) { (df, i) =>
      if (i == 0) df.withColumn("t0", array_min(col("a0")))
      else df.withColumn(s"t$i",
        array_min(filter(col(s"a$i"), x => x > col(s"t${i - 1}"))))
    }
    val totals = staged.agg(
      count(col("t0")).as("u0"),
      steps.indices.tail.map(i => count(col(s"t$i")).as(s"u$i")): _*)
    totals.select(inline(array(steps.zipWithIndex.map { case (st, i) =>
      struct(lit(i + 1).as("stage"), lit(st).as("step"),
        col(s"u$i").as(countLabel),
        when(col("u0") > 0, round(col(s"u$i").cast("double") / col("u0"), 6))
          .as("conv_from_first"))
    }: _*)))
  }

  /** Session-scoped funnel: like [[funnel]], but conversion must happen
    * WITHIN one session — the strict product-analytics reading, where a
    * view yesterday doesn't credit a purchase today. Counts SESSIONS per
    * stage. Same plan shape as the user funnel with the session
    * assignment's user-key shuffle in front: the grouped collect keys on
    * (user, session), so per-group state is one session's events — even
    * tighter than the per-user bound. */
  def sessionFunnel(events: DataFrame, userCol: String, tsMicrosCol: String,
      seqCol: String, typeCol: String, gapMicros: Long,
      steps: Seq[String]): DataFrame = {
    require(steps.size >= 2 && steps.size == steps.distinct.size,
      s"sessionFunnel needs >= 2 distinct ordered steps; got $steps")
    val sess = assignSessions(events, userCol, tsMicrosCol, seqCol, gapMicros)
    funnelStages(sess, Seq(col(userCol), col("session_id")), tsMicrosCol,
      typeCol, steps, countLabel = "sessions")
  }

  /** Cohort retention over an event log: users cohorted by their first
    * active period (integral `us div periodMicros` buckets — exact in any
    * engine), then per (cohort, offset) the count of cohort members still
    * active that many periods later, as a fraction of the cohort.
    *
    * Plan: distinct (user, period) — partial-aggregable, this is the only
    * pass over raw events; first-period and cohort-size aggregations run
    * over the already-tiny distinct table; everything downstream keys on
    * narrow integers. The retention ratio is the single double division
    * at the end. */
  def retentionCohorts(events: DataFrame, userCol: String,
      tsMicrosCol: String, periodMicros: Long): DataFrame = {
    require(periodMicros > 0, s"periodMicros must be positive, got $periodMicros")
    // integer division (`div`), NOT `/`: Spark `/` on longs is double
    // division, and a cast-back floor could disagree with the oracle's
    // exact `//` on a period boundary
    val uw = events.select(col(userCol).as("user"),
      expr(s"`$tsMicrosCol` div ${periodMicros}L").as("w")).distinct()
    val fw = uw.groupBy(col("user")).agg(min(col("w")).as("f"))
    val cohorts = fw.groupBy(col("f")).agg(count(lit(1)).as("cohort_size"))
    uw.join(fw, "user")
      .groupBy(col("f"), (col("w") - col("f")).as("week_offset"))
      .agg(count(lit(1)).as("active_users"))
      .join(cohorts, "f")
      .select(col("f").as("cohort_week"), col("week_offset"),
        col("active_users"), col("cohort_size"),
        round(col("active_users").cast("double") / col("cohort_size"), 6)
          .as("retention"))
  }

  /** Daily-active / new / cumulative-new user curves — the growth
    * dashboard's base table. One distinct (user, day) pass over raw
    * events (partial-aggregable); first-day and per-day counts reduce
    * that tiny table; the cumulative sum windows over DAYS (thousands of
    * rows after years of data — a deliberate single-partition window over
    * an already-reduced frame, not over events). All counts integral. */
  def dailyActiveUsers(events: DataFrame, userCol: String,
      tsMicrosCol: String): DataFrame = {
    val dayMicros = 86400000000L
    val ud = events.select(col(userCol).as("user"),
      expr(s"`$tsMicrosCol` div ${dayMicros}L").as("d")).distinct()
    val firstDay = ud.groupBy(col("user")).agg(min(col("d")).as("fd"))
    val dau = ud.groupBy(col("d")).agg(count(lit(1)).as("active_users"))
    val newU = firstDay.groupBy(col("fd").as("d"))
      .agg(count(lit(1)).as("new_users"))
    dau.join(newU, Seq("d"), "left")
      .select(col("d").as("day"), col("active_users"),
        coalesce(col("new_users"), lit(0L)).as("new_users"))
      .withColumn("cum_new_users", sum(col("new_users")).over(
        Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * `(prev_type, next_type, n, share)` where `share` is n normalized by
    * prev_type's outgoing total — the behavioral-model base table (next-
    * event prediction, bot detection via improbable transitions).
    *
    * Plan shape: ONE shuffle on the user key for the lag window (ties on
    * the timestamp broken by `seqCol` so the pairing is deterministic),
    * then a partial-aggregable groupBy on the pair — the per-prev totals
    * come from a second tiny window over the ALREADY-REDUCED matrix
    * (|event types|² rows), not over raw events. Counts are integral;
    * the one double division happens on the final row. */
  def transitionMatrix(events: DataFrame, userCol: String,
      tsMicrosCol: String, seqCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsMicrosCol), col(seqCol))
    val pairs = events
      .select(col(userCol), col(tsMicrosCol), col(seqCol),
        col(typeCol).as("next_type"),
        lag(col(typeCol), 1).over(w).as("prev_type"))
      .where(col("prev_type").isNotNull)
    val matrix = pairs.groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
    matrix.withColumn("share",
      round(col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("prev_type"))), 6))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators a feature/training pipeline needs that Spark SQL
  * lacks as built-ins: the point-in-time (as-of) join and the
  * point-in-interval range join.
  *
  * Both are implemented WITHOUT an inequality join: Spark plans a bare
  * `t1.t <= t2.t` predicate as a broadcast-nested-loop / cartesian product,
  * which is O(n*m) and a non-starter at 100 TB.
  *
  *   - As-of join: union-tag both sides, hash-partition by the join key,
  *     sort within partition by (time, side, tiebreak), forward-fill the
  *     right row with a running `last(ignoreNulls)` window. Cost: one
  *     shuffle of each side on the key + one in-partition sort — the same
  *     plan shape as a sort-merge join, and the running-frame window
  *     aggregates incrementally (O(rows) per partition).
  *   - Range join: quantize time into buckets at least as wide as the
  *     longest interval, explode each interval to the (<= 2) buckets it
  *     touches, equi-join points on the bucket, then filter exact
  *     containment. Turns the inequality into a shuffle hash join whose
  *     per-bucket fan-out is bounded by interval density, independent of
  *     total table size.
  */
object Joins {

  /** Backward (most-recent-prior, inclusive) as-of join.
    *
    * For each left row, attaches the right row with the greatest
    * `rightTime <= leftTime` for the same key; ties on `rightTime` break to
    * the greatest `tieBreak`. Left rows with no prior right row keep null
    * payload columns (left-outer semantics).
    *
    * @param leftOut   left columns to carry into the output (must exist)
    * @param rightPayload right columns attached to each matched left row
    */
  def asofJoinBackward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      leftOut: Seq[String],
      rightPayload: Seq[String],
      tieBreak: String): DataFrame = {
    val payloadCols =
      if (rightPayload.contains(tieBreak)) rightPayload else rightPayload :+ tieBreak
    val payloadStruct = struct(payloadCols.map(col): _*)
    val payloadType = right.select(payloadStruct).schema.head.dataType

    // side 0 = right, 1 = left: at equal times the right row sorts first,
    // so an exactly-simultaneous right row is visible to the left row
    // (inclusive <=). Among equal-time right rows the greatest tieBreak
    // sorts last and wins the forward fill.
    val taggedRight = right.select(
      col(rightKey).as("__k"), col(rightTime).as("__t"), lit(0).as("__side"),
      col(tieBreak).as("__tb"), payloadStruct.as("__r"))

    val leftCarried = left.select(
      (Seq(col(leftKey).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
        lit(null).cast(right.schema(tieBreak).dataType).as("__tb"),
        lit(null).cast(payloadType).as("__r")) ++ leftOut.map(col)): _*)
    val rightPadded = taggedRight.select(
      (taggedRight.columns.map(col).toSeq ++
        leftOut.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)

    // asc_nulls_FIRST: a right row with a NULL tieBreak must LOSE to any
    // non-null tieBreak at equal time (nulls_last sorted it after the
    // greatest value and the forward fill picked it — r17 review). The
    // left rows' padded NULL __tb is inert either way: __side is the
    // higher-priority key, so they sort after all right rows at a time.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    rightPadded.unionByName(leftCarried)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select((leftOut.map(col) ++
        rightPayload.map(c => col(s"__match.$c").as(c))): _*)
  }

  /** Point-in-interval range join, aggregated per point.
    *
    * Intervals are `[startCol, startCol + lengthDays)`; every point row is
    * joined to the intervals containing it via a bucket equi-join
    * (bucket width = interval length, so each interval spans at most two
    * buckets), then `aggs` run grouped by the point's id. Points contained
    * in no interval survive with count 0 / null sums (left-outer).
    *
    * `pointTime`/`intervalStart` must be timestamp columns; `lengthDays`
    * bounds every interval, which is what makes the bucket fan-out finite.
    */
  def rangeJoinAgg(
      points: DataFrame,
      intervals: DataFrame,
      pointId: String,
      pointTime: String,
      intervalStart: String,
      lengthDays: Int,
      aggs: Seq[Column]): DataFrame = {
    val secs = lengthDays * 86400L
    val pts = points.select(col(pointId), col(pointTime).as("__pt"),
      (unix_timestamp(col(pointTime)) / secs).cast("long").as("__b"))
    // an interval [s, s+len) touches bucket(s) and bucket(s+len-ε); with
    // bucket == len those are at most two distinct values. The end bucket
    // uses +secs, NOT +secs-1: unix_timestamp truncates sub-second starts,
    // and for a fractional s the interval reaches into bucket(s_trunc +
    // secs) — with -1 those contained points were silently missed. For
    // second-aligned starts this explodes one extra bucket whose rows all
    // fail the exact range predicate below (candidates only, no wrong rows).
    val ivs = intervals
      .withColumn("__s", col(intervalStart))
      .withColumn("__bs", (unix_timestamp(col("__s")) / secs).cast("long"))
      .withColumn("__be",
        ((unix_timestamp(col("__s")) + secs) / secs).cast("long"))
      .withColumn("__b", explode(array_distinct(array(col("__bs"), col("__be")))))
      .drop("__bs", "__be")

    pts.join(ivs,
        pts("__b") === ivs("__b") &&
          col("__pt") >= col("__s") &&
          col("__pt") < col("__s") + expr(s"INTERVAL $lengthDays DAYS"),
        "left")
      .groupBy(col(pointId))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Collapse-first point-in-interval range join for DECOMPOSABLE
    * aggregates (count / sum / min / max — anything with an associative
    * merge). Same semantics as [[rangeJoinAgg]], radically different
    * scaling.
    *
    * [[rangeJoinAgg]] joins every point to every interval containing it
    * BEFORE aggregating, so its intermediate is `Σ_points
    * (intervals open at that point)` rows. Replicate both sides R× (the
    * SCALE.md probe protocol, and what a crawl corpus does to popular
    * time ranges) and that intermediate grows R²× — at the 100× fixture
    * the plan probes ~10¹⁰ joined rows for a 10 M-row answer. The
    * count()-era bench never saw this because Catalyst ELIMINATED the
    * whole left-outer join when only the output rowcount was observed.
    *
    * Here the intervals are first collapsed per distinct start value:
    * `perStartAggs` pre-aggregates everything the final answer needs
    * (e.g. `count(*) as n`, `sum(price) as p`) grouped by start. Interval
    * starts are typically LOW-CARDINALITY (event dates, order dates,
    * window boundaries — ~2 400 distinct dates across any TPC-H scale,
    * invariant under replication), so the collapsed side is tiny and the
    * bucket join BROADCASTS: points never shuffle for the join at all.
    * Each point then meets at most the distinct starts in its ≤ 2
    * candidate buckets (≤ 2·lengthDays for date-grained starts) instead
    * of every interval row, and `mergeAggs` combines the pre-aggregated
    * slices per point (e.g. `sum(n)`, `sum(p)`). The only shuffle left is
    * the final per-point merge, which partial aggregation collapses to
    * one compact row per point before it moves.
    *
    * Intermediate size: `points × O(lengthDays)` — linear in points,
    * INVARIANT under interval replication. The fixture's 100× honest
    * wall for the same query/oracle dropped from join-fanout-bound to
    * scan-bound (see SCALE.md round-12 re-baseline).
    *
    * Points contained in no interval survive with null pre-aggregates
    * (left-outer): express "0 when empty" in `mergeAggs` (e.g.
    * `coalesce(sum(n), 0)`) exactly as with any outer-join aggregate.
    *
    * Contract: the collapsed side is O(distinct interval starts) rows and
    * is broadcast — callers with genuinely high-cardinality starts (more
    * distinct starts than fit an executor broadcast) should stay on
    * [[rangeJoinAgg]], whose shuffle join has no such bound.
    */
  def rangeJoinAggCollapsed(
      points: DataFrame,
      intervals: DataFrame,
      pointId: String,
      pointTime: String,
      intervalStart: String,
      lengthDays: Int,
      perStartAggs: Seq[Column],
      mergeAggs: Seq[Column]): DataFrame = {
    val secs = lengthDays * 86400L
    val pts = points.select(col(pointId), col(pointTime).as("__pt"),
      (unix_timestamp(col(pointTime)) / secs).cast("long").as("__b"))
    val collapsed = intervals
      .groupBy(col(intervalStart).as("__s"))
      .agg(perStartAggs.head, perStartAggs.tail: _*)
    // same ≤2-bucket explode (and the same +secs sub-second-truncation
    // reasoning) as rangeJoinAgg, applied to the collapsed side
    val ivs = collapsed
      .withColumn("__bs", (unix_timestamp(col("__s")) / secs).cast("long"))
      .withColumn("__be",
        ((unix_timestamp(col("__s")) + secs) / secs).cast("long"))
      .withColumn("__b", explode(array_distinct(array(col("__bs"), col("__be")))))
      .drop("__bs", "__be")

    pts.join(broadcast(ivs),
        pts("__b") === ivs("__b") &&
          col("__pt") >= col("__s") &&
          col("__pt") < col("__s") + expr(s"INTERVAL $lengthDays DAYS"),
        "left")
      .groupBy(col(pointId))
      .agg(mergeAggs.head, mergeAggs.tail: _*)
  }

  /** Interval-OVERLAP self-join: per equi-key, every pair of rows whose
    * fixed-length half-open windows `[start, start + lengthDays)` overlap
    * — the temporal-conflict detector (double bookings, concurrently
    * open orders, overlapping maintenance windows).
    *
    * A bare two-sided inequality (`sa < sb + L && sb < sa + L`) would
    * plan as a per-key nested loop; here both sides quantize starts into
    * buckets exactly one interval-length wide, so each interval touches
    * <= 2 buckets and overlapping pairs MUST meet in one of them:
    * the later start lies inside the earlier interval, hence inside one
    * of its buckets. The join is then a plain shuffle hash join on
    * (key, bucket) — per-bucket fan-out bounded by interval density,
    * never by table size.
    *
    * Each qualifying pair is emitted EXACTLY once without a distinct:
    * only the bucket containing the later start (`floor(max(sa,sb)/L)`,
    * touched by both sides per the argument above) emits it — the
    * ownership trick that replaces `dropDuplicates`' extra shuffle with
    * a free predicate.
    *
    * Output: (`key`, `a`, `b`, `overlap_secs`) with `a < b` in `idCol`
    * order; `overlap_secs = L - (max(s) - min(s))` is exact integer
    * arithmetic on epoch seconds (cross-engine reproducible).
    */
  def intervalOverlapSelfJoin(rows: DataFrame, keyCol: String, idCol: String,
      startCol: String, lengthDays: Int): DataFrame = {
    require(lengthDays >= 1, s"lengthDays must be >= 1, got $lengthDays")
    val secs = lengthDays * 86400L
    val t = rows.select(col(keyCol).as("__k"), col(idCol).as("__id"),
        col(startCol).as("__s"),
        (unix_timestamp(col(startCol)) / secs).cast("long").as("__bs"),
        // +secs (not +secs-1) for the same sub-second-truncation reason
        // as rangeJoinAgg: a phantom extra bucket only adds candidates,
        // a missed bucket loses pairs.
        ((unix_timestamp(col(startCol)) + secs) / secs).cast("long").as("__be"))
      .withColumn("__b", explode(array_distinct(array(col("__bs"), col("__be")))))
      .drop("__bs", "__be")
    val x = t.select(col("__k"), col("__id").as("a"),
      col("__s").as("__sa"), col("__b"))
    val y = t.select(col("__k").as("__k2"), col("__id").as("b"),
      col("__s").as("__sb"), col("__b").as("__b2"))
    val len = expr(s"INTERVAL $lengthDays DAYS")
    x.join(y,
        col("__k") === col("__k2") && col("__b") === col("__b2") &&
          col("a") < col("b") &&
          col("__sa") < col("__sb") + len &&
          col("__sb") < col("__sa") + len &&
          col("__b") === (unix_timestamp(greatest(col("__sa"), col("__sb"))) / secs)
            .cast("long"))
      .select(col("__k").as("key"), col("a"), col("b"),
        (lit(secs) - (unix_timestamp(greatest(col("__sa"), col("__sb"))) -
          unix_timestamp(least(col("__sa"), col("__sb"))))).as("overlap_secs"))
  }

  /** Per-key overlap-pair COUNT and overlap-seconds SUM, computed
    * collapse-first: equal to
    * `intervalOverlapSelfJoin(...).groupBy(key).agg(count, sum(overlap_secs))`
    * (JoinsSpec pins the equivalence) without ever materializing the
    * pair relation.
    *
    * Rows collapse to distinct `(key, start)` groups with multiplicities
    * BEFORE the bucket join, so the join runs over distinct timestamps
    * only — under R× exact replication the pair relation grows R²× while
    * this plan's join is invariant (the honest materialize() probe
    * showed the pair form spending ~7 min/run at the 100× fixture on
    * pairs this aggregate never needs). Pair counts come from
    * multiplicities: a close group pair (i < j) contributes nᵢ·nⱼ pairs
    * of identical overlap; a group with nᵢ ≥ 2 contributes C(nᵢ,2)
    * exact-tie pairs of full-length overlap. All integer arithmetic —
    * bit-identical to aggregating the pair relation.
    *
    * Output: (`key`, `n_overlaps`, `s_ov`) — keys with ≥ 1 pair only
    * (matching the pair form's groupBy semantics). */
  def intervalOverlapCountsCollapsed(rows: DataFrame, keyCol: String,
      startCol: String, lengthDays: Int): DataFrame = {
    require(lengthDays >= 1, s"lengthDays must be >= 1, got $lengthDays")
    val secs = lengthDays * 86400L
    val g = rows.groupBy(col(keyCol).as("__k"), col(startCol).as("__s"))
      .agg(count(lit(1)).as("__n"))
    // within-group: same-timestamp pairs overlap fully. DIV (integer
    // division) keeps the counts LongType end to end — Column./ is
    // double division and would leak a double into the BIGINT sums.
    val pairsPerGroup = expr("__n * (__n - 1) DIV 2")
    val within = g.where(col("__n") >= 2).select(col("__k"),
      pairsPerGroup.as("cnt"), (pairsPerGroup * lit(secs)).as("sov"))
    // cross-group: the same ≤2-bucket quantize + later-start-ownership
    // trick as intervalOverlapSelfJoin, over DISTINCT (key, start) rows;
    // starts are unique per key after the collapse, so `<` on the start
    // replaces the id tiebreak
    val t = g.withColumn("__bs", (unix_timestamp(col("__s")) / secs).cast("long"))
      .withColumn("__be",
        ((unix_timestamp(col("__s")) + secs) / secs).cast("long"))
      .withColumn("__b", explode(array_distinct(array(col("__bs"), col("__be")))))
      .drop("__bs", "__be")
    val xs = t.select(col("__k"), col("__s").as("__sa"), col("__n").as("__na"),
      col("__b"))
    val ys = t.select(col("__k").as("__k2"), col("__s").as("__sb"),
      col("__n").as("__nb"), col("__b").as("__b2"))
    val len = expr(s"INTERVAL $lengthDays DAYS")
    val cross = xs.join(ys,
        col("__k") === col("__k2") && col("__b") === col("__b2") &&
          col("__sa") < col("__sb") &&
          col("__sb") < col("__sa") + len &&
          col("__b") === (unix_timestamp(col("__sb")) / secs).cast("long"))
      .select(col("__k"), (col("__na") * col("__nb")).as("cnt"),
        (col("__na") * col("__nb") *
          (lit(secs) - (unix_timestamp(col("__sb")) - unix_timestamp(col("__sa")))))
          .as("sov"))
    within.unionByName(cross)
      .groupBy(col("__k").as("key"))
      .agg(sum(col("cnt")).as("n_overlaps"), sum(col("sov")).as("s_ov"))
  }
}

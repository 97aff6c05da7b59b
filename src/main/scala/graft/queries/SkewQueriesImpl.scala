package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Skew

/** Skew-mitigation queries ([[graft.operators.Skew]]): each rewrite
  * computes exactly what its naive form computes — the DuckDB oracle runs
  * the NAIVE form, so a hash-pass proves the salted plan is a pure
  * re-distribution with no semantic drift.
  */
object SkewQueriesImpl {

  /** Salted fact⋈dim join: lineitem spread over (suppkey, salt), supplier
    * replicated per salt — no reducer sees more than ~1/16 of a hot
    * supplier. Oracle = the plain join. */
  val skewJoin = Q(
    "q_skew_join",
    (s, dir) => {
      val big = Tables.lineitem(s, dir)
        .select(col("l_suppkey").as("suppkey"),
          col("l_extendedprice"), col("l_discount"))
      val small = Tables.supplier(s, dir)
        .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
      Skew.saltedJoin(big, small, "suppkey", salts = 16)
        .groupBy(col("s_nationkey"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("s_nationkey"))
    },
    Some("""SELECT s_nationkey,
      round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      count(*) AS n_items
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY s_nationkey ORDER BY s_nationkey"""))

  /** Hot-key aggregation: events collapse onto a handful of event_type
    * values. Distinct users per type via the two-stage (key, v) shuffle;
    * sum/count via the salted two-stage aggregate. Oracle = the plain
    * one-stage GROUP BY with count(DISTINCT). */
  val skewAgg = Q(
    "q_skew_agg",
    (s, dir) => {
      val e = Tables.events(s, dir)
      val users = Skew.distinctCountTwoStage(
        e.select(col("event_type"), col("user_id")),
        key = "event_type", valCol = "user_id", alias = "n_users")
      val sums = Skew.saltedSumCount(
        e.select(col("event_type"), col("value")),
        key = "event_type", valCol = col("value"), salts = 16)
        .select(col("event_type"),
          round(col("__sum"), 2).as("sum_value"),
          col("__cnt").as("n_events"))
      users.join(sums, "event_type").orderBy(col("event_type"))
    },
    Some("""SELECT event_type,
      count(DISTINCT user_id) AS n_users,
      round(sum(value), 2) AS sum_value,
      count(value) AS n_events
      FROM events GROUP BY event_type ORDER BY event_type"""))

  def all: Seq[Q] = Seq(skewJoin, skewAgg)
}

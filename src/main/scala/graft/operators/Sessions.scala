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
  def sessionize(events: DataFrame, userCol: String, tsMicrosCol: String,
      seqCol: String, gapMicros: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsMicrosCol), col(seqCol))
    val withFlag = events.select(col(userCol), col(tsMicrosCol), col(seqCol))
      .withColumn("new_s",
        when(lag(col(tsMicrosCol), 1).over(w).isNull ||
          col(tsMicrosCol) - lag(col(tsMicrosCol), 1).over(w) > gapMicros, 1L)
          .otherwise(0L))
    val withSession = withFlag.withColumn("session_id",
      sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withSession.groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsMicrosCol)).as("start_us"),
        max(col(tsMicrosCol)).as("end_us"))
  }
}

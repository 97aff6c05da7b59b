package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Multimodal
import graft.streaming.EventStreams

/** Streaming + multimodal queries. */
object MiscQueriesImpl {

  /** Structured Streaming windowed aggregate, drained to completion —
    * batch-parity oracle via DuckDB time_bucket. */
  val streamWindow = Q(
    "q_stream_window_agg",
    (s, dir) => EventStreams.windowedAggregate(s, dir),
    Some("""SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
      event_type, count(*) AS n, round(sum(value), 2) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY window_start, event_type"""))

  /** Stateful sessionization (flatMapGroupsWithState, event-time timeout).
    * Open sessions at end-of-stream stay open (append mode) → rows-only. */
  val streamSessionize = Q(
    "q_stream_sessionize",
    (s, dir) => EventStreams.sessionize(s, dir),
    None)

  /** Streaming exact-dedup (dropDuplicates under a watermark); the
    * emitted key set is deterministic → DISTINCT oracle. */
  val streamDedup = Q(
    "q_stream_dedup",
    (s, dir) => EventStreams.streamingDedup(s, dir),
    Some("""SELECT DISTINCT user_id, event_type FROM events
      ORDER BY user_id, event_type"""))

  /** Multimodal: binary content + typed metadata, batched partition-map
    * decode (stubbed codec), feature checksum output. Rows-only. */
  val multimodalDecode = Q(
    "q_multimodal_decode",
    (s, dir) => {
      val media = Multimodal.syntheticMediaTable(Tables.documents(s, dir))
      Multimodal.decodeFeatures(media, "content")
        .select(col("media_id"), col("meta.kind").as("kind"),
          length(col("content")).as("n_bytes"),
          round(aggregate(col("features"),
            lit(0.0), (acc, v) => acc + v.cast("double")), 4).as("feature_sum"))
        .orderBy(col("media_id"))
    },
    None)

  def all: Seq[Q] = Seq(streamWindow, streamSessionize, streamDedup, multimodalDecode)
}

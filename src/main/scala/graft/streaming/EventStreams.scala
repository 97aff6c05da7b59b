package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming operators over the events table.
  *
  * The reference has no streaming surface (SURVEY §2.c); these are the
  * engine-completeness additions for a training-data pipeline: windowed
  * aggregation with watermarking, and stateful sessionization via
  * flatMapGroupsWithState. Batch parity: the windowed aggregate has an
  * exact DuckDB oracle (time_bucket), which also pins the streaming
  * result because processAllAvailable() drains the bounded input fully.
  *
  * Scale: state is keyed by (window,type) / user — O(active keys), and
  * the watermark bounds retained state; both survive a 1000-executor
  * deployment unchanged.
  */
object EventStreams {

  /** events.ts has shipped in two fixture vintages: parquet
    * TIMESTAMP(NANOS) — which Spark has no type for and reads only as an
    * epoch-nanos long under the legacy nanosAsLong conf — and plain
    * TIMESTAMP (µs). The file source needs an explicit schema whose ts
    * field matches the file's physical type, so the reader probes the
    * footer once and normalizes: every consumer sees ts: TimestampType
    * regardless of vintage. */
  private def eventsFileSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** True when the stored ts column is TIMESTAMP(NANOS) (surfaces as a
    * long under nanosAsLong); false for a plain timestamp column. Sets
    * the conf itself so the probe is order-independent. Memoized per
    * fixture generation — the footer read is driver-side I/O and every
    * streaming query (both legs of a join, every bench rep) would
    * otherwise re-probe. */
  private val tsNanosCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  private def tsStoredAsNanos(spark: SparkSession, sfDir: String): Boolean = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tsNanosCache.computeIfAbsent(graft.Fixtures.key(sfDir, "events.parquet"),
      _ => spark.read.parquet(s"$sfDir/events.parquet")
        .schema("ts").dataType == LongType)
  }

  /** Runs a streaming drain with a bounded state-store count: each state
    * partition is its own store instance with per-batch maintenance, so
    * 32 stores for a 6-key aggregation is pure overhead. At real scale
    * this would be sized to key cardinality, not the session default. */
  private def withStatePartitions[T](spark: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, prev)
  }

  /** Stable per-(sfDir, fixture-generation) key for the fixed sink and
    * checkpoint dirs — see [[graft.Fixtures.key]] for why the source
    * file's fingerprint must participate. A regenerated fixture gets a
    * fresh checkpoint; an unchanged one still reuses its checkpoint
    * (the exactly-once demo). */
  private def fixtureKey(sfDir: String): String =
    graft.Fixtures.key(sfDir, "events.parquet")

  private def readEvents(spark: SparkSession, sfDir: String) = {
    if (tsStoredAsNanos(spark, sfDir)) {
      spark.readStream
        .schema(eventsFileSchema(LongType))
        .option("pathGlobFilter", "events.parquet") // file source needs a dir
        .parquet(sfDir)
        // integral `div`, NOT `/`: epoch nanos (~1.7e18) overflow a double's
        // 53-bit mantissa, so float division rounds by up to ±1 µs
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      spark.readStream
        .schema(eventsFileSchema(TimestampType))
        .option("pathGlobFilter", "events.parquet")
        .parquet(sfDir)
    }
  }

  /** Batch read of the same events table, ts normalized to TimestampType
    * like the streaming read. Probes the footer itself: any events read
    * that runs first in a fresh session (e.g. a SPARK_GRAFT_ONLY run of a
    * single query) must not depend on another query having set the
    * legacy conf. */
  def eventsBatch(spark: SparkSession, sfDir: String): DataFrame = {
    if (tsStoredAsNanos(spark, sfDir)) {
      spark.read.schema(eventsFileSchema(LongType))
        .option("pathGlobFilter", "events.parquet").parquet(sfDir)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      spark.read.schema(eventsFileSchema(TimestampType))
        .option("pathGlobFilter", "events.parquet").parquet(sfDir)
    }
  }

  /** 5-minute tumbling-window counts/sums by event_type, run as a real
    * streaming query (file source → watermark → window agg → memory sink)
    * drained to completion, returned as a batch DataFrame. */
  def windowedAggregate(spark: SparkSession, sfDir: String): DataFrame = withStatePartitions(spark, 8) {
    val name = s"graft_stream_${java.util.UUID.randomUUID().toString.take(8)}"
    val stream = readEvents(spark, sfDir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
    val q = stream.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
      .orderBy(col("window_start"), col("event_type"))
  }

  /** The DEPLOYMENT shape of the windowed aggregate: append-mode output
    * to a checkpointed parquet FILE SINK (exactly-once via the sink
    * manifest + checkpoint), then read back as a batch table. Append mode
    * emits only watermark-FINALIZED windows — rows whose window end ≤ the
    * final watermark (max event time, ms-truncated, − 10 min) — which is
    * what a downstream batch consumer of the sink directory would see.
    * The memory-sink variants above are the harness drain; this is the
    * durable path. */
  def windowedAggregateToParquet(spark: SparkSession, sfDir: String): DataFrame =
    withStatePartitions(spark, 8) {
      // FIXED dir per source: a fresh UUID dir per run leaked a full
      // output+checkpoint copy on every bench/verify invocation. Reusing
      // the checkpoint is also the exactly-once demo — a re-run finds no
      // new files and commits nothing, and the read-back is unchanged.
      // (Assumes one JVM per (sfDir) at a time, which is how the driver
      // and the local loop run.)
      val key = fixtureKey(sfDir)
      val outDir = s"${graft.Staging.dir("stream_sink")}/$key/out"
      val ckDir = s"${graft.Staging.dir("stream_sink")}/$key/ck"
      val stream = readEvents(spark, sfDir)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n"), col("sum_value"))
      val q = stream.writeStream
        .outputMode(OutputMode.Append())
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckDir)
        .start()
      try q.processAllAvailable()
      finally q.stop()
      // explicit schema: an all-late/empty input commits ZERO files and a
      // bare read would fail schema inference on the empty sink dir
      spark.read.schema(StructType(Seq(
          StructField("window_start", TimestampType),
          StructField("event_type", StringType),
          StructField("n", LongType),
          StructField("sum_value", DoubleType))))
        .parquet(outDir)
        .orderBy(col("window_start"), col("event_type"))
    }

  /** Streaming merge sink (foreachBatch upsert): the lakehouse ingestion
    * pattern — a BATCH-seeded snapshot (here: per-user profiles from
    * 'click' events) is kept current by merging each micro-batch's
    * per-user deltas with a full-outer join and writing the next snapshot
    * version. foreachBatch runs serially on the driver, and count/sum
    * profiles merge associatively, so the final snapshot is independent
    * of how the source splits into batches.
    *
    * Unlike the append sink (whose retained checkpoint IS the
    * exactly-once demo), the merge sink rebuilds snapshot v0 and starts a
    * fresh checkpoint each run — the in-flight snapshot pointer is
    * run-local state, so determinism here comes from rebuilding, not
    * resuming.
    *
    * At 100 TB the only change is the snapshot store (a table format
    * with commit atomicity instead of versioned dirs); the merge itself
    * is one key shuffle per batch, sized by the batch not the history. */
  def mergeToSnapshot(spark: SparkSession, sfDir: String): DataFrame = withStatePartitions(spark, 8) {
    val key = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    // jvmDir: wiped-per-run snapshots — see Staging.jvmRoot for why
    // mutate-per-run scratch is process-unique
    val root = new java.io.File(s"${graft.Staging.jvmDir("stream_merge")}/$key")
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(deleteRec)
      f.delete()
    }
    if (root.exists()) deleteRec(root)
    val snapDir = s"$root/snap"
    val ckDir = s"$root/ck"

    // sum_value is EXACT DECIMAL through the whole merge chain: the
    // snapshot accumulates seed + one delta per batch, and a double sum
    // would make the result depend on that addition order (vs the
    // oracle's single-pass sum). DECIMAL(38,6) addition is associative,
    // so the end state is batch-split independent bit-for-bit; the one
    // double-rounding happens at the final bucket output.
    val profileSchema = StructType(Seq(
      StructField("user_id", LongType),
      StructField("n_events", LongType),
      StructField("sum_value", DecimalType(38, 6))))
    def profile(df: DataFrame): DataFrame =
      df.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,6)"))
            .cast("decimal(38,6)").as("sum_value"))

    // batch-seeded base snapshot: click events only
    val batchEvents = eventsBatch(spark, sfDir)
    profile(batchEvents.where(col("event_type") === "click"))
      .write.mode("overwrite").parquet(s"$snapDir/v0")

    val current = new java.util.concurrent.atomic.AtomicReference[String](s"$snapDir/v0")
    // null-safe complement of the seed's === "click": a NULL event_type
    // must reach exactly one side or its user's counts silently drop
    val stream = readEvents(spark, sfDir).where(!(col("event_type") <=> "click"))
    val q = stream.writeStream
      .option("checkpointLocation", ckDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val delta = profile(batch)
        val snap = spark.read.schema(profileSchema).parquet(current.get)
        val merged = snap.alias("s")
          .join(delta.alias("d"), col("s.user_id") === col("d.user_id"), "full_outer")
          .select(
            coalesce(col("s.user_id"), col("d.user_id")).as("user_id"),
            (coalesce(col("s.n_events"), lit(0L)) +
              coalesce(col("d.n_events"), lit(0L))).as("n_events"),
            (coalesce(col("s.sum_value"), lit(0).cast("decimal(38,6)")) +
              coalesce(col("d.sum_value"), lit(0).cast("decimal(38,6)")))
              .cast("decimal(38,6)").as("sum_value"))
        val next = s"$snapDir/v${batchId + 1}"
        merged.write.mode("overwrite").parquet(next)
        current.set(next)
        ()
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()

    spark.read.schema(profileSchema).parquet(current.get)
      .groupBy((col("user_id") % 10).as("bucket"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("n_events")).as("sum_events"),
        sum(col("sum_value")).cast("double").as("sum_value"))
      .orderBy(col("bucket"))
  }

  /** STREAMING semantic dedup — the nightly-ingest CDC loop composed
    * from [[graft.operators.Similarity.semanticDedupIncremental]]: each
    * micro-batch of arriving embeddings is screened against the frozen
    * quantizer's corpus STATE (base corpus ∪ all docs accepted by
    * earlier batches), verdicts land in an append sink, and the accepted
    * docs are APPENDED as a per-batch delta under the state dir — so a
    * doc accepted in batch 0 catches its near-dup arriving in batch 2,
    * the verdict only the CDC composition produces. The corpus never
    * self-joins; per batch, cost is |batch|·E[cell occupancy] like the
    * one-shot incremental tier. State is append-only BY CONSTRUCTION —
    * accepted docs are purely additive, so each batch writes O(accepted)
    * delta rows and the state read is base + deltas; rewriting
    * base ∪ accepted per batch (the [[mergeToSnapshot]] recipe, which
    * MUTATES rows and genuinely needs a snapshot) would recopy the whole
    * corpus every micro-batch — fatal at 100 TB. Both the per-batch
    * delta and the per-batch sink partition are written with overwrite
    * keyed by batchId and discovered by listing, so a checkpoint-
    * replayed batch (foreachBatch is at-least-once) reproduces itself
    * instead of crashing or double-counting; at scale the delta dirs
    * map to append commits on a table format (atomic manifest swap)
    * with the same replay-idempotency contract.
    *
    * The arriving stream is a 4-file parquet source (maxFilesPerTrigger
    * = 1, mtimes forced so arrival order is deterministic) planted with
    * replayable arithmetic: batch 0 = negated corpus vectors (novel →
    * accepted), batch 1 = classic +0.5 twins (dup of base corpus),
    * batch 2 = echoes of batch 0's novels (dup of ACCEPTED state —
    * cross-batch), batch 3 = reversed vectors plus same-batch echoes
    * (novel + within-batch dup). Oracle: the unrolled batch replay in
    * [[graft.queries.SemDedupOracle.streamSql]]. */
  def semanticDedupStream(spark: SparkSession, sfDir: String,
      centroids: Array[Array[Double]], minCos: Double): DataFrame = withStatePartitions(spark, 8) {
    val key = graft.Fixtures.key(sfDir, "embeddings.parquet")
    // jvmDir: wiped-per-run state — a shared path would let a second
    // JVM's wipe race this one's base+delta reads (see Staging.jvmRoot)
    val root = new java.io.File(s"${graft.Staging.jvmDir("stream_semded")}/$key")
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(deleteRec)
      f.delete()
    }
    // rebuilt fresh each run, like the merge sink: the in-flight state
    // pointer is run-local, so determinism comes from rebuilding
    if (root.exists()) deleteRec(root)
    val inDir = new java.io.File(root, "in")
    val ckDir = s"$root/ck"
    val outDir = s"$root/out"
    val stateDir = s"$root/state"
    inDir.mkdirs()

    val docSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(DoubleType))))
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
    e.select(col("vec_id"), col("embedding")).write.parquet(s"$stateDir/base")

    // plant the four arrival batches (same arithmetic as the oracle)
    val v = col("embedding")
    val rev = reverse(v)
    val batches: Seq[DataFrame] = Seq(
      e.where(col("vec_id") < 10).select((col("vec_id") + 200000L).as("vec_id"),
        transform(v, x => -x).as("embedding")),
      e.where(col("vec_id") < 10).select((col("vec_id") + 200010L).as("vec_id"),
        concat(array(element_at(v, 1) + lit(0.5d)), slice(v, 2, 63)).as("embedding")),
      e.where(col("vec_id") < 10).select((col("vec_id") + 200020L).as("vec_id"),
        concat(array(-element_at(v, 1) + lit(0.05d)),
          transform(slice(v, 2, 63), x => -x)).as("embedding")),
      e.where(col("vec_id") < 5).select((col("vec_id") + 200030L).as("vec_id"),
        rev.as("embedding"))
        .unionByName(e.where(col("vec_id") < 5)
          .select((col("vec_id") + 200035L).as("vec_id"),
            concat(array(element_at(rev, 1) + lit(0.05d)),
              slice(rev, 2, 63)).as("embedding"))))
    val t0 = System.currentTimeMillis()
    batches.zipWithIndex.foreach { case (b, i) =>
      val tmp = new java.io.File(root, s"stage$i")
      b.coalesce(1).write.parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(inDir, f"batch$i%03d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      // forced, strictly increasing mtimes: the file source processes
      // oldest-first, so arrival order — and the batch replay — is
      // deterministic. Fail LOUDLY if the filesystem refuses: silent
      // failure would surface later as a confusing oracle mismatch.
      require(dst.setLastModified(t0 + i * 2000L),
        s"cannot set mtime on $dst — filesystem does not support " +
          "setLastModified; deterministic arrival order is unavailable here")
      deleteRec(tmp)
    }

    // append-only state: base corpus + one delta dir per batch, written
    // IDEMPOTENTLY (overwrite keyed by batchId) and DISCOVERED by
    // listing at read time. foreachBatch is at-least-once on restart: a
    // checkpoint-replayed batch b re-reads exactly base + delta_0..b-1
    // (its own half-written delta_b from the failed attempt is excluded
    // by the `< b` filter and then overwritten), so replay reproduces
    // the original verdicts instead of crashing on an existing dir or
    // double-counting state — no in-memory path list to lose on
    // restart. Reads use the explicit doc schema, so a delta whose
    // batch accepted nothing (parquet dir with no data files) is still
    // readable.
    def deltasBefore(b: Long): Seq[String] = {
      val kids = new java.io.File(stateDir).listFiles()
      if (kids == null) Nil
      else kids.toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("delta_"))
        .map(f => (f.getName.stripPrefix("delta_").toLong, f.getAbsolutePath))
        .filter(_._1 < b).sortBy(_._1).map(_._2)
    }
    val q = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir.getAbsolutePath)
      .writeStream
      .option("checkpointLocation", ckDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val corpusNow = spark.read.schema(docSchema)
          .parquet((s"$stateDir/base" +: deltasBefore(batchId)): _*)
        val verdicts = graft.operators.Similarity.semanticDedupIncremental(
            corpusNow, batch, "vec_id", "embedding", centroids, minCos)
          .localCheckpoint(true) // two consumers: sink write + accept delta
        // hive-style batch_id=<b> output dir: the sink write is also
        // idempotent under replay (overwrite replaces only this batch's
        // partition), and partition discovery restores batch_id on read
        verdicts.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        val accepted = batch.join(
          verdicts.where(!col("is_dup")).select(col("vid").as("vec_id")), "vec_id")
        accepted.select(col("vec_id"), col("embedding"))
          .write.mode("overwrite").parquet(s"$stateDir/delta_$batchId")
        ()
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()

    spark.read.parquet(outDir)
      .select(col("vid").as("vec_id"), col("batch_id"), col("cell"),
        col("dup_of_corpus"), col("dup_of_batch"), col("is_dup"))
      .orderBy(col("vec_id"))
  }

  /** Streaming exact-dedup: first arrival per (user_id, event_type) via
    * dropDuplicates under a watermark — the streaming face of the dedup
    * operator family. Only the key columns are emitted, so the result is
    * arrival-order independent (and DuckDB-oracle-checkable as DISTINCT).
    * State is O(distinct keys); with an event-time column in the key the
    * watermark would bound it — the pattern for unbounded streams. */
  def streamingDedup(spark: SparkSession, sfDir: String): DataFrame = withStatePartitions(spark, 8) {
    val name = s"graft_dedup_${java.util.UUID.randomUUID().toString.take(8)}"
    val stream = readEvents(spark, sfDir)
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("user_id", "event_type")
      .select(col("user_id"), col("event_type"))
    val q = stream.writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name).orderBy(col("user_id"), col("event_type"))
  }

  /** Stream-stream interval join: each click joins the same user's
    * purchases within the following 10 minutes — the canonical
    * two-stream time-bounded join (watermarks on both sides bound the
    * buffered state to the interval + delay; at scale state is
    * O(events inside the watermark window), not O(stream)). The bounded
    * input makes the match set deterministic, so a plain SQL self-join
    * with the same bounds is the oracle. */
  def clickPurchaseJoin(spark: SparkSession, sfDir: String): DataFrame =
    clickPurchaseJoinImpl(spark, sfDir, "inner", "graft_stream_join")

  /** Shared body of the inner and left-outer click x purchase interval
    * joins — ONE definition of the stream legs, watermarks, interval
    * condition, sink drain, and read-back schema, so the two join faces
    * (and the StreamingSpec assertion that the outer's matched subset
    * equals the inner) cannot drift apart. */
  private def clickPurchaseJoinImpl(spark: SparkSession, sfDir: String,
      joinType: String, dirPrefix: String): DataFrame = withStatePartitions(spark, 8) {
    val clicks = readEvents(spark, sfDir).where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("c_id"))
      .withWatermark("c_ts", "10 minutes")
    val purchases = readEvents(spark, sfDir).where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_id"), col("value"))
      .withWatermark("p_ts", "10 minutes")
    val joined = clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 10 MINUTES"),
      joinType)
    // PARQUET sink, not memory: a memory sink collects every joined row
    // onto the driver, and the join's output volume grows with the SQUARE
    // of per-user event density (a 20x-replicated probe OOM'd the JVM
    // exactly there). The file sink keeps rows executor-side; same
    // exactly-once fixed-dir pattern as the window sink.
    val key = fixtureKey(sfDir)
    val outDir = s"${graft.Staging.dir(dirPrefix)}/$key/out"
    val ckDir = s"${graft.Staging.dir(dirPrefix)}/$key/ck"
    val q = joined
      .select(col("c_user").as("user_id"), col("c_id"), col("p_id"),
        round(col("value"), 2).as("purchase_value"))
      .writeStream
      .outputMode(OutputMode.Append())
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckDir)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.read.schema(StructType(Seq(
        StructField("user_id", LongType),
        StructField("c_id", LongType),
        StructField("p_id", LongType),
        StructField("purchase_value", DoubleType))))
      .parquet(outDir)
      .orderBy(col("user_id"), col("c_id"), col("p_id"))
  }

  /** LEFT OUTER stream-stream interval join: every click, matched to the
    * same user's purchases in the following 10 minutes OR emitted with
    * nulls once the watermark proves no match can arrive — the
    * state-eviction semantics the inner join never exercises. A click's
    * null row appears when the watermark passes `c_ts + 10 min` (its
    * state expires); clicks inside the final watermark hold-back are
    * withheld forever on a bounded input, exactly like append-mode
    * windows — the oracle replays that cutoff. State and scale behavior
    * are the inner join's (bounded by the interval + delay). */
  def clickPurchaseLeftJoin(spark: SparkSession, sfDir: String): DataFrame =
    clickPurchaseJoinImpl(spark, sfDir, "left_outer", "graft_stream_ljoin")

  final case class Ev(ts: java.sql.Timestamp, user_id: Long, value: Double)
  final case class SessState(start: Long, last: Long, n: Long, sum: Double)
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
      n_events: Long, total_value: Double)

  /** Gap-based sessionization (30-min inactivity) with
    * flatMapGroupsWithState + event-time timeout. */
  /** Stream–static enrichment: the streaming events join a STATIC dim
    * table (customer) on the fly — at deployment scale the static side is
    * broadcast to every task, so the join adds no shuffle and no state
    * (stateless row-at-a-time enrichment; only the downstream aggregate
    * keeps state). The standard shape for tagging a live event stream
    * with slowly-changing reference data. */
  def streamStaticEnrich(spark: SparkSession, sfDir: String): DataFrame = withStatePartitions(spark, 8) {
    val name = s"graft_stream_${java.util.UUID.randomUUID().toString.take(8)}"
    val dim = graft.Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val enriched = readEvents(spark, sfDir)
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
    val q = enriched.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
      .orderBy(col("c_mktsegment"), col("event_type"))
  }

  def sessionize(spark: SparkSession, sfDir: String): DataFrame = withStatePartitions(spark, 8) {
    import spark.implicits._
    val events = readEvents(spark, sfDir)
      .withWatermark("ts", "1 hour")
      .select(col("ts"), col("user_id"), col("value"))
      .as[Ev]

    val gapMs = 30L * 60 * 1000
    val sessions = events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[Ev], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            // no-data batch after the watermark passed last+gap: close out
            val st = state.get
            state.remove()
            Iterator.single(Session(user, new java.sql.Timestamp(st.start), st.n, st.sum))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var out = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(st) if t - st.last <= gapMs =>
                  cur = Some(st.copy(last = t, n = st.n + 1, sum = st.sum + e.value))
                case Some(st) =>
                  out ::= Session(user, new java.sql.Timestamp(st.start), st.n, st.sum)
                  cur = Some(SessState(t, t, 1L, e.value))
                case None =>
                  cur = Some(SessState(t, t, 1L, e.value))
              }
            }
            cur.foreach { st =>
              state.update(st)
              state.setTimeoutTimestamp(st.last + gapMs)
            }
            out.reverseIterator
          }
      }

    val name = s"graft_sess_${java.util.UUID.randomUUID().toString.take(8)}"
    val q = sessions.writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
      .select(col("user_id"), col("session_start"), col("n_events"),
        round(col("total_value"), 2).as("total_value"))
      .orderBy(col("user_id"), col("session_start"))
  }
}

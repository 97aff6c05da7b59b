package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("windowed streaming aggregate equals the batch computation") {
    val streamed = EventStreams.windowedAggregate(spark, sfDir)
    val batch = EventStreams.eventsBatch(spark, sfDir)
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))
    val a = streamed.collect().map(_.toString)
    val b = batch.collect().map(_.toString)
    assert(a.length == b.length && a.sameElements(b),
      s"stream/batch divergence: ${a.length} vs ${b.length}")
  }

  test("parquet file sink: append-mode windows subset the complete-mode result " +
      "and the sink carries the exactly-once manifest") {
    val sink = EventStreams.windowedAggregateToParquet(spark, sfDir)
    val complete = EventStreams.windowedAggregate(spark, sfDir)
    val sinkRows = sink.collect().map(_.toString).toSet
    val allRows = complete.collect().map(_.toString).toSet
    assert(sinkRows.nonEmpty)
    assert(sinkRows.subsetOf(allRows), "file-sink rows must be finalized windows of the full set")
    assert(sinkRows.size < allRows.size,
      "windows past the final watermark must be withheld in append mode")
    // the sink directory carries the streaming commit manifest (_spark_metadata),
    // the mechanism that makes the parquet sink exactly-once
    val outDir = sink.inputFiles.head.replaceAll("/[^/]*$", "").replaceAll("^file:", "")
    assert(new java.io.File(outDir, "_spark_metadata").exists(),
      s"no _spark_metadata under $outDir")
  }

  test("foreachBatch merge sink: final snapshot equals the one-pass batch profile") {
    import org.apache.spark.sql.functions._
    // simulate a FRESH session (e.g. SPARK_GRAFT_ONLY=q_stream_merge_sink):
    // the merge sink's batch seed read must set nanosAsLong itself, not
    // inherit it from whichever query ran earlier in the session
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    val merged = EventStreams.mergeToSnapshot(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val batch = EventStreams.eventsBatch(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).as("sum_value"))
      .groupBy((col("user_id") % 10).as("bucket"))
      .agg(count(lit(1)).as("n_users"), sum(col("n_events")).as("sum_events"),
        sum(col("sum_value")).cast("double").as("sum_value"))
      .orderBy(col("bucket"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // DECIMAL merge chain: the end state is EXACTLY the one-pass result
    assert(merged.sameElements(batch))
    // the stream actually advanced the snapshot past the seeded v0
    // (snap dirs live under the per-JVM staging namespace since the
    // r11 scratch isolation — stable within this JVM, so visible here)
    val key = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    val versions =
      new java.io.File(s"${graft.Staging.jvmDir("stream_merge")}/$key/snap").list()
    assert(versions != null, "merge-sink snap dir missing under the staging root")
    assert(versions.exists(_ != "v0"), s"no merged snapshot version: ${versions.mkString(",")}")
  }

  test("state-store parity: the RocksDB provider yields identical streaming results") {
    // the production state backend for state larger than executor memory
    // (what a 100 TB streaming job runs on) must be a pure swap: same
    // windowed aggregate AND same stateful-sessionization output as the
    // default in-memory HDFS-backed provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val default = EventStreams.windowedAggregate(spark, sfDir).collect().map(_.toString)
    val defaultSess = EventStreams.sessionize(spark, sfDir).collect().map(_.toString)
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rocks = EventStreams.windowedAggregate(spark, sfDir).collect().map(_.toString)
      assert(rocks.sameElements(default), "windowed aggregate diverged on RocksDB")
      val rocksSess = EventStreams.sessionize(spark, sfDir).collect().map(_.toString)
      assert(rocksSess.sameElements(defaultSess), "sessionization diverged on RocksDB")
    } finally prev.fold(spark.conf.unset(key))(v => spark.conf.set(key, v))
  }

  test("left-outer interval join: inner rows preserved, nulls only for expired unmatched clicks") {
    val outer = EventStreams.clickPurchaseLeftJoin(spark, sfDir).collect()
    val inner = EventStreams.clickPurchaseJoin(spark, sfDir).collect()
      .map(_.toString).toSet
    val (matched, nulls) = outer.partition(r => !r.isNullAt(2))
    // the matched subset IS the inner join
    assert(matched.map(_.toString).toSet == inner)
    // a click never appears both matched and null-emitted
    val matchedClicks = matched.map(_.getLong(1)).toSet
    assert(nulls.forall(r => !matchedClicks.contains(r.getLong(1))))
    // null rows exist (bounded input leaves plenty of unmatched clicks)
    assert(nulls.nonEmpty)
    assert(nulls.forall(r => r.isNullAt(2) && r.isNullAt(3)))
  }

  test("streaming semantic dedup: state is append-only — base + one delta per batch, " +
      "no base file rewritten during the run") {
    val out = EventStreams.semanticDedupStream(spark, sfDir,
      graft.queries.IvfOracle.pinnedCentroids, 0.8)
    assert(out.count() > 0)
    // same state-root derivation as the implementation (jvmDir is
    // stable within this JVM, so the spec sees the run's state)
    val stateDir = new java.io.File(
      s"${graft.Staging.jvmDir("stream_semded")}/${graft.Fixtures.key(sfDir, "embeddings.parquet")}/state")
    val dirs = stateDir.listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.sameElements(Array("base", "delta_0", "delta_1", "delta_2", "delta_3")),
      s"state layout is ${dirs.mkString(",")} — expected base + exactly one delta per batch")
    // append-only BY CONSTRUCTION: base is written once before the
    // stream starts and never touched again, so every file under base/
    // must be strictly older than every file under the first delta (a
    // per-batch rewrite of base — the O(corpus) anti-pattern — would
    // leave base mtimes >= some delta's). This pins the O(Δ) claim the
    // way PlanSpec pins the IVF DPP claim.
    def mtimes(d: java.io.File): Seq[Long] = {
      val fs = d.listFiles()
      if (fs == null) Nil
      else fs.toSeq.flatMap(f => if (f.isDirectory) mtimes(f) else Seq(f.lastModified))
    }
    val baseMax = mtimes(new java.io.File(stateDir, "base")).max
    val deltaMins = (0 to 3).flatMap { b =>
      val ms = mtimes(new java.io.File(stateDir, s"delta_$b"))
      if (ms.isEmpty) None else Some(ms.min)
    }
    assert(deltaMins.nonEmpty)
    assert(deltaMins.forall(baseMax <= _),
      s"base was modified during the stream (base max mtime $baseMax vs delta mins $deltaMins)")
    // every ACCEPTED row lives in a delta: state rows = base + accepted
    val spark2 = spark
    val baseN = spark2.read.parquet(s"$stateDir/base").count()
    val acceptedN = out.where(!col("is_dup")).count()
    val stateN = spark2.read.option("recursiveFileLookup", "true")
      .parquet(stateDir.getAbsolutePath).count()
    assert(stateN == baseN + acceptedN,
      s"state rows $stateN != base $baseN + accepted $acceptedN — a delta holds non-accepted rows")
  }

  test("sessionization: session stats are consistent with raw events") {
    val sessions = EventStreams.sessionize(spark, sfDir)
    val rows = sessions.collect()
    assert(rows.nonEmpty)
    // every session has >= 1 event and positive value totals (values > 0 in data)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_events") >= 1)
      assert(r.getAs[Double]("total_value") > 0)
    }
    // sessions for a user don't overlap: starts are strictly increasing
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, ss) =>
      val starts = ss.map(_.getAs[java.sql.Timestamp]("session_start").getTime)
      assert(starts.sorted.sameElements(starts.distinct.sorted))
    }
  }
}

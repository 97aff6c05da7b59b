package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at the target scale
  * factor and prints ONE JSON line (parsed by the round driver).
  *
  * A preliminary untimed pass runs each query at sf0.001 first: it
  * JIT-compiles the kernels, janino-compiles the generated codegen
  * classes, and warms Spark's parquet/footer and broadcast machinery, so
  * the timed numbers measure steady-state query execution (what a
  * long-running 100 TB cluster job sees), not one-time JVM warmup.
  *
  * A NOISE SENTINEL brackets the timed suite: the same fixed
  * single-threaded in-memory loop (no Spark, no I/O, no allocation) is
  * timed immediately before and after the queries and emitted as
  * `calib_pre_sec` / `calib_post_sec` in both JSON lines. The loop's
  * cost is a property of one idle core, so on an uncontended box it is
  * a near-constant (~0.75 s here; interpretation documented in
  * BASELINE.md) — a calibration reading several times its historical
  * value means the box was contended and the suite total is
  * contaminated, not regressed. Round 10's driver bench recorded a 2.6×
  * phantom regression that only a same-commit re-run could disprove;
  * the sentinel makes that condition machine-readable in the record.
  * Because the bracket alone cannot see a mid-suite burst that subsides
  * before `calib_post` (that blind spot cost forensic hours in BOTH
  * rounds 10 and 11), the suite also (a) interleaves the same loop
  * every 25 queries (`calib_mid` array) and (b) stamps each query's
  * completion offset from suite start (`t_end` map in the detail line),
  * so any contaminated span is localizable to the queries it covers.
  */
object Bench {
  /** The fixed calibration workload: 4·10⁸ xorshift64 steps on one
    * thread. The serial dependency chain makes the wall time track
    * cycles actually delivered to this thread — exactly what box
    * contention steals. The accumulator is observed so the loop cannot
    * be dead-code-eliminated. */
  private[graft] def calibrate(): Double = {
    val t0 = System.nanoTime()
    if (calibrateChain(0x9E3779B97F4A7C15L) == 42L) print("") // observe: defeat DCE
    (System.nanoTime() - t0) / 1e9
  }

  private def calibrateChain(seed: Long): Long = calibrateChainN(seed, 400000000)

  private def calibrateChainN(seed: Long, steps: Int): Long = {
    var x = seed
    var acc = 0L
    var i = 0
    while (i < steps) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      acc += x
      i += 1
    }
    acc
  }

  /** Continuous in-suite contention trace (VERDICT r17 #2). The 25-query
    * `calib_mid` cadence leaves multi-minute blind spots: round 17's
    * loadavg-29 burst inflated three codeless queries invisibly to every
    * interleaved probe and needed manual isolated re-probes to
    * adjudicate. This daemon thread samples every ~3 s:
    *   - `t`    — seconds from suite start (same origin as `t_end`, so a
    *              sample joins directly to the query span it fell in);
    *   - `load` — 1-min /proc/loadavg (competing DEMAND);
    *   - `ping` — a 2·10⁷-step serial xorshift chain, 1/20 of
    *              [[calibrate]]'s (~35 ms): cycles actually DELIVERED to
    *              one thread at that instant. Measured r18: quiet-suite
    *              steady state reads 1.0-1.3x its own min; it inflates
    *              only when total demand OVER-saturates the box (8
    *              external threads against a light suite leave cores
    *              free and the ping stays ≤1.14x — which is why the
    *              bench_diff classifier pairs it with a loadavg-over-
    *              capacity clause using the `cpus` field).
    * Emitted detail-line-only as `"load_trace":[[t,load,ping],...]`
    * (~15 B/sample; a 600 s suite adds ~3 KB to the detail file, nothing
    * to the compact stdout line). `bench_diff --gate` joins the trace to
    * flagged movers' spans so an in-suite transient self-adjudicates
    * from the record alone (BASELINE.md "load trace"). The ping duty
    * cycle (~1.2% of one core) is below the box's idle jitter; it runs
    * during the mid-suite calibrations too, whose ~0.8 s windows see at
    * most one ping (≤4% of one of 32 cores — under their noise floor). */
  private[graft] final class LoadTrace(t0Nanos: Long, periodMs: Long = 3000)
      extends Thread("graft-load-trace") {
    setDaemon(true)
    @volatile private var stopped = false
    private val buf =
      new java.util.concurrent.ConcurrentLinkedQueue[(Double, Double, Double)]
    override def run(): Unit = {
      // untimed warmup: the first timed ping otherwise measures the
      // JIT compile of its own loop (observed 129 ms vs 32-42 ms steady
      // state — a 4x phantom sample on a quiet box)
      if (calibrateChainN(0x9E3779B97F4A7C15L, 20000000) == 42L) print("")
      while (!stopped) {
        val p0 = System.nanoTime()
        if (calibrateChainN(0x9E3779B97F4A7C15L, 20000000) == 42L) print("")
        val ping = (System.nanoTime() - p0) / 1e9
        buf.add(((p0 - t0Nanos) / 1e9, loadavg1(), ping)): Unit
        try Thread.sleep(periodMs) catch { case _: InterruptedException => () }
      }
    }
    def finish(): Seq[(Double, Double, Double)] = {
      stopped = true
      interrupt()
      join(2000)
      import scala.jdk.CollectionConverters._
      buf.asScala.toList.sortBy(_._1)
    }
  }

  /** PARALLEL calibration probe: `calibParThreads` threads of the same
    * xorshift chain, timed as one wall-clock span. The SERIAL sentinel is
    * blind to multicore contention — external load that leaves ≥1 core
    * free barely touches one thread while crushing a 32-way suite
    * (round 16: driver record read calib 0.82/0.85 ≈ clean while 71
    * codeless queries inflated 1.3–2.7×). This probe demands every core
    * at once, exactly like the suite: the CONTENTION INDEX
    * `calib_par/calib` reads ~1.2 on this box idle (31 threads on 32
    * cpus, measured r17: 1.14–1.22) and ~1.5 under just 8 external busy
    * threads — a >1.35 reading means the record is contaminated
    * (BASELINE.md "parallel contention index"; `bench_diff --gate`
    * REFUSES such records). */
  private[graft] val calibParThreads: Int =
    math.max(2, Runtime.getRuntime.availableProcessors() - 1)

  private[graft] def calibratePar(): Double = {
    val n = calibParThreads
    val sink = new java.util.concurrent.atomic.AtomicLong()
    val t0 = System.nanoTime()
    val threads = (0 until n).map { k =>
      val t = new Thread(() => { sink.addAndGet(calibrateChain(0x9E3779B97F4A7C15L + k)): Unit })
      t.start(); t
    }
    threads.foreach(_.join())
    if (sink.get() == 42L) print("") // observe: defeat DCE
    (System.nanoTime() - t0) / 1e9
  }

  /** 1-minute load average from /proc/loadavg — box-state provenance
    * alongside the probes (the probes measure cycles actually delivered;
    * loadavg names the competing demand). -1 when unreadable. NOTE: mid-
    * suite readings include OUR OWN 32-way Spark work — only `pre`
    * (taken before the timed suite) discriminates external load on its
    * own; `mid`/`post` are interpretable relative to the suite's own
    * expected load. */
  /** MEMORY-BANDWIDTH sentinel (round 18): GB/s of a single-thread
    * 4×256 MiB `System.arraycopy` over two PRE-ALLOCATED buffers (no
    * allocation, no GC inside the timed span). The CPU probes are
    * register-bound and BLIND to host-side memory-bandwidth
    * contention: r18 measured `q1_agg` — a bandwidth-bound 60 M-row
    * scan-aggregate — at 18.5 s isolated vs its committed 0.775 s with
    * IDENTICAL code (r17-worktree A/B), clean serial AND parallel
    * calibrations, the file fully page-cached, loadavg ~0; the only
    * abnormal reading was single-thread memcpy at 1.5 GB/s. A
    * co-tenant saturating the host's memory controllers steals scan
    * throughput 1:1 while the xorshift chains run full speed. Emitted
    * as `calib_bw_pre/post` (both lines, GB/s) and `calib_bw_mid`
    * (detail, every 25 queries); `bench_diff --gate` refuses pairs
    * whose bandwidth diverges >30% (scan-heavy movers would be box
    * noise). */
  private lazy val bwBufA = new Array[Byte](256 * 1024 * 1024)
  private lazy val bwBufB = new Array[Byte](256 * 1024 * 1024)

  private[graft] def calibrateBw(): Double = {
    val passes = 4
    // one untimed pass: first touch pays page faults, not bandwidth
    System.arraycopy(bwBufA, 0, bwBufB, 0, bwBufA.length)
    val t0 = System.nanoTime()
    var i = 0
    while (i < passes) {
      System.arraycopy(bwBufA, 0, bwBufB, 0, bwBufA.length)
      i += 1
    }
    val sec = (System.nanoTime() - t0) / 1e9
    if (bwBufB(0) == 1 && bwBufB(bwBufB.length - 1) == 2) print("") // observe
    val gb = passes.toDouble * bwBufA.length / (1L << 30)
    gb / sec
  }

  /** BOX cpu count from /proc/cpuinfo — the denominator /proc/loadavg is
    * read against. `availableProcessors()` is the JVM's (possibly
    * cgroup/taskset-limited) quota, not box capacity: under an 8-of-32
    * quota it would set the gate's load bar at 12 and mark perfectly
    * normal box-wide load as a burst (r18 review). Falls back to the
    * quota when /proc is unreadable (non-Linux). */
  private[graft] def boxCpus(): Int =
    try {
      val src = scala.io.Source.fromFile("/proc/cpuinfo")
      try {
        val n = src.getLines().count(_.startsWith("processor"))
        if (n > 0) n else Runtime.getRuntime.availableProcessors()
      } finally src.close()
    } catch { case _: Throwable => Runtime.getRuntime.availableProcessors() }

  private[graft] def loadavg1(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.getLines().next().split("\\s+")(0).toDouble finally src.close()
    } catch { case _: Throwable => -1.0 }

  /** Force FULL-result execution for timing. `df.count()` is the wrong
    * probe: Catalyst optimizes the count-aggregate plan, which legally
    * prunes every unreferenced column AND eliminates whole subtrees that
    * cannot change the row count — e.g. a left outer join against an
    * aggregate grouped by the join key (unique-key, no columns consumed)
    * is removed wholesale, so a query whose heavy work feeds such a join
    * timed only its cheap side (q_dedup_semantic's in-cell pair join was
    * invisible to count-based timing). Counting the materialized
    * `queryExecution.toRdd` executes the plan with the query's DECLARED
    * output schema — every projected expression, join, and final sort
    * actually runs, which is what "run this query" means for a consumer
    * that reads the result. */
  private[graft] def materialize(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.toRdd.count()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // all session config (incl. the ObjectHashAggregate fallback
    // threshold whose absence is a silent 36× slowdown) lives in
    // GraftSession — SessionConfigSpec pins that every entry point
    // routes through it
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // optional probe filter: SPARK_GRAFT_ONLY=q_a,q_b runs just those
    // queries (used by the SCALE.md 20x probes; unset = full suite)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names not registered: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    val selected = only.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.view.filterKeys(names).toMap)

    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir) {
      selected.foreach { case (_, fn) =>
        try materialize(fn(spark, warmDir)) catch { case _: Throwable => }
      }
    }
    // discard staged-view builds from the warmup fixture: provenance is
    // only wanted for builds charged inside a TIMED window below
    Staging.drainBuildEvents()

    val loadPre = loadavg1()
    val calibPre = calibrate()
    val calibParPre = calibratePar()
    val calibBwPre = calibrateBw()
    val cachePre = pageCacheGb()
    val suiteT0 = System.nanoTime()
    // continuous trace starts AFTER the pre calibrations (its ping must
    // not perturb them) and stops BEFORE the post ones
    val loadTrace = new LoadTrace(suiteT0)
    loadTrace.start()

    // best-of-2 per query: the box hosts other work, and the minimum of
    // repeated runs is the standard robust estimator of noise-free cost.
    // A failing query records an explicit "err" marker — a swallowed
    // exception would otherwise SHRINK the total and read as a speedup.
    // clearCache() between runs: operators that persist() intermediates
    // their result plan depends on (Graph orientation, Dedup signatures,
    // Fuzzy blocks) can't unpersist before returning, so without the
    // sweep those caches LEAK across the suite — later queries evict
    // earlier entries at random, and a repeat run may hit its first
    // run's surviving cache, timing a warm partial plan. Sweeping makes
    // every timed run the same self-contained job a cluster would
    // submit: full plan, own caching, no neighbors.
    // Name-sorted order makes the t_end offsets comparable across runs.
    val tEnd = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val calibMid = scala.collection.mutable.ListBuffer.empty[Double]
    val calibParMid = scala.collection.mutable.ListBuffer.empty[Double]
    val calibBwMid = scala.collection.mutable.ListBuffer.empty[Double]
    val loadMid = scala.collection.mutable.ListBuffer.empty[Double]
    // staged-view provenance (VERDICT r14 #3): any publishParquet build
    // that ran during a query's timed window is attributed to that query
    // in the detail line, so a cold-staging record is diffable against a
    // warm one instead of reading as a plan regression
    val stagedBuilds =
      scala.collection.mutable.LinkedHashMap.empty[String, Seq[(String, Double)]]
    val results: Map[String, Either[String, Double]] =
      selected.toSeq.sortBy(_._1).zipWithIndex.map { case ((name, fn), idx) =>
        if (idx > 0 && idx % 25 == 0) {
          loadMid += loadavg1()
          calibMid += calibrate()
          calibParMid += calibratePar()
          calibBwMid += calibrateBw()
        }
        // progress marker to STDERR (stdout is parsed by the round driver):
        // a task-thread OOM kills the whole local-mode JVM before the detail
        // JSON is written, and without this line the dead query is
        // unidentifiable from the log (cost a full 22-min 100x run to learn)
        System.err.println(f"[bench] ${idx + 1}%3d/${selected.size} $name start t=${(System.nanoTime() - suiteT0) / 1e9}%.1fs")
        // cross-query GC attribution: a heap full of the PREVIOUS query's
        // garbage charges its collection to whichever query runs next —
        // at the 100× fixture the multimodal block's decode garbage
        // inflated the next queries up to 14× (q_part_affinity 78.7 s
        // in-suite vs 5.7 s standalone, q_partitioned_prune 29.8 vs 2.4).
        // One explicit collection per query, OUTSIDE the timed window,
        // makes each query pay only for its own allocation — garbage
        // between a query's two runs stays its own and stays timed.
        System.gc()
        val runs = (1 to 2).map { _ =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          try {
            materialize(fn(spark, sfDir))
            Right((System.nanoTime() - t0) / 1e9)
          } catch {
            case e: Throwable =>
              Left(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
          }
        }
        tEnd(name) = (System.nanoTime() - suiteT0) / 1e9
        val built = Staging.drainBuildEvents()
        if (built.nonEmpty) stagedBuilds(name) = built
        val ok = runs.collect { case Right(t) => t }
        name -> (if (ok.nonEmpty) Right(ok.min) else Left(runs.head.swap.getOrElse("error")))
      }.toMap
    val traceSamples = loadTrace.finish()
    val calibPost = calibrate()
    val calibParPost = calibratePar()
    val calibBwPost = calibrateBw()
    val loadPost = loadavg1()
    val cachePost = pageCacheGb()

    // A SPARK_GRAFT_ONLY probe is a PARTIAL run: mark both JSON lines
    // filtered:true and write the detail to a probe-specific file, so a
    // filtered total can never be misread as a full-suite number and a
    // probe never overwrites the full-suite BENCH_DETAIL.json.
    val (fullLine, compactLine) = lines(results, sfDir, filtered = only.isDefined,
      calib = Some((calibPre, calibPost)), tEnd = tEnd.toMap,
      calibMid = calibMid.toList, cacheGb = Some((cachePre, cachePost)),
      stagedBuilds = stagedBuilds.toMap,
      calibPar = Some((calibParPre, calibParPost)),
      calibParMid = calibParMid.toList,
      calibBw = Some((calibBwPre, calibBwPost)),
      calibBwMid = calibBwMid.toList,
      loadavg = Some((loadPre, loadPost)), loadavgMid = loadMid.toList,
      loadTrace = traceSamples)
    val detailPath = detailFile(only.isDefined, sfDir)
    java.nio.file.Files.write(java.nio.file.Paths.get(detailPath),
      (fullLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(emitBlock(compactLine))
    spark.stop()
  }

  /** Redundant emission: the round driver stores a FIXED ~2 KB window of
    * the stdout tail, and sbt's trailing "[success] ..." block (~0.8-2.5 KB,
    * length varies with warnings) sits between our line and the end of
    * stdout — in rounds 3-5 a single line always landed with either its
    * head or its tail outside the stored window (`BENCH_r0{3,4,5}.json`
    * all record `parsed: null`). Printing IDENTICAL copies of the line
    * spaced ~1 KB apart across ~4.5 KB guarantees that any contiguous
    * 2 KB window positioned by an sbt trailer of 0-3.4 KB contains at
    * least one complete copy; a line-by-line JSON parse of the tail then
    * succeeds regardless of which copy survives. Pad lines carry no
    * braces so they can never half-match as JSON. */
  private[graft] def emitBlock(compactLine: String): String = {
    val pad = "bench-pad " + ("." * 120)
    // 7 copies spaced ~(line+pad) apart span ~5.3 KB: under the observed
    // driver window model (stdout[-4096:][:2000], inferred from the exact
    // truncation offsets in BENCH_r05) a full copy lands in the stored
    // range for any sbt-trailer length from 0 to ~3.4 KB.
    Iterator.fill(7)(compactLine).mkString("\n" + pad + "\n")
  }

  /** Detail-file naming: totals are only comparable within ONE fixture
    * size, so only the driver's canonical per-round fixture
    * (/root/testdata/sf0.1) writes the plain BENCH_DETAIL.json — a full
    * run at any other scale (20×/100× probes, local sf0.001 smokes)
    * goes to BENCH_DETAIL_<sanitized-sfdir>.json. Without this, a scale
    * probe or smoke run silently replaced the committed sf0.1 record
    * and its total read as a regression/speedup against a 100× smaller
    * or larger fixture. The comparison canonicalizes both paths first:
    * a trailing slash, relative path, or symlinked invocation of the
    * canonical fixture must still write the plain file, not silently
    * divert the round record to a suffixed one. */
  private[graft] def detailFile(filtered: Boolean, sfDir: String): String = {
    def canon(p: String): String =
      try new java.io.File(p).getCanonicalPath
      catch { case _: java.io.IOException => p }
    if (filtered) "BENCH_DETAIL_PROBE.json"
    else if (canon(sfDir) == canon("/root/testdata/sf0.1")) "BENCH_DETAIL.json"
    else "BENCH_DETAIL_" + sfDir.replaceAll("[^A-Za-z0-9._-]", "_") + ".json"
  }

  /** The two output forms: the full per-query JSON line (goes to
    * BENCH_DETAIL.json) and the compact stdout line. The round driver
    * keeps only a ~2 KB stdout TAIL, and sbt's trailing "[success] Total
    * time ..." line consumes the end of that window: in round 5 a
    * 1950-byte line was still truncated mid-object and parsed as null, so
    * the compact line budgets the queries map to 900 bytes — the slowest
    * queries that fit — keeping the whole line comfortably under 1.3 KB
    * regardless of suite size (BenchLineSpec pins this). */
  /** Page-cache size in GiB from /proc/meminfo — BOX-STATE PROVENANCE
    * for scale records: a scan-heavy suite timed against a cache-hot
    * /tmp/sfbig100 reads measurably faster than cold (part of the
    * round-13 1034 s → 900.6 s re-run delta was attributed to exactly
    * this drift), and without the marker two records in different cache
    * states silently gate-diff as if comparable. -1 when /proc/meminfo
    * is unreadable (non-Linux). */
  private[graft] def pageCacheGb(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/meminfo")
      try src.getLines().collectFirst {
        case l if l.startsWith("Cached:") =>
          math.round(l.trim.split("\\s+")(1).toDouble / (1024 * 1024) * 10) / 10.0
      }.getOrElse(-1.0)
      finally src.close()
    } catch { case _: Throwable => -1.0 }

  private[graft] def lines(
      results: Map[String, Either[String, Double]], sfDir: String,
      filtered: Boolean = false,
      calib: Option[(Double, Double)] = None,
      tEnd: Map[String, Double] = Map.empty,
      calibMid: Seq[Double] = Nil,
      cacheGb: Option[(Double, Double)] = None,
      stagedBuilds: Map[String, Seq[(String, Double)]] = Map.empty,
      calibPar: Option[(Double, Double)] = None,
      calibParMid: Seq[Double] = Nil,
      loadavg: Option[(Double, Double)] = None,
      loadavgMid: Seq[Double] = Nil,
      loadTrace: Seq[(Double, Double, Double)] = Nil,
      calibBw: Option[(Double, Double)] = None,
      calibBwMid: Seq[Double] = Nil): (String, String) = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", " ").replace("\r", " ")
    // Locale.ROOT: the f-interpolator uses the JVM default locale, and a
    // comma-decimal locale would make every number invalid JSON.
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.toSeq.sortBy(_._1).map {
      case (k, Right(v)) => s"\"" + k + "\":" + fmt(v)
      case (k, Left(e)) => s"\"" + k + "\":{\"err\":\"" + esc(e) + "\"}"
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, Left(_)) => k }
    val total = results.values.collect { case Right(v) => v }.sum
    val errField = if (errs.isEmpty) "" else s""","errors":${errs.size}"""
    val filteredField = if (filtered) ""","filtered":true""" else ""
    // noise sentinel (see object doc): same fixed loop timed before and
    // after the suite; goes in BOTH lines so the compact stdout record
    // the driver keeps is self-diagnosing about box contention.
    val calibField = calib.fold("") { case (pre, post) =>
      s""","calib_pre_sec":${fmt(pre)},"calib_post_sec":${fmt(post)}"""
    }
    // parallel contention probe (see calibratePar doc): same loop on
    // (cpus-1) threads; calib_par/calib is the contention index —
    // ~1.2 idle on a 32-cpu box, >1.35 ⇒ record contaminated. In BOTH
    // lines so the driver's compact record is self-diagnosing about the
    // multicore contention the serial sentinel cannot see.
    val calibParField = calibPar.fold("") { case (pre, post) =>
      s""","calib_par_pre_sec":${fmt(pre)},"calib_par_post_sec":${fmt(post)},"calib_par_threads":$calibParThreads"""
    }
    // memory-bandwidth sentinel (GB/s; see calibrateBw): DETAIL line
    // only — the one box-state axis the CPU probes cannot see (the
    // compact line's 800-byte window budget is pinned by BenchLineSpec,
    // and the gate reads the detail file anyway)
    val calibBwField = calibBw.fold("") { case (pre, post) =>
      s""","calib_bw_pre_gbps":${fmt(pre)},"calib_bw_post_gbps":${fmt(post)}"""
    }
    val calibBwMidField =
      if (calibBwMid.isEmpty) ""
      else calibBwMid.map(fmt).mkString(""","calib_bw_mid":[""", ",", "]")
    // box-load provenance: /proc/loadavg 1-min readings (detail only;
    // mid-suite values include our own Spark work — see loadavg1 doc)
    val loadavgField = loadavg.fold("") { case (pre, post) =>
      s""","loadavg_pre":${fmt(pre)},"loadavg_post":${fmt(post)}"""
    }
    val loadavgMidField =
      if (loadavgMid.isEmpty) ""
      else loadavgMid.map(fmt).mkString(""","loadavg_mid":[""", ",", "]")
    // continuous contention trace (detail line only — see LoadTrace):
    // [t offset, 1-min loadavg, ~35 ms serial ping seconds] every ~3 s
    val loadTraceField =
      if (loadTrace.isEmpty) ""
      else loadTrace.map { case (t, l, p) =>
        s"[${fmt(t)},${fmt(l)},${fmt(p)}]"
      }.mkString(""","load_trace":[""", ",", "]")
    // box-state provenance (detail line only): page-cache GiB before and
    // after the suite, so a gate diff across records taken in different
    // cache states is visible as such instead of reading as a plan change
    val cacheField = cacheGb.fold("") { case (pre, post) =>
      s""","page_cache_gb_pre":${fmt(pre)},"page_cache_gb_post":${fmt(post)}"""
    }
    // probe identity: timings before round 11 used df.count() (probe
    // "count"), which let Catalyst delete final sorts and prune unread
    // columns; every record since names the full-materialization probe
    // so cross-round totals are never silently compared across probes.
    val probeField = s""","probe":"toRdd""""
    // box capacity (detail line): the denominator for reading loadavg
    // samples — a 1-min load above this is demand the box cannot serve
    val cpusField = s""","cpus":${boxCpus()}"""
    // heap regime (detail line): totals are only comparable within one
    // heap size — at the 100x fixture the same plans measured 2-4x
    // slower GC-bound at 8g than at 96g (BASELINE.md "Heap regime")
    val heapField = s""","heap_gb":${Runtime.getRuntime.maxMemory() >> 30}"""
    // detail-line-only localization fields (see object doc): per-query
    // completion offset from suite start + interleaved mid-suite
    // calibrations — a contaminated calib_mid[i] brackets the queries
    // whose t_end falls in its span.
    val tEndField =
      if (tEnd.isEmpty) ""
      else tEnd.toSeq.sortBy(_._1)
        .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString(""","t_end":{""", ",", "}")
    val calibMidField =
      if (calibMid.isEmpty) ""
      else calibMid.map(fmt).mkString(""","calib_mid":[""", ",", "]")
    val calibParMidField =
      if (calibParMid.isEmpty) ""
      else calibParMid.map(fmt).mkString(""","calib_par_mid":[""", ",", "]")
    // staged-view provenance (detail line only): per-query map of
    // root-relative staged view → one-time build seconds charged inside
    // that query's timed window; absent when the staging root was warm.
    // A cross-record gate diff subtracts these before calling a mover a
    // regression (BASELINE.md "staged-view provenance").
    val stagedField =
      if (stagedBuilds.isEmpty) ""
      else stagedBuilds.toSeq.sortBy(_._1).map { case (q, views) =>
        "\"" + esc(q) + "\":" + views.map { case (p, sec) =>
          "\"" + esc(p) + "\":" + fmt(sec)
        }.mkString("{", ",", "}")
      }.mkString(""","staged_views_built":{""", ",", "}")
    val fullLine =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs$errField$filteredField$calibField$calibParField$loadavgField$cacheField$calibMidField$calibParMidField$loadavgMidField$loadTraceField$calibBwField$calibBwMidField$stagedField$tEndField$probeField$cpusField$heapField,"sf":"$sfDir"}"""
    val slowest = results.toSeq
      .collect { case (k, Right(v)) => (k, v) }.sortBy(-_._2)
    // 420-byte queries map keeps the whole line ≤ ~790 B even with the
    // r17 parallel-probe fields, so emitBlock's copy spacing (line + pad)
    // stays under the 2 KB window minus one line — the condition for
    // every window position to contain a full copy (BenchLineSpec pins
    // the 800-byte ceiling).
    val budget = 420 // bytes for the queries map
    val kept = scala.collection.mutable.ListBuffer.empty[String]
    var used = 0
    slowest.foreach { case (k, v) =>
      val entry = s"\"" + k + "\":" + fmt(v)
      if (used + entry.length + 1 <= budget) { kept += entry; used += entry.length + 1 }
    }
    val detail = detailFile(filtered, sfDir)
    val compactLine =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${kept.mkString("{", ",", "}")},"nqueries":${results.size}$errField$filteredField$calibField$calibParField$probeField,"sf":"$sfDir","detail":"$detail"}"""
    (fullLine, compactLine)
  }
}

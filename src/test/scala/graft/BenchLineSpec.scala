package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench output contract that broke three rounds in a row: the
  * stdout line must stay far below the round driver's ~2 KB stdout-tail
  * window (sbt's trailing "[success] ..." line also lives in that
  * window), must parse as JSON, and must keep the slowest queries.
  */
class BenchLineSpec extends AnyFunSuite {

  private def results(n: Int): Map[String, Either[String, Double]] =
    (0 until n).map { i =>
      f"q_some_rather_long_query_name_$i%03d" -> (Right(i * 0.137): Either[String, Double])
    }.toMap

  test("compact line stays under 800 bytes even for huge suites") {
    for (n <- Seq(0, 1, 73, 500)) {
      val (_, compact) = Bench.lines(results(n), "/root/testdata/sf0.1")
      assert(compact.length < 800, s"n=$n line is ${compact.length} bytes")
    }
  }

  test("compact line is valid JSON-shaped and keeps the slowest queries first") {
    val (_, compact) = Bench.lines(results(200), "/x")
    // balanced braces and quotes — a truncated map would break both
    assert(compact.count(_ == '{') == compact.count(_ == '}'))
    assert(compact.count(_ == '"') % 2 == 0)
    assert(compact.contains("\"metric\":\"total\""))
    assert(compact.contains("\"nqueries\":200"))
    // slowest query (highest index) must be in the kept map
    assert(compact.contains("q_some_rather_long_query_name_199"))
  }

  test("filtered probe runs are marked in both lines and use a probe detail file") {
    val (full, compact) = Bench.lines(results(3), "/x", filtered = true)
    assert(full.contains("\"filtered\":true"))
    assert(compact.contains("\"filtered\":true"))
    assert(compact.contains("\"detail\":\"BENCH_DETAIL_PROBE.json\""))
    val (fullAll, compactAll) = Bench.lines(results(3), "/root/testdata/sf0.1")
    assert(!fullAll.contains("filtered") && !compactAll.contains("filtered"))
    assert(compactAll.contains("\"detail\":\"BENCH_DETAIL.json\""))
  }

  test("emitBlock spaces full copies so any 2 KB tail window holds one") {
    val (_, compact) = Bench.lines(results(76), "/root/testdata/sf0.1")
    val block = Bench.emitBlock(compact)
    val lines = block.split("\n")
    val copies = lines.count(_ == compact)
    assert(copies >= 5, s"only $copies full copies")
    // pad lines must not look like JSON to a line-by-line parser
    assert(lines.filterNot(_ == compact).forall(l => !l.contains("{") && !l.contains("}")))
    // any contiguous 2000-byte window that starts within the block's span
    // (trailer 0..block-2000 bytes after us) must contain a full copy
    val n = block.length
    for (start <- 0 to (n - 2000) by 97) {
      val window = block.substring(start, start + 2000)
      assert(window.contains(compact), s"window at $start misses the line")
    }
  }

  test("noise-sentinel calibration lands in both lines and keeps the size budget") {
    val (full, compact) = Bench.lines(results(200), "/x", calib = Some((0.412, 1.337)))
    for (l <- Seq(full, compact)) {
      assert(l.contains("\"calib_pre_sec\":0.412"), l.take(200))
      assert(l.contains("\"calib_post_sec\":1.337"), l.take(200))
    }
    assert(compact.length < 800, s"calib fields pushed compact line to ${compact.length} bytes")
    // omitted when not measured (pure lines() callers like this spec)
    val (fullNo, compactNo) = Bench.lines(results(3), "/x")
    assert(!fullNo.contains("calib") && !compactNo.contains("calib"))
    // structural only: the loop runs and returns a positive wall time.
    // (No cross-run ratio assertion here — a timing-dependent unit test
    // would flake on a contended box, which is exactly the condition the
    // sentinel exists to FLAG; the contamination rule lives in the bench
    // record analysis per BASELINE.md, not in sbt test.)
    assert(Bench.calibrate() > 0)
  }

  test("parallel contention probe and loadavg provenance (r17) are recorded") {
    val (full, compact) = Bench.lines(results(200), "/x",
      calib = Some((0.82, 0.84)),
      calibPar = Some((0.98, 1.51)), calibParMid = Seq(1.02, 1.44),
      loadavg = Some((0.12, 8.5)), loadavgMid = Seq(31.2))
    // the par probe goes in BOTH lines: the driver's compact record must
    // be self-diagnosing about multicore contention (the serial sentinel
    // read ~1.1x idle in BENCH_r16 while 71 codeless queries inflated)
    for (l <- Seq(full, compact)) {
      assert(l.contains("\"calib_par_pre_sec\":0.980"), l.take(300))
      assert(l.contains("\"calib_par_post_sec\":1.510"), l.take(300))
      assert(l.contains("\"calib_par_threads\":" + Bench.calibParThreads), l.take(300))
    }
    // loadavg + mid arrays are detail-line-only (size budget)
    assert(full.contains("\"loadavg_pre\":0.120") && full.contains("\"loadavg_post\":8.500"))
    assert(full.contains("\"calib_par_mid\":[1.020,1.440]"))
    assert(full.contains("\"loadavg_mid\":[31.200]"))
    assert(!compact.contains("loadavg") && !compact.contains("calib_par_mid"))
    assert(compact.length < 800, s"par-probe fields pushed compact line to ${compact.length} bytes")
    // all omitted when not measured
    val (fullNo, compactNo) = Bench.lines(results(3), "/x")
    assert(!fullNo.contains("calib_par") && !fullNo.contains("loadavg"))
    assert(!compactNo.contains("calib_par"))
    // structural: the parallel loop runs, returns positive wall, and uses
    // at least 2 threads (no timing assertion — see the serial-probe note)
    assert(Bench.calibParThreads >= 2)
  }

  test("probe identity, per-query t_end, and mid-suite calibrations are recorded") {
    val (full, compact) = Bench.lines(results(5), "/x",
      calib = Some((0.7, 0.7)),
      tEnd = Map("q_some_rather_long_query_name_000" -> 1.25,
        "q_some_rather_long_query_name_001" -> 2.5),
      calibMid = Seq(0.751, 0.762))
    // both lines name the probe: totals across a probe change are not
    // comparable, and the compact line is the round driver's record
    assert(full.contains("\"probe\":\"toRdd\""))
    assert(compact.contains("\"probe\":\"toRdd\""))
    // detail line localizes contention: completion offsets + interleaved
    // calibrations; neither belongs in the size-budgeted compact line
    assert(full.contains("\"t_end\":{\"q_some_rather_long_query_name_000\":1.250,\"q_some_rather_long_query_name_001\":2.500}"))
    assert(full.contains("\"calib_mid\":[0.751,0.762]"))
    assert(!compact.contains("t_end") && !compact.contains("calib_mid"))
    assert(compact.length < 800, s"compact line grew to ${compact.length} bytes")
    // both optional fields omitted when absent — the line stays minimal
    val (fullNo, _) = Bench.lines(results(3), "/x")
    assert(!fullNo.contains("t_end") && !fullNo.contains("calib_mid"))
  }

  test("staged-view build provenance lands in the detail line only") {
    val (full, compact) = Bench.lines(results(5), "/x",
      stagedBuilds = Map(
        "q_some_rather_long_query_name_001" -> Seq(
          ("edges/v1/abc/pairs", 5.375), ("media/v3/abc", 0.25)),
        "q_some_rather_long_query_name_000" -> Seq(("ivf/v1/abc", 1.0))))
    // name-sorted queries, root-relative view paths, 3-dp seconds
    assert(full.contains("\"staged_views_built\":{" +
      "\"q_some_rather_long_query_name_000\":{\"ivf/v1/abc\":1.000}," +
      "\"q_some_rather_long_query_name_001\":{\"edges/v1/abc/pairs\":5.375," +
      "\"media/v3/abc\":0.250}}"), full)
    // the compact line is size-budgeted; provenance is detail-only
    assert(!compact.contains("staged_views_built"))
    // omitted entirely on a warm staging root — absence MEANS warm
    val (fullNo, _) = Bench.lines(results(3), "/x")
    assert(!fullNo.contains("staged_views_built"))
    // the detail line must stay machine-parseable with the field present
    assert(full.startsWith("{") && full.endsWith("}"))
  }

  test("detailFile canonicalizes the fixture path before comparing") {
    // trailing slash, relative-ish segments, and redundant dots must all
    // resolve to the canonical sf0.1 record, not a suffixed file
    assert(Bench.detailFile(filtered = false, "/root/testdata/sf0.1/") == "BENCH_DETAIL.json")
    assert(Bench.detailFile(filtered = false, "/root/testdata/./sf0.1") == "BENCH_DETAIL.json")
    assert(Bench.detailFile(filtered = false, "/root/testdata/x/../sf0.1") == "BENCH_DETAIL.json")
  }

  test("detail file is per-fixture: only canonical sf0.1 writes BENCH_DETAIL.json") {
    assert(Bench.detailFile(filtered = false, "/root/testdata/sf0.1") == "BENCH_DETAIL.json")
    assert(Bench.detailFile(filtered = true, "/root/testdata/sf0.1") == "BENCH_DETAIL_PROBE.json")
    assert(Bench.detailFile(filtered = false, "/tmp/sfbig100") == "BENCH_DETAIL__tmp_sfbig100.json")
    assert(Bench.detailFile(filtered = false, "/root/testdata/sf0.001") == "BENCH_DETAIL__root_testdata_sf0.001.json")
    // the compact line names the same file it writes
    val (_, compact) = Bench.lines(results(3), "/tmp/sfbig100")
    assert(compact.contains("\"detail\":\"BENCH_DETAIL__tmp_sfbig100.json\""))
  }

  test("full line carries every query and the error marker form") {
    val rs = results(73) + ("q_broken" -> (Left("Boom: it \"failed\"\nbadly"): Either[String, Double]))
    val (full, compact) = Bench.lines(rs, "/x")
    assert(rs.keys.forall(k => full.contains("\"" + k + "\"")))
    assert(full.contains("\"errors\":1") && compact.contains("\"errors\":1"))
    // escaped quote and newline must not break the JSON line
    assert(!full.contains("\n"))
  }
}

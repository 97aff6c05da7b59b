package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity
import graft.queries.IvfOracle

/** The split build/serve IVF contract, exercised DIRECTLY (round-9's
  * only coverage was through the composed query path):
  *
  *  1. build [[Similarity.ivfIndex]] into a cell-partitioned staging
  *     table, reload it COLD, probe with [[Similarity.ivfProbe]] — the
  *     result must equal the inline [[Similarity.ivfTopKPinned]] path
  *     bit-for-bit;
  *  2. the serve plan over the partitioned table must carry a DYNAMIC
  *     PARTITION PRUNING filter on the index scan (the 100 TB property:
  *     a probe touches nProbe/nCells of the files) and no assignment
  *     pass over raw corpus vectors;
  *  3. an EMPTY corpus publishes a readable index (the round-9
  *     `UNABLE_TO_INFER_SCHEMA` regression: zero rows → no data files →
  *     schema comes from the staging sidecar).
  */
class IvfServePlanSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.001"
  private def corpus = graft.Tables.embeddings(spark, sfDir)
    .select(col("vec_id"), col("embedding"))
  private def queries = corpus.where(col("vec_id") < 10)
  private val cents = IvfOracle.pinnedCentroids

  /** The staged index for THIS spec: its own subdir so the spec never
    * races or reuses the query path's staged table. */
  private lazy val stagedIndex = {
    val path = s"${graft.Staging.dir("ivf_spec")}/v1/${java.util.UUID.randomUUID}"
    graft.Staging.publishParquet(spark, path, partitionBy = Seq("cell")) {
      Similarity.ivfIndex(corpus, "vec_id", "embedding", cents)
    }
  }

  test("cold-reloaded staged index probes identically to the inline path") {
    val inline = Similarity.ivfTopKPinned(corpus, queries, "vec_id",
      "embedding", 5, cents).orderBy(col("qid"), col("rank")).collect()
    val staged = Similarity.ivfProbe(stagedIndex, queries, "vec_id",
      "embedding", 5, cents).orderBy(col("qid"), col("rank")).collect()
    assert(inline.nonEmpty)
    assert(staged.toSeq == inline.toSeq)
  }

  test("serve plan has dynamic partition pruning on the index scan, no assignment pass") {
    val probe = Similarity.ivfProbe(stagedIndex, queries, "vec_id",
      "embedding", 5, cents)
    val plan = probe.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("dynamicpruningexpression"),
      s"index scan lost its DPP filter:\n${plan.take(2000)}")
    // exactly TWO parquet scans in the MAIN plan: the staged index and
    // the query slice. A second embeddings scan there would be a
    // re-assignment pass over raw corpus vectors — the build/serve
    // split's whole point is that the serve path never pays it. (The
    // DPP subquery section re-lists the query-side scan; that is the
    // pruning filter build, not a corpus pass.)
    val mainPlan = plan.split("Subquery:", 2)(0)
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(mainPlan).size
    assert(scans == 2,
      s"expected 2 parquet scans (staged index + queries), got $scans:\n${plan.take(2000)}")
  }

  test("ivfScreen (collapse-first) equals ivfProbe row-for-row on a " +
      "full-corpus query side") {
    val byProbe = Similarity.ivfProbe(stagedIndex, corpus, "vec_id",
      "embedding", 5, cents, nProbe = 2)
      .orderBy(col("qid"), col("rank")).collect()
    val byScreen = Similarity.ivfScreen(stagedIndex, corpus, "vec_id",
      "embedding", 5, cents, nProbe = 2)
      .orderBy(col("qid"), col("rank")).collect()
    assert(byProbe.nonEmpty)
    assert(byScreen.toSeq == byProbe.toSeq)
  }

  test("ivfScreen is exact under R-fold exact replication (the SCALE.md " +
      "fixture protocol: duplicate groups, shifted ids)") {
    // replicate with shifted ids: each vector becomes a 3-member exact-
    // duplicate class — the collapse must reproduce the row form's
    // neighbor sets INCLUDING the cos=1.0 duplicate entries and the
    // (cos desc, vid asc) tie interleave, minus only each member itself
    val reps = 3
    val shift = 1000L
    val replicated = (0 until reps).map(r =>
      corpus.select((col("vec_id") + lit(r * shift)).as("vec_id"),
        col("embedding")))
      .reduce(_ unionByName _)
    val path = s"${graft.Staging.dir("ivf_spec")}/rep/${java.util.UUID.randomUUID}"
    val repIndex = graft.Staging.publishParquet(spark, path, partitionBy = Seq("cell")) {
      Similarity.ivfIndex(replicated, "vec_id", "embedding", cents)
    }
    val byProbe = Similarity.ivfProbe(repIndex, replicated, "vec_id",
      "embedding", 5, cents, nProbe = 2)
      .orderBy(col("qid"), col("rank")).collect()
    val byScreen = Similarity.ivfScreen(repIndex, replicated, "vec_id",
      "embedding", 5, cents, nProbe = 2)
      .orderBy(col("qid"), col("rank")).collect()
    assert(byProbe.nonEmpty)
    assert(byScreen.toSeq == byProbe.toSeq)
  }

  test("ivfScreen is exact when replication EXCEEDS k+1 (index-class " +
      "pruning actively discards deep vids)") {
    // reps=8 with k=5: each index class keeps only its k+1=6 smallest
    // member vids, so the pruning step really drops 2 members per class
    // — the subtlest step of the collapse's exactness argument (a deeper
    // member can never outrank k+1 classmates: same cos, larger vid).
    // Equality with the row-form probe must still hold bit-for-bit.
    val reps = 8
    val shift = 1000L
    val small = corpus.where(col("vec_id") < 40)
    val replicated = (0 until reps).map(r =>
      small.select((col("vec_id") + lit(r * shift)).as("vec_id"),
        col("embedding")))
      .reduce(_ unionByName _)
    val path = s"${graft.Staging.dir("ivf_spec")}/rep8/${java.util.UUID.randomUUID}"
    val repIndex = graft.Staging.publishParquet(spark, path, partitionBy = Seq("cell")) {
      Similarity.ivfIndex(replicated, "vec_id", "embedding", cents)
    }
    val byProbe = Similarity.ivfProbe(repIndex, replicated, "vec_id",
      "embedding", 5, cents, nProbe = 2)
      .orderBy(col("qid"), col("rank")).collect()
    val byScreen = Similarity.ivfScreen(repIndex, replicated, "vec_id",
      "embedding", 5, cents, nProbe = 2)
      .orderBy(col("qid"), col("rank")).collect()
    assert(byProbe.nonEmpty)
    assert(byScreen.toSeq == byProbe.toSeq)
  }

  test("ivfScreenAuto picks the collapse-first screen under its budget and " +
      "the row-form probe above it — identical rows either way") {
    val expected = Similarity.ivfScreen(stagedIndex, corpus, "vec_id",
      "embedding", 5, cents, nProbe = 2)
      .orderBy(col("qid"), col("rank")).collect()
    val roomy = Similarity.ivfScreenAuto(stagedIndex, corpus, "vec_id",
      "embedding", 5, cents, nProbe = 2)
      .orderBy(col("qid"), col("rank")).collect()
    // 1-byte budget forces the ivfProbe fallback (the unbounded-broadcast
    // guard): results must not change with the tier
    val tiny = Similarity.ivfScreenAuto(stagedIndex, corpus, "vec_id",
      "embedding", 5, cents, nProbe = 2, maxBroadcastBytes = 1L)
      .orderBy(col("qid"), col("rank")).collect()
    assert(expected.nonEmpty)
    assert(roomy.toSeq == expected.toSeq)
    assert(tiny.toSeq == expected.toSeq)
  }

  test("ivfScreenAuto hard cap: a forced LOW misestimate passes the budget " +
      "check but the IN-PLAN guard fails the query loudly at execution") {
    // budget sized for exactly 3 query classes; the corpus has far more
    // distinct vectors, so a row bound of 1 is a catastrophic under-count
    val dim = cents(0).length
    val budget = (16L * dim + 16L * 7) * 3
    val (capped, tier) = Similarity.ivfScreenAutoTiered(stagedIndex, corpus,
      "vec_id", "embedding", 5, cents, nProbe = 2,
      maxBroadcastBytes = budget, estimateOverride = Some(1L))
    assert(tier == "screen",
      s"a low misestimate takes the screen tier (the guard is in-plan), got $tier")
    // execution — not construction — trips the assert_true cap guard,
    // BEFORE anything broadcasts; the error names the ivfProbe escape
    val e = intercept[Throwable] { capped.collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("ivfScreenAuto")),
      s"cap-guard failure must be self-describing, got: ${messages(e).mkString(" | ")}")
    // the honest stats bound refuses the same budget UP FRONT
    val (_, tier2) = Similarity.ivfScreenAutoTiered(stagedIndex, corpus,
      "vec_id", "embedding", 5, cents, nProbe = 2, maxBroadcastBytes = budget)
    assert(tier2 == "probe")
    // and a roomy budget still reports the screen tier, whose guard is a
    // row-preserving no-op (covered by the tier-parity test above)
    val (_, tier3) = Similarity.ivfScreenAutoTiered(stagedIndex, corpus,
      "vec_id", "embedding", 5, cents, nProbe = 2)
    assert(tier3 == "screen")
  }

  test("ivfScreenAuto tier selection launches ZERO Spark jobs (stats-only " +
      "decision; construction and planning are job-free)") {
    val sc = spark.sparkContext
    // fixture DataFrames constructed BEFORE the listener: spark.read
    // .parquet launches a small schema-inference job per read, a cost
    // every query's table access pays identically — the r14 defect was
    // tier selection running DATA jobs (an estimate aggregate + a
    // confirm count) on top, and that is what must be zero.
    val index = stagedIndex
    val corp = corpus
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobNames = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          jobStart: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        jobNames.add(jobStart.stageInfos.map(_.name).mkString(" / "))
      }
    }
    sc.addSparkListener(l)
    try {
      val (df, tier) = Similarity.ivfScreenAutoTiered(index, corp,
        "vec_id", "embedding", 5, cents, nProbe = 2)
      // force full planning, the work explain()/PLANS.md generation does
      df.queryExecution.executedPlan
      assert(tier == "screen")
      // the listener bus is async: give queued events time to land
      Thread.sleep(1500)
      assert(jobs.get() == 0,
        s"tier selection / planning must not launch jobs, saw ${jobs.get()}: " +
          String.join(" || ", jobNames))
    } finally sc.removeSparkListener(l)
  }

  test("empty corpus publishes a readable, schema-exact index (r9 regression)") {
    val path = s"${graft.Staging.dir("ivf_spec")}/empty/${java.util.UUID.randomUUID}"
    val empty = graft.Staging.publishParquet(spark, path, partitionBy = Seq("cell")) {
      Similarity.ivfIndex(corpus.limit(0), "vec_id", "embedding", cents)
    }
    assert(empty.count() == 0)
    assert(empty.columns.toSeq == Seq("vid", "cvec", "cell"))
    val probed = Similarity.ivfProbe(empty, queries, "vec_id", "embedding", 5, cents)
    assert(probed.count() == 0)
  }
}

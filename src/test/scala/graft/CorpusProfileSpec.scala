package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for the staged corpus-duplication profile that drives
  * the collapse tier choice:
  *
  *   - the ratio is rows / distinct texts of documents.parquet;
  *   - it is a FROZEN measurement: staged once per fixture content key,
  *     so re-reading after an in-place corpus mutation (same key)
  *     returns the original value — regeneration that changes the file
  *     key gets a fresh measurement;
  *   - repeat reads are JOB-FREE (memo + sidecar, no Spark jobs) — the
  *     property that keeps collapse-tier plan construction job-free;
  *   - Tables.documents installs the ratio into the session conf for
  *     Dedup.collapseWorthwhile.
  */
class CorpusProfileSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def writeCorpus(dir: String, texts: Seq[String]): Unit =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("duplicationRatio = rows / distinct texts; frozen per content key; " +
      "repeat reads launch zero jobs; Tables.documents installs the conf") {
    val dir = java.nio.file.Files.createTempDirectory("graft-profile-spec").toString
    // 6 rows over 2 distinct texts -> ratio 3.0 (approx_count_distinct is
    // exact at this cardinality)
    writeCorpus(dir, Seq("aaa", "aaa", "aaa", "bbb", "bbb", "bbb"))
    val r1 = CorpusProfile.duplicationRatio(spark, dir)
    assert(math.abs(r1 - 3.0) < 0.1, s"expected ~3.0, got $r1")

    // repeat read: memoized, ZERO Spark jobs
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val r2 = CorpusProfile.duplicationRatio(spark, dir)
      Thread.sleep(500) // listener bus is async; a job event would land fast
      assert(r2 == r1)
      assert(jobs.get() == 0,
        s"repeat profile read must be job-free, saw ${jobs.get()} jobs")
    } finally spark.sparkContext.removeSparkListener(l)

    // Tables.documents installs the measured ratio into the session conf
    Tables.documents(spark, dir)
    val conf = spark.conf.get(graft.operators.Dedup.DuplicationRatioConf)
    assert(math.abs(conf.toDouble - r1) < 1e-9, s"conf carries $conf, ratio was $r1")

    Staging.deleteRecursively(new java.io.File(dir))
  }

  test("an in-place corpus rewrite that changes the content key gets a FRESH " +
      "measurement (r17: the memo is keyed by content key, not path)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-profile-spec2").toString
    writeCorpus(dir, Seq("x", "x", "y", "y"))
    val r1 = CorpusProfile.duplicationRatio(spark, dir)
    assert(math.abs(r1 - 2.0) < 0.1, s"expected ~2.0, got $r1")
    // rewrite with all-distinct texts: new parquet bytes -> new
    // Fixtures.key -> new memo entry AND new sidecar, so THIS JVM reads
    // the fresh generation's measurement (pre-r17 the memo was keyed by
    // the directory path and served the dead generation's ratio)
    writeCorpus(dir, Seq("a", "b", "c", "d"))
    val r2 = CorpusProfile.duplicationRatio(spark, dir)
    assert(math.abs(r2 - 1.0) < 0.1,
      s"in-place regeneration must re-measure (got $r2, stale would be $r1)")
    Staging.deleteRecursively(new java.io.File(dir))
  }

  test("NULL texts form ONE shared class: ratio counts them as a single " +
      "class, and an all-NULL corpus reads as maximally duplicated") {
    val dir = java.nio.file.Files.createTempDirectory("graft-profile-spec3").toString
    // 4 NULL texts + 2 distinct non-null -> 6 rows / 3 classes = 2.0
    // (v1 formula read 6/2 = 3.0: overstated duplication on null-heavy
    // corpora; an all-NULL corpus degenerated to the forced 1.0 fallback)
    Seq((0L, null), (1L, null), (2L, null), (3L, null), (4L, "a"), (5L, "b"))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = CorpusProfile.duplicationRatio(spark, dir)
    assert(math.abs(r - 2.0) < 0.1, s"expected ~2.0 (6 rows / 3 classes), got $r")
    // all-NULL corpus: one class, ratio = n/1 — collapse fires (its true
    // dedup shape IS one class), instead of the v1 forced 1.0
    val dir2 = java.nio.file.Files.createTempDirectory("graft-profile-spec4").toString
    Seq((0L, null: String), (1L, null: String), (2L, null: String))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val r2 = CorpusProfile.duplicationRatio(spark, dir2)
    assert(math.abs(r2 - 3.0) < 0.01, s"all-NULL corpus: expected 3.0, got $r2")
    Staging.deleteRecursively(new java.io.File(dir))
    Staging.deleteRecursively(new java.io.File(dir2))
  }

  test("two corpora in ONE session each tier off their OWN measured ratio, " +
      "regardless of load order (plan provenance, not a global conf)") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val dupDir = java.nio.file.Files.createTempDirectory("graft-profile-dup").toString
    val distinctDir = java.nio.file.Files.createTempDirectory("graft-profile-dis").toString
    writeCorpus(dupDir, Seq("t", "t", "t", "t", "u", "u"))        // ratio 3.0
    writeCorpus(distinctDir, (1 to 50).map(i => s"text-$i"))      // ratio 1.0
    val prevMode = spark.conf.getOption(graft.operators.Dedup.CollapseModeConf)
    spark.conf.set(graft.operators.Dedup.CollapseModeConf, "auto")
    try {
      // adversarial order: load the DUP corpus FIRST, the distinct one
      // SECOND — under the r16 global conf the last load won and the dup
      // corpus would have planned off ratio 1.0 (identity tier)
      val dupDocs = Tables.documents(spark, dupDir)
      val disDocs = Tables.documents(spark, distinctDir)
      def hasJoin(df: org.apache.spark.sql.DataFrame): Boolean =
        df.queryExecution.optimizedPlan.collect { case j: Join => j }.nonEmpty
      val dupMapping = graft.operators.Dedup.textClasses(dupDocs, "doc_id", "text")
      val disMapping = graft.operators.Dedup.textClasses(disDocs, "doc_id", "text")
      assert(hasJoin(dupMapping),
        "duplication-heavy corpus must plan the COLLAPSED tier (mapping join)")
      assert(!hasJoin(disMapping),
        "all-distinct corpus must plan the IDENTITY tier (no join) even " +
          "though the dup corpus was loaded in the same session")
      // outputs agree with the tiers: dup corpus has classes of size >1
      assert(dupMapping.where($"m" > 1).count() == 6)
      assert(disMapping.where($"m" =!= 1).count() == 0)
    } finally {
      prevMode.fold(spark.conf.unset(graft.operators.Dedup.CollapseModeConf))(
        v => spark.conf.set(graft.operators.Dedup.CollapseModeConf, v))
      Staging.deleteRecursively(new java.io.File(dupDir))
      Staging.deleteRecursively(new java.io.File(distinctDir))
    }
  }

  test("r18: an in-place rewrite is re-measured even when the TOP-LEVEL " +
      "directory mtime never moves (memo keyed on child metadata)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-profile-tick").toString
    writeCorpus(dir, Seq("p", "p", "q", "q"))                    // ratio 2.0
    val r1 = CorpusProfile.duplicationRatio(spark, dir)
    assert(math.abs(r1 - 2.0) < 0.1)
    val pq = new java.io.File(dir, "documents.parquet")
    val dirMtime = pq.lastModified()
    // rewrite with distinct texts, then pin the parquet DIRECTORY's
    // mtime back to the old generation's — the r17 memo keyed on
    // exactly (path, this mtime) and would serve the dead ratio; the
    // r18 metadata signature walks the CHILDREN (names/lengths/mtimes)
    writeCorpus(dir, (1 to 8).map(i => s"fresh-$i"))
    assert(pq.setLastModified(dirMtime), "test setup: pin dir mtime")
    val r2 = CorpusProfile.duplicationRatio(spark, dir)
    assert(math.abs(r2 - 1.0) < 0.1,
      s"same-tick in-place rewrite must re-measure (got $r2, stale = $r1)")
    Staging.deleteRecursively(new java.io.File(dir))
  }

  test("r18: ratioForPlan refuses a plan that also scans an UNMEASURED " +
      "parquet source (corpus ∪ staged batch must not tier off the " +
      "corpus-only measurement); pure self-joins still resolve") {
    val dir = java.nio.file.Files.createTempDirectory("graft-profile-mixed").toString
    val batchDir = java.nio.file.Files.createTempDirectory("graft-profile-batch").toString
    writeCorpus(dir, Seq("m", "m", "n", "n"))
    CorpusProfile.duplicationRatio(spark, dir)                   // registers
    (100L to 105L).map(i => (i, s"batch-$i")).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$batchDir/batch.parquet")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val batch = spark.read.parquet(s"$batchDir/batch.parquet")
    assert(CorpusProfile.ratioForPlan(docs).isDefined,
      "a measured corpus alone must resolve")
    assert(CorpusProfile.ratioForPlan(
        docs.alias("x").join(docs.alias("y"), Seq("text"))).isDefined,
      "a self-join of the measured corpus must still resolve")
    assert(CorpusProfile.ratioForPlan(docs.unionByName(batch)).isEmpty,
      "corpus ∪ unmeasured batch must fall back to the session conf")
    Staging.deleteRecursively(new java.io.File(dir))
    Staging.deleteRecursively(new java.io.File(batchDir))
  }
}

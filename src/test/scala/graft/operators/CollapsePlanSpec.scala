package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import org.scalatest.funsuite.AnyFunSuite

/** Plan/width pins for the text-class digest key (round 16):
  *
  *   - [[Dedup.classDigest]] is a TRUE 16-byte BinaryType value — the
  *     r15 key was md5()'s 32-char hex STRING, which put 32 bytes of
  *     UTF8 plus offsets on every collapse/dedup exchange (VERDICT r15
  *     item 1); the type and width are asserted, not just "not text";
  *   - the class-mapping consumers ([[Dedup.textClasses]] +
  *     rep-selection inside perClassValue) derive from ONE
  *     classAggregate call, so the executed plan physically reuses one
  *     digest-aggregate exchange instead of rebuilding the md5 scan 2-3
  *     times and hoping AQE dedups structurally-equal copies (VERDICT
  *     r15 item 2 / ADVICE r15 on non-deterministic inputs).
  */
class CollapsePlanSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox"), (1L, "the quick brown fox"),
    (2L, "lazy dog"), (3L, "lazy dog"), (4L, "lazy dog"),
    (5L, "entirely distinct content"), (6L, null.asInstanceOf[String]),
    (7L, "")).toDF("doc_id", "text")

  // plan pins run over the parquet fixture: a LocalRelation constant-folds
  // the digest projection into the scan, hiding the expression from the plan
  private lazy val pdocs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text"))

  /** Pin the collapse tier for a plan assertion: the shared test session
    * may carry a duplication-ratio conf installed by another suite's
    * Tables.documents call, and the auto tier would then bypass the very
    * plan shape under test. */
  private def withCollapseMode[A](mode: String)(body: => A): A = {
    spark.conf.set(Dedup.CollapseModeConf, mode)
    try body finally spark.conf.unset(Dedup.CollapseModeConf)
  }

  test("classDigest is BinaryType and exactly 16 bytes; null text -> null") {
    val out = docs.select(Dedup.classDigest(col("text")).as("fp"))
    assert(out.schema.head.dataType == BinaryType,
      s"class key must be binary, got ${out.schema.head.dataType}")
    val rows = out.collect()
    val nonNull = rows.filter(!_.isNullAt(0)).map(_.getAs[Array[Byte]](0))
    assert(nonNull.nonEmpty && nonNull.forall(_.length == 16),
      s"digest widths: ${nonNull.map(_.length).toSeq}")
    assert(rows.count(_.isNullAt(0)) == 1, "null text must digest to null")
    // and it IS the first 128 bits of SHA-256 (cross-checked against the
    // JDK, so the Spark expression chain can't silently change hash)
    val jdk = java.security.MessageDigest.getInstance("SHA-256")
      .digest("lazy dog".getBytes("UTF-8")).take(16)
    val one = docs.where(col("doc_id") === 2L)
      .select(Dedup.classDigest(col("text"))).head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(one, jdk), "digest != truncated SHA-256")
  }

  test("textClasses shuffles the binary digest — sha2 below the exchange, " +
      "text never a shuffle key") {
    val p = withCollapseMode("always") {
      Dedup.textClasses(pdocs, "doc_id", "text")
        .queryExecution.executedPlan.toString
    }
    assert(p.contains("sha2("), "digest must be computed below the exchange:\n" + p.take(1500))
    val parts = "hashpartitioning\\(([^)]*)".r.findAllMatchIn(p).map(_.group(1)).toSeq
    assert(parts.nonEmpty, p.take(1500))
    assert(parts.forall(k => !k.contains("text#")),
      s"class mapping must shuffle digests, not text: $parts")
  }

  test("identity tier (mode=never): textClasses plans ZERO exchanges and no digest") {
    val p = withCollapseMode("never") {
      Dedup.textClasses(pdocs, "doc_id", "text")
        .queryExecution.executedPlan.toString
    }
    assert(!p.contains("Exchange") && !p.contains("sha2("),
      "identity mapping must be a pure projection:\n" + p.take(1500))
  }

  test("ExactDeduper keeps the binary class key (no md5 hex string in the plan)") {
    try {
      val p = new ExactDeduper().transform(pdocs)
        .queryExecution.executedPlan.toString
      assert(p.contains("sha2("), "expected the classDigest key:\n" + p.take(1500))
      assert(!p.contains("md5("), "the 32-char hex key must be gone:\n" + p.take(1500))
    } finally
      // the transformer persisted its input and the release listener fires
      // on the first ACTION — this test only plans, so sweep the entry or
      // the reuse pin below plans against an InMemoryRelation
      spark.catalog.clearCache()
  }

  test("perClassValue consumers physically reuse ONE digest-aggregate exchange " +
      "(simhashTable: mapping join + rep selection)") {
    val df = withCollapseMode("always") {
      Dedup.simhashTable(pdocs, "doc_id", "text")
    }
    df.collect() // finalize AQE so stage reuse materializes
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"),
      "the digest aggregate's exchange must be physically reused:\n" + p.take(3000))
    // exactly one NON-reused exchange keyed on the fp digest: the lines
    // below a Reused node are not re-listed, so counting "Exchange
    // hashpartitioning(fp" over the final plan counts real builds
    val fpExchanges = p.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning(fp") && !l.contains("Reused"))
      .size
    assert(fpExchanges <= 1,
      s"expected at most one physical fp exchange, got $fpExchanges:\n" + p.take(3000))
  }

  test("gramClassesPlan (the set-similarity collapse stage) is ONE digest " +
      "aggregate with min_by rep text and NO JOIN — the r17 dead end stays out") {
    // The join-based rep-text selection (docs JOIN classes(rep)) planned
    // as a sort-merge join against a stat-less checkpoint and shipped the
    // WHOLE corpus's text by id (+6 s at the 100× fixture, SCALE.md r17).
    // The collapse stage must carry the rep text THROUGH the aggregate.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val plan = withCollapseMode("always") {
      Dedup.gramClassesPlan(pdocs, "doc_id", "text", 3)
    }.queryExecution.optimizedPlan
    assert(plan.collect { case j: Join => j }.isEmpty,
      "collapse stage must be join-free:\n" + plan.toString.take(2000))
    val aggs = plan.collect { case a: Aggregate => a }
    assert(aggs.size == 1, s"expected ONE digest aggregate, got ${aggs.size}")
    assert(plan.toString.contains("min_by"),
      "rep text must ride the aggregate via min_by:\n" + plan.toString.take(2000))
    // identity tier: no aggregate, no join — a pure projection
    val idPlan = withCollapseMode("never") {
      Dedup.gramClassesPlan(pdocs, "doc_id", "text", 3)
    }.queryExecution.optimizedPlan
    assert(idPlan.collect { case j: Join => j }.isEmpty
      && idPlan.collect { case a: Aggregate => a }.isEmpty,
      "identity tier must be a pure projection:\n" + idPlan.toString.take(2000))
  }
}

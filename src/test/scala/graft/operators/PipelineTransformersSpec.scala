package graft.operators

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The pipeline operators as ml.Transformer stages: composition inside a
  * Pipeline, persistence, and the dedup keep-smallest policy.
  */
class PipelineTransformersSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
    (3L, "completely different words about spark histograms and gradient boosting trees"),
    (4L, "el rapido zorro marron salta sobre el perro perezoso cerca del rio hoy")
  ).toDF("doc_id", "text")

  test("ExactDeduper keeps the lowest id per identical text") {
    val out = new ExactDeduper().transform(docs)
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(0L, 2L, 3L, 4L))
    assert(out.columns.toSeq == docs.columns.toSeq, "schema must be unchanged")
  }

  test("ExactDeduper null-id contract: null-id rows are DROPPED (documented " +
      "min-id keep rule), non-null groups unaffected") {
    // the scaladoc'd contract: min() skips nulls and a null id never
    // equi-joins back — callers without a reliable id mint one upstream.
    // This pin makes the contract a test, not just a comment.
    val withNull = docs.unionByName(Seq(
      (Option.empty[Long], "a row with no id at all, unique text of its own"))
      .toDF("doc_id", "text"))
    val out = new ExactDeduper().transform(withNull)
    val ids = out.select("doc_id").collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getLong(0))).toSet
    assert(ids == Set(Some(0L), Some(2L), Some(3L), Some(4L)),
      "null-id row must drop; non-null dedup groups must be untouched")
  }

  test("MinHashDeduper drops near-duplicates, keeps unrelated docs") {
    val out = new MinHashDeduper().setMinJaccard(0.3).transform(docs)
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.contains(0L) && ids.contains(3L) && ids.contains(4L))
    assert(!ids.contains(1L), "exact dup must be dropped")
    assert(!ids.contains(2L), "near dup must be dropped")
  }

  test("full pipeline: tag language -> score quality -> dedup; save/load") {
    val pipeline = new Pipeline().setStages(Array(
      new LanguageTagger(),
      new TextQualityScorer(),
      new MinHashDeduper().setMinJaccard(0.3)))
    val model = pipeline.fit(docs)
    val out = model.transform(docs)
    assert(out.columns.contains("lang_pred") && out.columns.contains("quality"))
    val byId = out.collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(0L).getAs[String]("lang_pred") == "en")
    assert(byId(4L).getAs[String]("lang_pred") == "es")
    assert(byId.keySet == Set(0L, 3L, 4L))

    val dir = java.nio.file.Files.createTempDirectory("graft-ops-pipe").toString + "/p"
    model.write.overwrite().save(dir)
    val loaded = PipelineModel.load(dir)
    val out2 = loaded.transform(docs)
    assert(out2.collect().map(_.getAs[Long]("doc_id")).toSet == Set(0L, 3L, 4L))
  }

  test("EmbeddingNormalizer emits unit vectors") {
    val df = Seq((0L, Array(3.0f, 4.0f))).toDF("vec_id", "embedding")
    val out = new EmbeddingNormalizer().transform(df)
      .select("unit_embedding").collect()(0).getSeq[Double](0)
    assert(math.abs(out(0) - 0.6) < 1e-9 && math.abs(out(1) - 0.8) < 1e-9)
  }

  test("SemanticDeduper drops the more-central member of each near-dup pair") {
    // same geometry as SemDedupSpec's first case: in cell 0 only doc 2
    // survives; the lone cell-1 doc 3 is untouched
    val vecs = Seq(
      (1L, Seq(10.0, 1.0)), (2L, Seq(8.0, 1.2)),
      (3L, Seq(0.5, 5.0)), (4L, Seq(9.0, -1.0))
    ).toDF("vec_id", "embedding")
    val out = new SemanticDeduper().setMinCos(0.95)
      .setCentroids(Array(Array(1.0, 0.0), Array(0.0, 1.0)))
      .transform(vecs)
    assert(out.collect().map(_.getAs[Long]("vec_id")).toSet === Set(2L, 3L))
    assert(out.columns.toSeq === vecs.columns.toSeq) // schema passes through
  }

  test("cache lifecycle: the dedup Transformers' internal persist is " +
      "released once the consuming action completes; opt-out keeps it") {
    // DEDICATED rows, not `docs`: the release listener matches by
    // logical-plan sameResult, so a stale listener from an earlier test
    // over the shared `docs` plan could otherwise race this test's cache.
    val lcdocs = Seq(
      (10L, "lifecycle alpha beta gamma delta epsilon zeta eta theta"),
      (11L, "lifecycle alpha beta gamma delta epsilon zeta eta theta"),
      (12L, "entirely different lifecycle text with its own tokens here")
    ).toDF("doc_id", "text")
    val sc = spark.sparkContext
    // The lifecycle under test is the Transformers' SQL-cache persist.
    // localCheckpoint entries (Dedup's three-consumer intermediates) are
    // a DIFFERENT lifecycle — ContextCleaner releases them when the plan
    // holding them is GC'd (Components.scala's scaladoc) — so they are
    // excluded from the emptiness check rather than awaited.
    def persists = sc.getPersistentRDDs
      .filterNot(_._2.toString.contains("localCheckpoint"))
    def awaitEmpty(): Boolean = {
      // the QueryExecutionListener bus is async — poll, don't assert raw
      val deadline = System.currentTimeMillis() + 20000
      while (persists.nonEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      persists.isEmpty
    }
    spark.catalog.clearCache()
    assert(awaitEmpty(), "pre-existing cache entries survived clearCache")

    // opt-out first: proves the persist is REAL (otherwise the release
    // assertion below would pass vacuously on a never-cached input)
    val kept = new ExactDeduper().setReleaseCacheOnFirstAction(false)
      .transform(lcdocs)
    assert(kept.count() == 2)
    assert(persists.nonEmpty,
      "opt-out transform must leave its cache alive for repeated actions")
    spark.catalog.clearCache()

    val exact = new ExactDeduper().transform(lcdocs)
    assert(exact.count() == 2)
    assert(awaitEmpty(),
      s"ExactDeduper cache survived its consuming action: $persists")

    val near = new MinHashDeduper().setMinJaccard(0.3).transform(lcdocs)
    assert(near.count() == 2)
    assert(awaitEmpty(),
      s"MinHashDeduper cache survived its consuming action: $persists")
  }

  test("cache lifecycle, CONCURRENT listeners: two live transformers with " +
      "interleaved actions release each cache on ITS OWN consuming action " +
      "— acting on one must not free (or strand) the other's") {
    // Two transforms over DISTINCT inputs -> two registered listeners
    // alive at once. The release matches by plan sameResult, so the
    // hazard under test is cross-talk: listener A firing on B's action
    // (would unpersist A's cache while A's lazy output still needs it)
    // or A's listener unregistering without releasing (a stranded
    // entry). Interleaving: transform A, transform B, act on B, assert
    // A's cache alive; act on A, assert all released.
    val docsA = Seq(
      (20L, "concurrent alpha corpus first text body"),
      (21L, "concurrent alpha corpus first text body"),
      (22L, "concurrent alpha corpus second unique body")
    ).toDF("doc_id", "text")
    val docsB = Seq(
      (30L, "concurrent beta corpus completely different words"),
      (31L, "concurrent beta corpus completely different words")
    ).toDF("doc_id", "text")
    import org.apache.spark.storage.StorageLevel
    // Dataset.storageLevel consults the CacheManager by plan equality, so
    // it sees the transformer's internal persist of the same input plan
    // even BEFORE materialization (getPersistentRDDs only lists RDDs
    // after a first action creates them)
    def awaitReleased(d: org.apache.spark.sql.DataFrame): Boolean = {
      val deadline = System.currentTimeMillis() + 20000
      while (d.storageLevel != StorageLevel.NONE &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      d.storageLevel == StorageLevel.NONE
    }
    spark.catalog.clearCache()

    val outA = new ExactDeduper().transform(docsA)
    val outB = new ExactDeduper().transform(docsB)
    assert(docsA.storageLevel != StorageLevel.NONE &&
      docsB.storageLevel != StorageLevel.NONE,
      "expected both transformer inputs cached")

    assert(outB.count() == 1)
    assert(awaitReleased(docsB), "B's action must release B's cache")
    assert(docsA.storageLevel != StorageLevel.NONE,
      "B's action must NOT release A's cache (A's lazy output still needs it)")
    // A's output still computes correctly against its live cache
    assert(outA.count() == 2)
    assert(awaitReleased(docsA), "A's action must release the remaining cache")
  }

  test("quality filter inlines exactly ONE TextQuality kernel (fusion pin)") {
    // The reason the scorer emits GetStructFields of one fused kernel
    // instead of TermCounts + arithmetic: ProjectCollapse inlines the
    // scorer's columns into a downstream filter, and FilterExec performs
    // no subexpression elimination — the composed form re-evaluated the
    // tokenizer once per element_at reference (~10x per row, 31 s vs 7 s
    // at the 100x fixture). This pins the fused plan shape: the curation
    // predicate costs ONE tokenization per row, by construction.
    // RDD-backed input: a Seq-backed LocalRelation would be folded away
    // by ConvertToLocalRelation and leave no Filter to inspect. Texts
    // long enough (>=20 non-stop tokens) that the en docs clear the
    // quality bar, so the value assertion is non-vacuous.
    val long0 = "spark executors shuffle partitions across stages while " +
      "catalyst rewrites logical plans into efficient physical operators " +
      "with whole stage codegen enabled everywhere"
    val long1 = "the gradient boosted trees grow histograms over binned " +
      "features and pick split points greedily using gain computed from " +
      "summed gradients within each candidate bin"
    val esDoc = "el zorro marron salta sobre el perro perezoso cerca del " +
      "rio mientras los arboles crecen junto a la orilla durante la tarde"
    val rddDocs = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq((0L, long0), (1L, long1), (2L, esDoc)), 2))
      .toDF("doc_id", "text")
    val kept = new TextQualityScorer().transform(
        new LanguageTagger().transform(rddDocs))
      .where(col("lang_pred") === "en" && col("quality") >= 0.3)
      .select(col("doc_id"))
    val plan = kept.queryExecution.optimizedPlan
    val kernels = plan.collect { case p =>
      p.expressions.flatMap(_.collect {
        case t: graft.functions.KernelExpressions.TextQuality => t
      })
    }.flatten
    assert(kernels.size == 1,
      s"expected exactly 1 TextQuality kernel in the optimized plan, " +
        s"found ${kernels.size}:\n$plan")
    assert(kept.collect().map(_.getLong(0)).toSet == Set(0L, 1L),
      "fused filter must keep the same docs as the composed semantics")
  }

  test("SemanticDeduper centroids survive save/load (persisted Param)") {
    val vecs = Seq(
      (1L, Seq(10.0, 1.0)), (2L, Seq(8.0, 1.2)),
      (3L, Seq(0.5, 5.0)), (4L, Seq(9.0, -1.0))
    ).toDF("vec_id", "embedding")
    val stage = new SemanticDeduper().setMinCos(0.95)
      .setCentroids(Array(Array(1.0, 0.0), Array(0.0, 1.0)))
    val dir = java.nio.file.Files.createTempDirectory("graft-semded").toString
    stage.write.overwrite().save(dir)
    val loaded = SemanticDeduper.load(dir)
    val fresh = stage.transform(vecs).collect().map(_.getLong(0)).toSet
    val replay = loaded.transform(vecs).collect().map(_.getLong(0)).toSet
    assert(replay === fresh && fresh === Set(2L, 3L))
  }
}

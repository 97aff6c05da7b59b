package graft.operators

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param.{DoubleParam, Param, ParamMap}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.{KernelExpressions, TextFunctions}

/** The training-data-pipeline operators as `org.apache.spark.ml`
  * Transformers (SURVEY §7.1 step 9): the same Estimator/Transformer
  * skeleton the XGBoost layer uses, so dedup/text/embedding stages
  * compose with `Pipeline`/`PipelineModel` and persist via
  * DefaultParamsWritable like any MLlib stage.
  */
trait DocColumnsParams extends org.apache.spark.ml.param.Params {
  final val idCol = new Param[String](this, "idCol", "document id column")
  final val textCol = new Param[String](this, "textCol", "document text column")
  setDefault(idCol -> "doc_id", textCol -> "text")
}

/** Opt-out switch for [[CacheLifecycle.releaseAfterFirstAction]] on
  * Transformers that persist their input (see the CACHE LIFECYCLE notes
  * on [[ExactDeduper]]/[[MinHashDeduper]]): default true — the internal
  * cache is unpersisted automatically once the first Dataset action on
  * the returned DataFrame completes. Set false when the caller will act
  * on the result REPEATEDLY and owns cleanup itself (the pre-r15
  * contract: `clearCache()` between runs or explicit uncache). */
trait CacheReleaseParam extends org.apache.spark.ml.param.Params {
  final val releaseCacheOnFirstAction = new org.apache.spark.ml.param.BooleanParam(
    this, "releaseCacheOnFirstAction",
    "unpersist the transformer's internal input cache after the first completed action")
  setDefault(releaseCacheOnFirstAction -> true)
  def setReleaseCacheOnFirstAction(v: Boolean): this.type =
    set(releaseCacheOnFirstAction, v)
  protected def withRelease(cached: DataFrame, result: DataFrame): DataFrame =
    if ($(releaseCacheOnFirstAction)) CacheLifecycle.releaseAfterFirstAction(cached, result)
    else result
}

/** Exact dedup: keeps the lowest-id row of every identical-text group.
  * One shuffle on the 16-byte binary class digest ([[Dedup.classDigest]])
  * — the text bytes never shuffle.
  *
  * CACHE LIFECYCLE: `transform` persists its input at MEMORY_AND_DISK
  * (two consumers of one child plan — see the in-method comment). The
  * cache must outlive the returned (lazy) DataFrame, so it cannot be
  * unpersisted before returning; instead a
  * [[CacheLifecycle.releaseAfterFirstAction]] listener frees it once the
  * first Dataset action on the output completes (default; see
  * [[CacheReleaseParam]] to opt out for repeated-action callers, who
  * then own cleanup: `spark.catalog.clearCache()` between pipeline runs
  * — what Bench/Verify do — or an explicit uncache of the input). Same
  * contract as MinHashDeduper; PipelineTransformersSpec proves no cache
  * entry survives the consuming action. */
class ExactDeduper(override val uid: String) extends Transformer
    with DocColumnsParams with CacheReleaseParam with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("ExactDeduper"))
  def setIdCol(v: String): this.type = set(idCol, v)
  def setTextCol(v: String): this.type = set(textCol, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    // Persist the input before branching: the keep-set (digest aggregate)
    // and the semi-join probe are two consumers of the SAME child plan,
    // and without a materialization point each re-evaluates every
    // upstream stage (in the curation pipeline that is the lang_id +
    // quality kernels over the full corpus, twice — measured ~30 s of
    // q_pipeline_curation's cost at the 100× fixture). Same contract as
    // the Graph/Dedup/Fuzzy operators' persisted intermediates: the
    // cache lives as long as the returned plan; suite runners sweep
    // between queries (Bench/Verify clearCache), and MEMORY_AND_DISK is
    // exactly what a production pipeline does before self-joining a
    // derived corpus it cannot cheaply recompute.
    val df = ds.toDF.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Only (digest, id) pairs shuffle — 24 B per row partial-aggregated
    // map-side — and the winner-id set joins back semi-style (AQE picks a
    // broadcast when the survivor set fits, the common case for a heavily
    // duplicated corpus). The previous window-over-digest form moved every
    // FULL row (text included) to its digest partition, an O(data) shuffle
    // per transform pass. Assumes NON-NULL unique ids (the keep rule is
    // min-id): min() skips nulls and a null id never matches the
    // equi-join, so a null-id row is DROPPED rather than kept-one-per-
    // digest, and duplicate ids retain every row sharing the winning id.
    // Both are fine for the documents fixture (doc_id is a non-null key);
    // a corpus without a reliable id should mint one upstream
    // (monotonically_increasing_id) before this stage.
    val keep = df
      .select(Dedup.classDigest(col($(textCol))).as("_graft_fp"), col($(idCol)))
      .groupBy(col("_graft_fp")).agg(min(col($(idCol))).as("_graft_keep"))
      .select(col("_graft_keep").as($(idCol)))
    withRelease(df, df.join(keep, Seq($(idCol)), "left_semi"))
  }
  override def transformSchema(schema: StructType): StructType = schema
  override def copy(extra: ParamMap): ExactDeduper = defaultCopy(extra)
}
object ExactDeduper extends DefaultParamsReadable[ExactDeduper]

/** MinHash/LSH near-dedup: drops every document that has a near-duplicate
  * with a smaller id (the standard greedy keep-first policy — not a full
  * transitive clustering, which would need connected components). The
  * candidate set is produced by the band-bucket join (no all-pairs), and
  * the removal is a left-anti join against the (small) duplicate-id set.
  *
  * CACHE LIFECYCLE: `transform` persists its input; the cache is freed
  * by the same first-action listener as [[ExactDeduper]] (default;
  * [[CacheReleaseParam]] opts out, after which the caller sweeps —
  * `clearCache` between runs — or uncaches the input once the output is
  * materialized). */
class MinHashDeduper(override val uid: String) extends Transformer
    with DocColumnsParams with CacheReleaseParam with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("MinHashDeduper"))
  final val minJaccard = new DoubleParam(this, "minJaccard",
    "estimated-jaccard threshold for a near-duplicate pair")
  setDefault(minJaccard -> 0.8)
  def setIdCol(v: String): this.type = set(idCol, v)
  def setTextCol(v: String): this.type = set(textCol, v)
  def setMinJaccard(v: Double): this.type = set(minJaccard, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    // persist before branching for the same two-consumer reason as
    // ExactDeduper: the candidate generator and the anti-join probe both
    // re-evaluate the upstream pipeline stages otherwise
    val df = ds.toDF.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dupIds = Dedup.minhashNearDups(df, $(idCol), $(textCol), $(minJaccard))
      .select(col("b").as($(idCol))).distinct()
    withRelease(df, df.join(dupIds, Seq($(idCol)), "left_anti"))
  }
  override def transformSchema(schema: StructType): StructType = schema
  override def copy(extra: ParamMap): MinHashDeduper = defaultCopy(extra)
}
object MinHashDeduper extends DefaultParamsReadable[MinHashDeduper]

/** Adds a language-id column from the stopword-profile heuristic. */
class LanguageTagger(override val uid: String) extends Transformer
    with DocColumnsParams with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("LanguageTagger"))
  final val outputCol = new Param[String](this, "outputCol", "predicted language column")
  setDefault(outputCol -> "lang_pred")
  def setTextCol(v: String): this.type = set(textCol, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)

  override def transform(ds: Dataset[_]): DataFrame =
    // one codegen'd kernel pass (tokenize + profile lookup + argmax);
    // the Seq[String]-UDF form it replaced is the spec-pinned parity
    // reference in TextFunctions
    ds.toDF.withColumn($(outputCol),
      KernelExpressions.lang_id(col($(textCol))))
  override def transformSchema(schema: StructType): StructType =
    schema.add($(outputCol), StringType, nullable = true)
  override def copy(extra: ParamMap): LanguageTagger = defaultCopy(extra)
}
object LanguageTagger extends DefaultParamsReadable[LanguageTagger]

/** Adds quality-signal columns (stopword ratio, chars/token, composite
  * score) — the standard pretraining-corpus heuristics, all codegen'd
  * single-scan projections.
  *
  * NULL text yields NULL in all three columns (the fused kernel
  * null-propagates — see [[graft.functions.Kernels.textQuality]]), so a
  * downstream `quality >= t` filter DROPS null-text docs. The pre-fusion
  * composed form scored null text quality = 1.0 (least() skips nulls) —
  * that was a bug, not a contract: a document with no text has no
  * quality, and letting it outscore every real document defeated the
  * filter's purpose. */
class TextQualityScorer(override val uid: String) extends Transformer
    with DocColumnsParams with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("TextQualityScorer"))
  final val outputCol = new Param[String](this, "outputCol", "quality score column")
  setDefault(outputCol -> "quality")
  def setTextCol(v: String): this.type = set(textCol, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)

  private val stopList = Seq("the", "a", "of", "and", "in", "to", "is")

  override def transform(ds: Dataset[_]): DataFrame = {
    // ONE fused struct-returning kernel (tokenize + stop hits + all three
    // signals), not TermCounts + per-column arithmetic: the composed form
    // was bit-identical but NOT inlining-proof — when ProjectCollapse
    // folded these withColumns into a downstream filter (`quality >=
    // 0.3` in the curation pipelines), every element_at reference
    // re-evaluated the tokenizer (~10 passes/row; FilterExec does no
    // subexpression elimination), a measured 31 s vs 7 s at the 100×
    // fixture. Each output column is one GetStructField of the SAME
    // kernel call: a filter on any one column costs one tokenization,
    // and a projection keeping several is CSE'd by ProjectExec.
    // KernelFuzzSpec pins field-for-field bit parity with the composed
    // TermCounts form; PipelineTransformersSpec pins the one-kernel-in-
    // the-filter plan shape.
    val q = KernelExpressions.text_quality(col($(textCol)), stopList)
    ds.toDF
      .withColumn("__q", q)
      .withColumn("stop_ratio", col("__q.stop_ratio"))
      .withColumn("chars_per_token", col("__q.chars_per_token"))
      .withColumn($(outputCol), col("__q.quality"))
      .drop("__q")
  }
  override def transformSchema(schema: StructType): StructType =
    // nullable: the kernel null-propagates on null text (class scaladoc)
    schema.add("stop_ratio", DoubleType, nullable = true)
      .add("chars_per_token", DoubleType, nullable = true)
      .add($(outputCol), DoubleType, nullable = true)
  override def copy(extra: ParamMap): TextQualityScorer = defaultCopy(extra)
}
object TextQualityScorer extends DefaultParamsReadable[TextQualityScorer]

/** L2-normalizes an embedding column (array<float|double> → unit
  * array<double>) with the fused native kernel, so downstream cosine
  * scoring reduces to one dot product per pair. */
class EmbeddingNormalizer(override val uid: String) extends Transformer
    with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("EmbeddingNormalizer"))
  final val inputCol = new Param[String](this, "inputCol", "embedding column")
  final val outputCol = new Param[String](this, "outputCol", "unit-vector output column")
  setDefault(inputCol -> "embedding", outputCol -> "unit_embedding")
  def setInputCol(v: String): this.type = set(inputCol, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)

  override def transform(ds: Dataset[_]): DataFrame =
    ds.toDF.withColumn($(outputCol), KernelExpressions.unit_vector(col($(inputCol))))
  override def transformSchema(schema: StructType): StructType =
    schema.add($(outputCol), ArrayType(DoubleType, containsNull = false), nullable = true)
  override def copy(extra: ParamMap): EmbeddingNormalizer = defaultCopy(extra)
}
object EmbeddingNormalizer extends DefaultParamsReadable[EmbeddingNormalizer]

/** SemDeDup semantic dedup as a pipeline stage: fits nothing (the coarse
  * quantizer is the frozen production asset — pass its centroids), drops
  * every row [[Similarity.semanticDedupPinned]] marks `keep = false`
  * (the more-central member of each over-threshold in-cell pair). */
class SemanticDeduper(override val uid: String) extends Transformer
    with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("SemanticDeduper"))
  final val idCol = new Param[String](this, "idCol", "vector id column")
  final val vecCol = new Param[String](this, "vecCol", "embedding column")
  final val minCos = new DoubleParam(this, "minCos",
    "cosine threshold for an in-cell duplicate pair")
  setDefault(idCol -> "vec_id", vecCol -> "embedding", minCos -> 0.95)
  def setIdCol(v: String): this.type = set(idCol, v)
  def setVecCol(v: String): this.type = set(vecCol, v)
  def setMinCos(v: Double): this.type = set(minCos, v)

  /** The pinned quantizer centroids are part of the stage's state and
    * must survive save/load like any fitted asset — they live in a
    * string Param (`Double.toString` round-trips exactly, so a persisted
    * stage reproduces cell assignment bit-for-bit). */
  final val centroidsEnc = new Param[String](this, "centroidsEnc",
    "pinned quantizer centroids, rows ';'-separated, values ','-separated")
  setDefault(centroidsEnc -> "")
  def setCentroids(c: Array[Array[Double]]): this.type =
    set(centroidsEnc, c.map(_.mkString(",")).mkString(";"))

  override def transform(ds: Dataset[_]): DataFrame = {
    require($(centroidsEnc).nonEmpty,
      "SemanticDeduper needs pinned centroids (setCentroids)")
    val centroids = $(centroidsEnc).split(';').map(_.split(',').map(_.toDouble))
    val df = ds.toDF
    val drop = Similarity.semanticDedupPinned(df, $(idCol), $(vecCol),
        centroids, $(minCos))
      .where(!col("keep")).select(col("vid").as($(idCol)))
    df.join(drop, Seq($(idCol)), "left_anti")
  }
  override def transformSchema(schema: StructType): StructType = schema
  override def copy(extra: ParamMap): SemanticDeduper = defaultCopy(extra)
}
object SemanticDeduper extends DefaultParamsReadable[SemanticDeduper]

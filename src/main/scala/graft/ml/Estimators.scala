package graft.ml

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.util._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared fit plumbing: column projection, objective inference, the
  * single-node train kernel, and the distributed dispatch — the Scala
  * re-expression of the reference's `_fit` (reference
  * `sparkdl/xgboost/xgboost_core.py:435-518`, SURVEY §3.1–§3.2).
  */
private[ml] object FitSupport extends org.apache.spark.internal.Logging {

  /** The reference's capacity checks (_validate_params warning on
    * spark.task.cpus, xgboost_core.py:187-238, and the num_workers >
    * maxNumConcurrentTasks warning at :365-372): gang-scheduled or
    * histogram-synchronized training stalls when the cluster cannot run
    * all workers concurrently. */
  def warnOnCapacity(est: XGBoostParams, dataset: Dataset[_]): Unit = {
    val sc = dataset.sparkSession.sparkContext
    val taskCpus = sc.getConf.getInt("spark.task.cpus", 1)
    if (taskCpus > 1)
      logWarning(s"spark.task.cpus=$taskCpus > 1: each training task pins " +
        s"$taskCpus cores; the trainer itself is single-threaded per partition")
    val n = est.getOrDefault(est.numWorkers)
    val slots = math.max(sc.defaultParallelism / taskCpus, 1)
    if (n > slots)
      logWarning(s"numWorkers=$n exceeds the ~$slots concurrently-runnable " +
        "tasks; distributed training needs all workers active at once and " +
        "will wait for resources (reference warns identically)")
  }

  /** Normalizes the features column to VectorUDT (accepts array<numeric>
    * via array_to_vector — reference uses vector_to_array for the inverse
    * trip; both are codegen'd Catalyst expressions, not UDFs). */
  def featuresAsVector(df: Dataset[_], colName: String): org.apache.spark.sql.Column = {
    df.schema(colName).dataType match {
      case dt if dt == org.apache.spark.ml.linalg.SQLDataTypes.VectorType => col(colName)
      case ArrayType(_, _) => array_to_vector(col(colName))
      case dt => throw new IllegalArgumentException(s"bad features type $dt")
    }
  }

  /** Projects [features, label, [weight], [isVal], [margin]] — the fixed
    * by-position layout TrainMatrix.fromRows expects (reference selects the
    * same role columns at xgboost_core.py:439-467). */
  def projectTrain(est: XGBoostParams, df: Dataset[_]): (DataFrame, Boolean, Boolean, Boolean) = {
    val hasW = est.hasNonEmpty(est.weightCol)
    val hasV = est.hasNonEmpty(est.validationIndicatorCol)
    val hasM = est.hasNonEmpty(est.baseMarginCol)
    val cols = Seq(
      featuresAsVector(df, est.getOrDefault(est.featuresCol)).as("features"),
      col(est.getOrDefault(est.labelCol)).cast(DoubleType).as("label")) ++
      (if (hasW) Seq(col(est.getOrDefault(est.weightCol)).cast(DoubleType).as("weight")) else Nil) ++
      (if (hasV) Seq(col(est.getOrDefault(est.validationIndicatorCol)).cast(BooleanType).as("validationIndicator")) else Nil) ++
      (if (hasM) Seq(col(est.getOrDefault(est.baseMarginCol)).cast(DoubleType).as("baseMargin")) else Nil)
    (df.select(cols: _*), hasW, hasV, hasM)
  }

  /** Objective inference + label validation in ONE aggregate job: the
    * reference's countDistinct heuristic (xgboost_core.py:328-337) fused
    * with the check that labels are integers in [0, numClass) — without
    * it, labels like {0,1,5} silently train wrong gradients (softprob
    * indexes the margin array by label) or crash metric evaluation. */
  def inferClassifierObjective(est: XGBoostParams, projected: DataFrame): (String, Int) = {
    val r = projected.agg(
      countDistinct(col("label")).as("n"),
      min(col("label")).as("lo"),
      max(col("label")).as("hi"),
      max(abs(col("label") - round(col("label")))).as("frac")).collect()(0)
    val nDistinct = r.getLong(0).toInt
    val lo = r.getDouble(1)
    val hi = r.getDouble(2)
    val frac = r.getDouble(3)
    def validate(k: Int): Unit = require(frac == 0.0 && lo >= 0.0 && hi <= k - 1,
      s"classifier labels must be integers in [0, $k); got range [$lo, $hi]" +
        (if (frac != 0.0) " with non-integer values" else ""))
    val declared = if (est.hasNonEmpty(est.objective)) Some(est.getOrDefault(est.objective)) else None
    declared match {
      case Some(o) if o.startsWith("binary") =>
        validate(2); (o, 0)
      case Some(o) if o.startsWith("multi") =>
        val k = est.getOrDefault(est.numClass)
        require(k >= 2, s"numClass must be set >= 2 for $o")
        validate(k); (o, k)
      case _ =>
        if (nDistinct <= 2) { validate(2); ("binary:logistic", 0) }
        else { validate(nDistinct); ("multi:softprob", nDistinct) }
    }
  }

  /** Single-node path: one full shuffle to one partition, train inside the
    * task, collect the serialized model — `repartition(1).mapInPandas` +
    * collect in the reference (xgboost_core.py:512-517). With external
    * storage on, the partition spills to a local libsvm file and the
    * matrix is rebuilt from disk (C5, reference data.py:51-92; note the
    * reference's spill path drops base margins, and so does ours). */
  def trainSingleNode(projected: DataFrame, hasW: Boolean, hasV: Boolean,
      hasM: Boolean, bp: BoosterParams, useExt: Boolean, esp: Int,
      initTrees: Array[Tree]): String = {
    val modelJson = projected.repartition(1).rdd.mapPartitions { it =>
      val (train, eval) =
        if (useExt) ExternalStorage.buildMatrices(it, hasW, hasV, hasM, esp)
        else TrainMatrix.fromRows(it, hasW, hasV, hasM)
      Iterator(ModelJson.toJson(Trainer.train(train, eval, bp, initTrees)))
    }.collect()
    require(modelJson.nonEmpty, "training produced no model (empty input?)")
    modelJson(0)
  }

  /** The reference's GPU validation (_validate_params,
    * xgboost_core.py:216-238): useGpu requires tree_method gpu_hist-or-
    * unset AND a cluster-side GPU task resource; both failure modes raise
    * with the reference's shape. */
  def validateGpuSetup(est: XGBoostParams, dataset: Dataset[_]): Unit = {
    val tm = est.resolvedTreeMethod // also validates allowed values
    if (est.getOrDefault(est.useGpu)) {
      tm.foreach { t =>
        if (t != "gpu_hist")
          throw new IllegalArgumentException(
            s"tree_method should be 'gpu_hist' or unset when useGpu is true, found $t.")
      }
      val gpuPerTask = dataset.sparkSession.sparkContext.getConf
        .getOption("spark.task.resource.gpu.amount")
      if (gpuPerTask.forall(_.toDouble < 1))
        throw new RuntimeException(
          "The spark cluster does not have the necessary GPU configuration " +
          "(spark.task.resource.gpu.amount) for the spark task; cannot run " +
          "xgboost training using GPU.")
    } else if (tm.contains("gpu_hist")) {
      logWarning("tree_method=gpu_hist requested without useGpu; running the CPU hist algorithm")
    }
  }

  def fit(est: XGBoostParams, dataset: Dataset[_], isClassifier: Boolean): BoosterModel = {
    warnOnCapacity(est, dataset)
    validateGpuSetup(est, dataset)
    val (projected, hasW, hasV, hasM) = projectTrain(est, dataset)
    val (inferredObj, k) =
      if (isClassifier) inferClassifierObjective(est, projected)
      else (if (est.hasNonEmpty(est.objective)) est.getOrDefault(est.objective)
            else "reg:squarederror", est.getOrDefault(est.numClass))
    // arbitraryParams objective overrides (reference: arbitrary keys reach
    // xgboost last); for a classifier it must agree with the label-derived
    // family — silently training a different objective is the no-op trap
    val obj = est.objectiveFromArbitrary match {
      case Some(j) if isClassifier =>
        require(Objective.fromName(j).numGroups(k) == Objective.fromName(inferredObj).numGroups(k),
          s"arbitraryParams objective '$j' is incompatible with the " +
            s"label-derived objective '$inferredObj' (numClass=$k)")
        j
      case Some(j) => Objective.fromName(j).name // validates the name
      case None => inferredObj
    }
    val bp = est.boosterParams(obj, k)
    val n = est.getOrDefault(est.numWorkers)
    val useExt = est.getOrDefault(est.useExternalStorage)
    val esp = est.getOrDefault(est.externalStoragePrecision)
    // warm start (reference xgb_model): continue boosting from the init
    // booster's trees; nEstimators counts the ADDITIONAL rounds
    val initTrees: Array[Tree] =
      if (est.hasNonEmpty(est.xgbModel)) {
        val init = ModelJson.fromJson(est.getOrDefault(est.xgbModel))
        require(Objective.fromName(init.objectiveName).name == Objective.fromName(obj).name,
          s"xgbModel objective ${init.objectiveName} != $obj")
        require(init.numGroups == Objective.fromName(obj).numGroups(k),
          s"xgbModel group count ${init.numGroups} incompatible with numClass $k")
        init.trees
      } else Array.empty
    if (bp.growPolicy == "lossguide" && n > 1)
      logWarning("grow_policy=lossguide is single-node only in this build; " +
        "distributed training grows depthwise honoring the max_leaves cap")
    val json =
      if (n <= 1) trainSingleNode(projected, hasW, hasV, hasM, bp, useExt, esp, initTrees)
      else if (est.getOrDefault(est.useBarrierMode))
        BarrierTrainer.train(projected, hasW, hasV, hasM, bp, n,
          est.getOrDefault(est.forceRepartition), useExt, esp, initTrees)
      else DistTrainer.train(projected, hasW, hasV, hasM, bp, n,
        est.getOrDefault(est.forceRepartition), useExt, esp, initTrees)
    ModelJson.fromJson(json)
  }

  /** Scoring UDF input: densified float row from a Vector. */
  def toFloatRow(v: Vector): Array[Float] = {
    val out = new Array[Float](v.size)
    v.foreachActive((i, x) => out(i) = x.toFloat)
    out
  }
}

// =========================================================================
// Regressor (reference sparkdl/xgboost/xgboost.py:7-92, xgboost_core.py:573-631)
// =========================================================================

class XgboostRegressor(override val uid: String)
    extends Estimator[XgboostRegressorModel]
    with XGBoostParams with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("XgboostRegressor"))

  def setFeaturesCol(v: String): this.type = set(featuresCol, v)
  def setLabelCol(v: String): this.type = set(labelCol, v)
  def setPredictionCol(v: String): this.type = set(predictionCol, v)
  def setWeightCol(v: String): this.type = set(weightCol, v)
  def setValidationIndicatorCol(v: String): this.type = set(validationIndicatorCol, v)
  def setBaseMarginCol(v: String): this.type = set(baseMarginCol, v)
  def setNumWorkers(v: Int): this.type = set(numWorkers, v)
  def setXgbModel(v: String): this.type = set(xgbModel, v)
  def setXgbModel(m: BoosterModel): this.type = set(xgbModel, ModelJson.toJson(m))
  def setUseGpu(v: Boolean): this.type = set(useGpu, v)
  def setForceRepartition(v: Boolean): this.type = set(forceRepartition, v)
  def setUseBarrierMode(v: Boolean): this.type = set(useBarrierMode, v)
  def setUseExternalStorage(v: Boolean): this.type = set(useExternalStorage, v)
  def setExternalStoragePrecision(v: Int): this.type = set(externalStoragePrecision, v)
  def setNEstimators(v: Int): this.type = set(nEstimators, v)
  def setEta(v: Double): this.type = set(eta, v)
  def setMaxDepth(v: Int): this.type = set(maxDepth, v)
  def setObjective(v: String): this.type = set(objective, v)
  def setMissing(v: Float): this.type = set(missing, v)
  def setSeed(v: Long): this.type = set(seed, v)
  def setEarlyStoppingRounds(v: Int): this.type = set(earlyStoppingRounds, v)
  def setEvalMetric(v: String): this.type = set(evalMetric, v)
  def setTreeLimit(v: Int): this.type = set(treeLimit, v)
  def setSubsample(v: Double): this.type = set(subsample, v)
  def setColsampleBytree(v: Double): this.type = set(colsampleBytree, v)
  def setColsampleBylevel(v: Double): this.type = set(colsampleBylevel, v)
  def setColsampleBynode(v: Double): this.type = set(colsampleBynode, v)
  def setMaxDeltaStep(v: Double): this.type = set(maxDeltaStep, v)
  def setMaxBin(v: Int): this.type = set(maxBin, v)
  def setGrowPolicy(v: String): this.type = set(growPolicy, v)
  def setMaxLeaves(v: Int): this.type = set(maxLeaves, v)
  def setTreeMethod(v: String): this.type = set(treeMethod, v)
  def setArbitraryParams(v: String): this.type = set(arbitraryParams, v)
  def setBaseScore(v: Double): this.type = set(baseScore, v)
  def setMonotoneConstraints(v: String): this.type = set(monotoneConstraints, v)
  def setInteractionConstraints(v: String): this.type = set(interactionConstraints, v)

  override def fit(dataset: Dataset[_]): XgboostRegressorModel = {
    transformSchema(dataset.schema)
    val booster = FitSupport.fit(this, dataset, isClassifier = false)
    copyValues(new XgboostRegressorModel(uid, booster)).setParent(this)
  }

  override def copy(extra: ParamMap): XgboostRegressor = defaultCopy(extra)

  override def transformSchema(schema: StructType): StructType = {
    validateFeaturesType(schema)
    schema.add(StructField($(predictionCol), DoubleType, nullable = false))
  }
}

object XgboostRegressor extends DefaultParamsReadable[XgboostRegressor]

class XgboostRegressorModel(override val uid: String, val booster: BoosterModel)
    extends Model[XgboostRegressorModel] with XGBoostParams with MLWritable {

  def setFeaturesCol(v: String): this.type = set(featuresCol, v)
  def setPredictionCol(v: String): this.type = set(predictionCol, v)
  def setBaseMarginCol(v: String): this.type = set(baseMarginCol, v)
  def setTreeLimit(v: Int): this.type = set(treeLimit, v)

  /** Batch inference: broadcast model, pipelined scan→UDF→project plan, no
    * shuffle, no action (reference §3.3; mapInPandas there, in-JVM here).
    * When baseMarginCol is set and present, the per-row margin is added to
    * the predicted margin — the reference's predict-time base margin
    * (xgboost_core.py predict_udf base-margin variant), matching how
    * training seeds margins with base + user margin. */
  override def transform(dataset: Dataset[_]): DataFrame = {
    transformSchema(dataset.schema)
    val sc = dataset.sparkSession.sparkContext
    val bc = sc.broadcast(booster)
    val limit = $(treeLimit)
    val features = FitSupport.featuresAsVector(dataset, $(featuresCol))
    // the margin-space result is transformed to prediction space per
    // objective (identity for squared error, sigmoid for reg:logistic,
    // exp for count:poisson) AFTER the base margin is added — xgboost's
    // PredTransform order
    if (hasNonEmpty(baseMarginCol) && dataset.columns.contains($(baseMarginCol))) {
      val predictUdf = udf { (v: Vector, bm: Double) =>
        bc.value.objective.predictTransform(
          bc.value.predictMarginWithMissing(FitSupport.toFloatRow(v), limit)(0).toDouble + bm)
      }
      dataset.withColumn($(predictionCol),
        predictUdf(features, col($(baseMarginCol)).cast(DoubleType)))
    } else {
      val predictUdf = udf { (v: Vector) =>
        bc.value.objective.predictTransform(
          bc.value.predictMarginWithMissing(FitSupport.toFloatRow(v), limit)(0).toDouble)
      }
      dataset.withColumn($(predictionCol), predictUdf(features))
    }
  }

  override def copy(extra: ParamMap): XgboostRegressorModel =
    copyValues(new XgboostRegressorModel(uid, booster), extra).setParent(parent)

  override def transformSchema(schema: StructType): StructType = {
    validateFeaturesType(schema)
    schema.add(StructField($(predictionCol), DoubleType, nullable = false))
  }

  override def write: MLWriter = new XgboostRegressorModel.Writer(this)
}

object XgboostRegressorModel extends MLReadable[XgboostRegressorModel] {
  private[ml] val className = classOf[XgboostRegressorModel].getName

  private[ml] class Writer(instance: XgboostRegressorModel) extends MLWriter {
    override protected def saveImpl(path: String): Unit = {
      GraftMLIO.saveMetadata(instance, className, path, sparkSession)
      GraftMLIO.saveModelJson(ModelJson.toJson(instance.booster), path, sparkSession)
    }
  }

  private class Reader extends MLReader[XgboostRegressorModel] {
    override def load(path: String): XgboostRegressorModel = {
      val booster = ModelJson.fromJson(GraftMLIO.loadModelJson(path, sparkSession))
      val tmp = new XgboostRegressorModel("tmp", booster)
      val uid = GraftMLIO.loadMetadata(tmp, className, path, sparkSession)
      val out = new XgboostRegressorModel(uid, booster)
      tmp.extractParamMap().toSeq.foreach { p =>
        out.set(out.params.find(_.name == p.param.name).get
          .asInstanceOf[org.apache.spark.ml.param.Param[Any]], p.value)
      }
      out
    }
  }

  override def read: MLReader[XgboostRegressorModel] = new Reader
}

// =========================================================================
// Classifier (reference sparkdl/xgboost/xgboost.py:98-189, xgboost_core.py:634-756)
// =========================================================================

class XgboostClassifier(override val uid: String)
    extends Estimator[XgboostClassifierModel]
    with XGBoostClassifierParams with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("XgboostClassifier"))

  def setFeaturesCol(v: String): this.type = set(featuresCol, v)
  def setLabelCol(v: String): this.type = set(labelCol, v)
  def setPredictionCol(v: String): this.type = set(predictionCol, v)
  def setRawPredictionCol(v: String): this.type = set(rawPredictionCol, v)
  def setProbabilityCol(v: String): this.type = set(probabilityCol, v)
  def setWeightCol(v: String): this.type = set(weightCol, v)
  def setValidationIndicatorCol(v: String): this.type = set(validationIndicatorCol, v)
  def setBaseMarginCol(v: String): this.type = set(baseMarginCol, v)
  def setNumWorkers(v: Int): this.type = set(numWorkers, v)
  def setXgbModel(v: String): this.type = set(xgbModel, v)
  def setXgbModel(m: BoosterModel): this.type = set(xgbModel, ModelJson.toJson(m))
  def setUseGpu(v: Boolean): this.type = set(useGpu, v)
  def setForceRepartition(v: Boolean): this.type = set(forceRepartition, v)
  def setUseBarrierMode(v: Boolean): this.type = set(useBarrierMode, v)
  def setUseExternalStorage(v: Boolean): this.type = set(useExternalStorage, v)
  def setExternalStoragePrecision(v: Int): this.type = set(externalStoragePrecision, v)
  def setNEstimators(v: Int): this.type = set(nEstimators, v)
  def setEta(v: Double): this.type = set(eta, v)
  def setMaxDepth(v: Int): this.type = set(maxDepth, v)
  def setObjective(v: String): this.type = set(objective, v)
  def setNumClass(v: Int): this.type = set(numClass, v)
  def setScalePosWeight(v: Double): this.type = set(scalePosWeight, v)
  def setMissing(v: Float): this.type = set(missing, v)
  def setSeed(v: Long): this.type = set(seed, v)
  def setEarlyStoppingRounds(v: Int): this.type = set(earlyStoppingRounds, v)
  def setEvalMetric(v: String): this.type = set(evalMetric, v)
  def setTreeLimit(v: Int): this.type = set(treeLimit, v)
  def setSubsample(v: Double): this.type = set(subsample, v)
  def setColsampleBytree(v: Double): this.type = set(colsampleBytree, v)
  def setColsampleBylevel(v: Double): this.type = set(colsampleBylevel, v)
  def setColsampleBynode(v: Double): this.type = set(colsampleBynode, v)
  def setMaxDeltaStep(v: Double): this.type = set(maxDeltaStep, v)
  def setMaxBin(v: Int): this.type = set(maxBin, v)
  def setGrowPolicy(v: String): this.type = set(growPolicy, v)
  def setMaxLeaves(v: Int): this.type = set(maxLeaves, v)
  def setTreeMethod(v: String): this.type = set(treeMethod, v)
  def setArbitraryParams(v: String): this.type = set(arbitraryParams, v)
  def setBaseScore(v: Double): this.type = set(baseScore, v)
  def setMonotoneConstraints(v: String): this.type = set(monotoneConstraints, v)
  def setInteractionConstraints(v: String): this.type = set(interactionConstraints, v)

  override def fit(dataset: Dataset[_]): XgboostClassifierModel = {
    transformSchema(dataset.schema)
    val booster = FitSupport.fit(this, dataset, isClassifier = true)
    copyValues(new XgboostClassifierModel(uid, booster)).setParent(this)
  }

  override def copy(extra: ParamMap): XgboostClassifier = defaultCopy(extra)

  override def transformSchema(schema: StructType): StructType = {
    validateFeaturesType(schema)
    schema.add(StructField($(predictionCol), DoubleType, nullable = false))
  }
}

object XgboostClassifier extends DefaultParamsReadable[XgboostClassifier]

class XgboostClassifierModel(override val uid: String, val booster: BoosterModel)
    extends Model[XgboostClassifierModel] with XGBoostClassifierParams with MLWritable {

  def setFeaturesCol(v: String): this.type = set(featuresCol, v)
  def setPredictionCol(v: String): this.type = set(predictionCol, v)
  def setRawPredictionCol(v: String): this.type = set(rawPredictionCol, v)
  def setProbabilityCol(v: String): this.type = set(probabilityCol, v)
  def setBaseMarginCol(v: String): this.type = set(baseMarginCol, v)
  def setTreeLimit(v: Int): this.type = set(treeLimit, v)

  /** Scoring math replicated from the reference (xgboost_core.py:661-685):
    * the model predicts MARGINS; binary: raw=[-m,m], probs=[1-σ(m),σ(m)];
    * multiclass: raw=margins, probs=softmax; prediction=argmax(probs).
    * A set baseMarginCol shifts every class margin BEFORE the
    * sigmoid/softmax, mirroring training's margin initialization.
    * One UDF computes the (raw, prediction, probability) struct which is
    * then split via array_to_vector / nested-field projection / drop —
    * the reference's S10+S11+S12 plan shape (xgboost_core.py:723-756). */
  override def transform(dataset: Dataset[_]): DataFrame = {
    transformSchema(dataset.schema)
    val sc = dataset.sparkSession.sparkContext
    val bc = sc.broadcast(booster)
    val limit = $(treeLimit)
    def score(v: Vector, bm: Double): (Array[Double], Double, Array[Double]) = {
      val margins = bc.value.predictMarginWithMissing(FitSupport.toFloatRow(v), limit)
      if (margins.length == 1) {
        val m = margins(0).toDouble + bm
        val p = Objective.sigmoid(m)
        val probs = Array(1.0 - p, p)
        val pred = if (probs(1) > probs(0)) 1.0 else 0.0
        (Array(-m, m), pred, probs)
      } else {
        val raw = margins.map(_.toDouble + bm)
        val mx = raw.max
        val exp = raw.map(x => math.exp(x - mx))
        val s = exp.sum
        val probs = exp.map(_ / s)
        var best = 0
        var i = 1
        while (i < probs.length) { if (probs(i) > probs(best)) best = i; i += 1 }
        (raw, best.toDouble, probs)
      }
    }
    val features = FitSupport.featuresAsVector(dataset, $(featuresCol))
    val tmp = s"_graft_pred_${uid.takeRight(8)}"
    var out =
      if (hasNonEmpty(baseMarginCol) && dataset.columns.contains($(baseMarginCol))) {
        val scoreUdf = udf { (v: Vector, bm: Double) => score(v, bm) }
        dataset.withColumn(tmp, scoreUdf(features, col($(baseMarginCol)).cast(DoubleType)))
      } else {
        val scoreUdf = udf { (v: Vector) => score(v, 0.0) }
        dataset.withColumn(tmp, scoreUdf(features))
      }
    if (hasNonEmpty(rawPredictionCol))
      out = out.withColumn($(rawPredictionCol), array_to_vector(col(s"$tmp._1")))
    if (hasNonEmpty(predictionCol))
      out = out.withColumn($(predictionCol), col(s"$tmp._2"))
    if (hasNonEmpty(probabilityCol))
      out = out.withColumn($(probabilityCol), array_to_vector(col(s"$tmp._3")))
    out.drop(tmp)
  }

  def numClasses: Int = math.max(booster.numGroups, 2)

  override def copy(extra: ParamMap): XgboostClassifierModel =
    copyValues(new XgboostClassifierModel(uid, booster), extra).setParent(parent)

  override def transformSchema(schema: StructType): StructType = {
    validateFeaturesType(schema)
    var out = schema
    if (hasNonEmpty(rawPredictionCol)) out = out.add($(rawPredictionCol), org.apache.spark.ml.linalg.SQLDataTypes.VectorType, false)
    if (hasNonEmpty(predictionCol)) out = out.add($(predictionCol), DoubleType, false)
    if (hasNonEmpty(probabilityCol)) out = out.add($(probabilityCol), org.apache.spark.ml.linalg.SQLDataTypes.VectorType, false)
    out
  }

  override def write: MLWriter = new XgboostClassifierModel.Writer(this)
}

object XgboostClassifierModel extends MLReadable[XgboostClassifierModel] {
  private[ml] val className = classOf[XgboostClassifierModel].getName

  private[ml] class Writer(instance: XgboostClassifierModel) extends MLWriter {
    override protected def saveImpl(path: String): Unit = {
      GraftMLIO.saveMetadata(instance, className, path, sparkSession)
      GraftMLIO.saveModelJson(ModelJson.toJson(instance.booster), path, sparkSession)
    }
  }

  private class Reader extends MLReader[XgboostClassifierModel] {
    override def load(path: String): XgboostClassifierModel = {
      val booster = ModelJson.fromJson(GraftMLIO.loadModelJson(path, sparkSession))
      val tmp = new XgboostClassifierModel("tmp", booster)
      val uid = GraftMLIO.loadMetadata(tmp, className, path, sparkSession)
      val out = new XgboostClassifierModel(uid, booster)
      tmp.extractParamMap().toSeq.foreach { p =>
        out.set(out.params.find(_.name == p.param.name).get
          .asInstanceOf[org.apache.spark.ml.param.Param[Any]], p.value)
      }
      out
    }
  }

  override def read: MLReader[XgboostClassifierModel] = new Reader
}

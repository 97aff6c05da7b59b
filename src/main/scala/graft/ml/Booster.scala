package graft.ml

import scala.collection.mutable.ArrayBuffer

/** Per-feature histogram cut points.
  *
  * Bin semantics (XGBoost-hist style): for feature f with cuts c_0<…<c_{k-1},
  * bin(v) = first b with v < c_b, else k; a split "after bin b" stores
  * threshold c_b and routes v < c_b left. Missing (NaN) rows get the
  * reserved bin [[BinCuts.MissingBin]] and follow the learned default
  * direction. Cuts max out at 254 values so bin indices fit in a byte.
  */
final class BinCuts(val cuts: Array[Array[Float]]) extends Serializable {
  val numFeatures: Int = cuts.length

  def numBins(f: Int): Int = cuts(f).length + 1

  def binOf(f: Int, v: Float): Int = {
    if (v != v) return BinCuts.MissingBin // NaN
    val c = cuts(f)
    // first index with v < c(idx)  (binary search upper bound)
    var lo = 0
    var hi = c.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v < c(mid)) hi = mid else lo = mid + 1
    }
    lo
  }
}

object BinCuts {
  val MaxCuts = 254
  val MissingBin = 255

  /** Cut budget for a user max_bin: bins = cuts + 1, and the byte bin
    * layout (255 = missing) caps cuts at [[MaxCuts]]. */
  def cutBudget(maxBin: Int): Int = math.min(math.max(maxBin - 1, 1), MaxCuts)

  /** Builds cuts from per-feature sampled values. Candidate thresholds are
    * the distinct sorted values minus the minimum (a threshold at the min
    * separates nothing); > maxCuts distincts → evenly-spaced quantiles. */
  def fromColumnSamples(cols: Array[Array[Float]], maxCuts: Int = MaxCuts): BinCuts = {
    val budget = math.min(math.max(maxCuts, 1), MaxCuts)
    val cuts = cols.map { raw =>
      val clean = raw.filter(v => v == v) // drop NaN
      java.util.Arrays.sort(clean)
      val distinct = new ArrayBuffer[Float]()
      var i = 0
      while (i < clean.length) {
        if (distinct.isEmpty || clean(i) != distinct.last) distinct += clean(i)
        i += 1
      }
      if (distinct.length <= 1) Array.empty[Float]
      else {
        val cand = distinct.drop(1) // exclude min
        if (cand.length <= budget) cand.toArray
        else {
          val out = new Array[Float](budget)
          var j = 0
          while (j < budget) {
            out(j) = cand(((j + 1).toLong * cand.length / (budget + 1)).toInt)
            j += 1
          }
          out.distinct
        }
      }
    }
    new BinCuts(cuts)
  }

  def fromMatrix(m: TrainMatrix, missing: Float, maxCuts: Int = MaxCuts): BinCuts = {
    val cols = Array.tabulate(m.numCols) { f =>
      val a = new Array[Float](m.numRows)
      var i = 0
      while (i < m.numRows) {
        val v = m(i, f)
        a(i) = if (!missing.isNaN && v == missing) Float.NaN else v
        i += 1
      }
      a
    }
    fromColumnSamples(cols, maxCuts)
  }

  /** Row-major byte matrix of bin indices (0xff = missing). */
  def binMatrix(m: TrainMatrix, cuts: BinCuts, missing: Float): Array[Byte] = {
    val out = new Array[Byte](m.numRows * m.numCols)
    var i = 0
    while (i < m.numRows) {
      var f = 0
      val base = i * m.numCols
      while (f < m.numCols) {
        var v = m.values(base + f)
        if (!missing.isNaN && v == missing) v = Float.NaN
        out(base + f) = cuts.binOf(f, v).toByte
        f += 1
      }
      i += 1
    }
    out
  }
}

/** One regression tree, structure-of-arrays. Leaf iff left(i) < 0.
  * `gain` holds the split gain per internal node (0 at leaves) and
  * `cover` the hessian sum reaching each node — the ingredients for
  * gain- and cover-type feature importances. */
final class Tree(
    val feature: Array[Int],
    val threshold: Array[Float],
    val defaultLeft: Array[Boolean],
    val left: Array[Int],
    val right: Array[Int],
    val weight: Array[Float],
    val gain: Array[Float],
    val cover: Array[Float]) extends Serializable {

  def this(feature: Array[Int], threshold: Array[Float], defaultLeft: Array[Boolean],
      left: Array[Int], right: Array[Int], weight: Array[Float]) =
    this(feature, threshold, defaultLeft, left, right, weight,
      new Array[Float](feature.length), new Array[Float](feature.length))

  def this(feature: Array[Int], threshold: Array[Float], defaultLeft: Array[Boolean],
      left: Array[Int], right: Array[Int], weight: Array[Float], gain: Array[Float]) =
    this(feature, threshold, defaultLeft, left, right, weight, gain,
      new Array[Float](feature.length))

  def numNodes: Int = feature.length

  /** Margin contribution for a dense feature row (NaN = missing). */
  def predict(x: Array[Float]): Float = {
    var node = 0
    while (left(node) >= 0) {
      val v = x(feature(node))
      node =
        if (v != v) { if (defaultLeft(node)) left(node) else right(node) }
        else if (v < threshold(node)) left(node)
        else right(node)
    }
    weight(node)
  }
}

/** Hyper-parameters for the native booster (xgboost 1.6 defaults). */
final case class BoosterParams(
    numRounds: Int = 100,
    eta: Double = 0.3,
    maxDepth: Int = 6,
    lambda: Double = 1.0,
    alpha: Double = 0.0,
    gamma: Double = 0.0,
    minChildWeight: Double = 1.0,
    subsample: Double = 1.0,
    colsampleBytree: Double = 1.0,
    colsampleBylevel: Double = 1.0,
    colsampleBynode: Double = 1.0,
    maxDeltaStep: Double = 0.0,
    maxBin: Int = 256,
    growPolicy: String = "depthwise",
    maxLeaves: Int = 0,
    monotoneConstraints: Array[Int] = null, // per-feature -1|0|1; null = none
    interactionConstraints: Array[Array[Int]] = null, // feature groups; null = none
    scalePosWeight: Double = 1.0,
    objective: String = "reg:squarederror",
    numClass: Int = 0,
    baseScore: Double = 0.5,
    missing: Float = Float.NaN,
    seed: Long = 0L,
    earlyStoppingRounds: Int = 0,
    evalMetric: Option[String] = None,
    minSplitGain: Double = 0.0) extends Serializable {

  /** Objective-conditioned defaults (xgboost does the same in its updater
    * config): count:poisson defaults max_delta_step to 0.7 — without the
    * cap, exp(margin) overflows on early rounds of count data. */
  def resolved: BoosterParams =
    if (objective == "count:poisson" && maxDeltaStep == 0.0) copy(maxDeltaStep = 0.7)
    else this
}

/** Trained model: trees (numRounds × numGroups, round-major), objective,
  * base margin. Serialized as a JSON string of our own format
  * ([[ModelJson]]) — analogous to the reference holding the xgboost JSON
  * model string (reference `sparkdl/xgboost/model.py:35-59`). */
final class BoosterModel(
    val objectiveName: String,
    val numClass: Int,
    val numFeatures: Int,
    val baseMargin: Float,
    val trees: Array[Tree],
    val missing: Float,
    val bestScore: Option[Double],
    val bestIteration: Option[Int]) extends Serializable {

  @transient lazy val objective: Objective = Objective.fromName(objectiveName)
  def numGroups: Int = math.max(1, if (objectiveName.startsWith("multi")) numClass else 1)

  /** Raw margins for one row; treeLimit counts boosting rounds. 0 means
    * "default": all rounds, unless early stopping recorded a best
    * iteration — then rounds up to bestIteration+1, matching xgboost's
    * sklearn predict which drops the overfit tail past the best round. */
  def predictMargin(x: Array[Float], treeLimit: Int = 0): Array[Float] = {
    val k = numGroups
    val out = Array.fill(k)(baseMargin)
    val rounds = trees.length / k
    val useRounds =
      if (treeLimit > 0) math.min(treeLimit, rounds)
      else bestIteration match {
        case Some(bi) if bi >= 0 => math.min(bi + 1, rounds)
        case _ => rounds
      }
    var r = 0
    while (r < useRounds) {
      var g = 0
      while (g < k) {
        out(g) += trees(r * k + g).predict(x)
        g += 1
      }
      r += 1
    }
    out
  }

  /** Applies the `missing` sentinel remap then predicts margins. */
  def predictMarginWithMissing(x: Array[Float], treeLimit: Int = 0): Array[Float] = {
    if (!missing.isNaN) {
      var i = 0
      while (i < x.length) { if (x(i) == missing) x(i) = Float.NaN; i += 1 }
    }
    predictMargin(x, treeLimit)
  }

  /** Per-feature importances, normalized to sum 1 (the reference exposes
    * sklearn's `feature_importances_`; xgboost_local_test.py:645-653).
    * The full xgboost get_score surface: "weight" = split count,
    * "gain"/"cover" = AVERAGE split gain / hessian cover per split
    * (xgboost's defaults — total ÷ count), "total_gain"/"total_cover" =
    * the sums. */
  def featureImportances(importanceType: String = "gain"): Array[Double] = {
    val sums = new Array[Double](numFeatures)
    val counts = new Array[Double](numFeatures)
    trees.foreach { t =>
      var i = 0
      while (i < t.numNodes) {
        if (t.left(i) >= 0) {
          val f = t.feature(i)
          counts(f) += 1.0
          importanceType match {
            case "gain" | "total_gain" => sums(f) += t.gain(i)
            case "cover" | "total_cover" => sums(f) += t.cover(i)
            case "weight" => sums(f) += 1.0
            case other => throw new IllegalArgumentException(s"unsupported importance type: $other")
          }
        }
        i += 1
      }
    }
    val imp = importanceType match {
      case "gain" | "cover" => // per-split averages, like xgboost get_score
        sums.zip(counts).map { case (s, c) => if (c > 0) s / c else 0.0 }
      case _ => sums
    }
    val s = imp.sum
    if (s > 0) { var i = 0; while (i < imp.length) { imp(i) /= s; i += 1 } }
    imp
  }
}

package graft.ml

import scala.collection.mutable.ArrayBuffer

/** Split search over accumulated histograms — shared by the local trainer
  * and the distributed (treeAggregate) trainer, which produce identical
  * histogram layouts. All math is XGBoost-style second-order:
  * score(G,H) = T(G)²/(H+λ) with T the L1 soft-threshold, leaf weight
  * −T(G)/(H+λ), split gain ½(scoreL+scoreR−scoreP) − γ.
  */
object SplitFinder {

  final case class Split(
      gain: Double, feature: Int, threshold: Float, binIdx: Int,
      defaultLeft: Boolean, gl: Double, hl: Double, gr: Double, hr: Double)

  @inline def thresholdL1(g: Double, alpha: Double): Double =
    if (g > alpha) g - alpha else if (g < -alpha) g + alpha else 0.0

  @inline def score(g: Double, h: Double, lambda: Double, alpha: Double): Double = {
    val t = thresholdL1(g, alpha)
    t * t / (h + lambda)
  }

  @inline def leafWeight(g: Double, h: Double, lambda: Double, alpha: Double): Double =
    -thresholdL1(g, alpha) / (h + lambda)

  /** Finds the best split for one node.
    *
    * @param hist flat histogram for this node: ((f * maxBins + b) * 2)
    *             holds Σg, +1 holds Σh over non-missing rows with bin b
    * @param features candidate feature indices (colsample subset)
    */
  def findBest(
      hist: Array[Double], maxBins: Int, cuts: BinCuts,
      features: Array[Int], gNode: Double, hNode: Double,
      p: BoosterParams): Option[Split] = {
    var best: Split = null
    var fi = 0
    while (fi < features.length) {
      val f = features(fi)
      val nCuts = cuts.cuts(f).length
      if (nCuts > 0) {
        val base = f * maxBins * 2
        // non-missing totals for this feature → derive missing-row stats
        var gSum = 0.0
        var hSum = 0.0
        var b = 0
        while (b <= nCuts) { gSum += hist(base + b * 2); hSum += hist(base + b * 2 + 1); b += 1 }
        val gMiss = gNode - gSum
        val hMiss = hNode - hSum
        val parentScore = score(gNode, hNode, p.lambda, p.alpha)
        var gl = 0.0
        var hl = 0.0
        var t = 0
        while (t < nCuts) {
          gl += hist(base + t * 2)
          hl += hist(base + t * 2 + 1)
          // candidate A: missing rows go right
          val gL = gl; val hL = hl
          val gR = gNode - gl; val hR = hNode - hl
          if (hL >= p.minChildWeight && hR >= p.minChildWeight) {
            val gain = 0.5 * (score(gL, hL, p.lambda, p.alpha) +
              score(gR, hR, p.lambda, p.alpha) - parentScore) - p.gamma
            if (gain > p.minSplitGain && (best == null || gain > best.gain)) {
              best = Split(gain, f, cuts.cuts(f)(t), t, defaultLeft = false,
                gL, hL, gR, hR)
            }
          }
          // candidate B: missing goes left
          if ((hL + hMiss) >= p.minChildWeight && (hNode - hl - hMiss) >= p.minChildWeight) {
            val gain = 0.5 * (score(gL + gMiss, hL + hMiss, p.lambda, p.alpha) +
              score(gNode - gl - gMiss, hNode - hl - hMiss, p.lambda, p.alpha) - parentScore) - p.gamma
            if (gain > p.minSplitGain && (best == null || gain > best.gain)) {
              best = Split(gain, f, cuts.cuts(f)(t), t, defaultLeft = true,
                gL + gMiss, hL + hMiss, gNode - gl - gMiss, hNode - hl - hMiss)
            }
          }
          t += 1
        }
      }
      fi += 1
    }
    Option(best)
  }
}

/** Single-machine histogram GBT trainer — the kernel behind the reference's
  * single-node path (reference `xgboost_core.py:479-513`): runs inside one
  * task after `repartition(1)`, or on the driver over a collected matrix.
  * The distributed path ([[DistTrainer]]) reuses [[SplitFinder]] and the
  * same histogram layout, aggregating per-partition histograms instead.
  */
object Trainer {
  private val MaxBins = 256

  /** Mutable per-tree growth state, depth-wise. */
  private final class Growth {
    val feature = new ArrayBuffer[Int]
    val threshold = new ArrayBuffer[Float]
    val defaultLeft = new ArrayBuffer[Boolean]
    val left = new ArrayBuffer[Int]
    val right = new ArrayBuffer[Int]
    val gSum = new ArrayBuffer[Double]
    val hSum = new ArrayBuffer[Double]
    val depth = new ArrayBuffer[Int]
    val gain = new ArrayBuffer[Float]

    def addNode(g: Double, h: Double, d: Int): Int = {
      feature += -1; threshold += 0f; defaultLeft += true
      left += -1; right += -1; gSum += g; hSum += h; depth += d; gain += 0f
      feature.length - 1
    }

    def toTree(p: BoosterParams): Tree = {
      val n = feature.length
      val w = new Array[Float](n)
      var i = 0
      while (i < n) {
        if (left(i) < 0)
          w(i) = (p.eta * SplitFinder.leafWeight(gSum(i), hSum(i), p.lambda, p.alpha)).toFloat
        i += 1
      }
      new Tree(feature.toArray, threshold.toArray, defaultLeft.toArray,
        left.toArray, right.toArray, w, gain.toArray)
    }
  }

  def train(trainM: TrainMatrix, evalM: Option[TrainMatrix], p: BoosterParams,
      initTrees: Array[Tree] = Array.empty): BoosterModel = {
    require(trainM.numRows > 0, "cannot train on an empty partition")
    val obj = Objective.fromName(p.objective)
    val k = obj.numGroups(p.numClass)
    val n = trainM.numRows
    val m = trainM.numCols
    val cuts = BinCuts.fromMatrix(trainM, p.missing)
    val binned = BinCuts.binMatrix(trainM, cuts, p.missing)
    val rng = new java.util.Random(p.seed)

    // scale_pos_weight folds into per-row weights for the logistic objective
    val weights: Array[Float] =
      if (p.scalePosWeight != 1.0 && p.objective == "binary:logistic") {
        val w = new Array[Float](n)
        var i = 0
        while (i < n) {
          val base = if (trainM.weights == null) 1.0f else trainM.weights(i)
          w(i) = if (trainM.labels(i) == 1.0f) (base * p.scalePosWeight).toFloat else base
          i += 1
        }
        w
      } else trainM.weights

    val margins = initMargins(trainM, obj, p, k)
    val evalMargins = evalM.map(e => initMargins(e, obj, p, k))

    // warm start: fold the init booster's trees into the margins and keep
    // them at the head of the ensemble (reference xgb_model semantics —
    // nEstimators more rounds are added on top)
    initTrees.zipWithIndex.foreach { case (t, i) =>
      updateMargins(trainM, t, margins, k, i % k, p.missing)
      evalM.zip(evalMargins).foreach { case (e, em) => updateMargins(e, t, em, k, i % k, p.missing) }
    }

    val g = new Array[Float](n * k)
    val h = new Array[Float](n * k)
    val gk = new Array[Float](n)
    val hk = new Array[Float](n)
    val trees = new ArrayBuffer[Tree]
    trees ++= initTrees
    val metric = p.evalMetric.getOrElse(obj.defaultMetric(p.numClass))
    var bestScore = Double.MaxValue
    var bestIter = -1
    var round = 0
    var stop = false

    while (round < p.numRounds && !stop) {
      obj.gradHess(margins, trainM.labels, weights, k, g, h)
      val sampled = sampleRows(n, p.subsample, rng)
      var cls = 0
      while (cls < k) {
        if (k == 1) { System.arraycopy(g, 0, gk, 0, n); System.arraycopy(h, 0, hk, 0, n) }
        else {
          var i = 0
          while (i < n) { gk(i) = g(i * k + cls); hk(i) = h(i * k + cls); i += 1 }
        }
        val features = sampleFeatures(m, p.colsampleBytree, rng)
        val tree = buildTree(binned, n, m, cuts, gk, hk, sampled, features, p)
        trees += tree
        updateMargins(trainM, tree, margins, k, cls, p.missing)
        evalM.zip(evalMargins).foreach { case (e, em) =>
          updateMargins(e, tree, em, k, cls, p.missing)
        }
        cls += 1
      }
      evalM.zip(evalMargins).foreach { case (e, em) =>
        val s = EvalMetric.compute(metric, em, e.labels, e.weights, math.max(k, 2))
        if (s < bestScore) { bestScore = s; bestIter = round }
        else if (p.earlyStoppingRounds > 0 && round - bestIter >= p.earlyStoppingRounds)
          stop = true
      }
      round += 1
    }

    new BoosterModel(obj.name, p.numClass, m, obj.baseMargin(p.baseScore),
      trees.toArray, p.missing,
      if (evalM.isDefined) Some(bestScore) else None,
      // best_iteration is recorded only when early stopping is enabled —
      // predict then defaults to the best rounds (xgboost sklearn
      // semantics); without early stopping all rounds score. The offset
      // counts warm-start rounds, as xgboost does for xgb_model.
      if (evalM.isDefined && p.earlyStoppingRounds > 0)
        Some(initTrees.length / k + bestIter) else None)
  }

  private def initMargins(mat: TrainMatrix, obj: Objective, p: BoosterParams, k: Int): Array[Float] = {
    val out = new Array[Float](mat.numRows * k)
    val base = obj.baseMargin(p.baseScore)
    var i = 0
    while (i < out.length) { out(i) = base; i += 1 }
    if (mat.baseMargins != null) {
      // user base margin is added to the global bias, one value per row
      var r = 0
      while (r < mat.numRows) {
        var c = 0
        while (c < k) { out(r * k + c) = (out(r * k + c) + mat.baseMargins(r)); c += 1 }
        r += 1
      }
    }
    out
  }

  private def sampleRows(n: Int, subsample: Double, rng: java.util.Random): Array[Boolean] = {
    if (subsample >= 1.0) null
    else Array.fill(n)(rng.nextDouble() < subsample)
  }

  private def sampleFeatures(m: Int, colsample: Double, rng: java.util.Random): Array[Int] = {
    if (colsample >= 1.0) Array.range(0, m)
    else {
      val take = math.max(1, math.round(m * colsample).toInt)
      val idx = Array.range(0, m)
      // Fisher–Yates prefix shuffle
      var i = 0
      while (i < take) {
        val j = i + rng.nextInt(m - i)
        val t = idx(i); idx(i) = idx(j); idx(j) = t
        i += 1
      }
      java.util.Arrays.sort(idx, 0, take)
      idx.take(take)
    }
  }

  /** Depth-wise growth: one histogram pass over all rows per level. */
  private def buildTree(
      binned: Array[Byte], n: Int, m: Int, cuts: BinCuts,
      g: Array[Float], h: Array[Float], sampled: Array[Boolean],
      features: Array[Int], p: BoosterParams): Tree = {

    val growth = new Growth
    val positions = new Array[Int](n)
    var gRoot = 0.0
    var hRoot = 0.0
    var i = 0
    while (i < n) {
      if (sampled == null || sampled(i)) { positions(i) = 0; gRoot += g(i); hRoot += h(i) }
      else positions(i) = -1
      i += 1
    }
    growth.addNode(gRoot, hRoot, 0)

    var depth = 0
    var levelStart = 0 // nodes [levelStart, levelEnd) are the current level
    var levelEnd = 1
    while (depth < p.maxDepth && levelStart < levelEnd) {
      val nActive = levelEnd - levelStart
      val hist = new Array[Double](nActive * m * MaxBins * 2)
      // single pass over rows: accumulate (g,h) into per-node histograms
      i = 0
      while (i < n) {
        val node = positions(i)
        if (node >= levelStart && node < levelEnd) {
          val slot = node - levelStart
          val rowBase = i * m
          val histBase = slot * m * MaxBins * 2
          var fi = 0
          while (fi < features.length) {
            val f = features(fi)
            val b = binned(rowBase + f) & 0xff
            if (b != BinCuts.MissingBin) {
              val idx = histBase + (f * MaxBins + b) * 2
              hist(idx) += g(i)
              hist(idx + 1) += h(i)
            }
            fi += 1
          }
        }
        i += 1
      }
      // split decisions for this level
      val splits = new Array[SplitFinder.Split](nActive)
      var s = 0
      while (s < nActive) {
        val node = levelStart + s
        val slice = java.util.Arrays.copyOfRange(
          hist, s * m * MaxBins * 2, (s + 1) * m * MaxBins * 2)
        SplitFinder.findBest(slice, MaxBins, cuts, features,
          growth.gSum(node), growth.hSum(node), p).foreach { sp =>
          splits(s) = sp
          growth.feature(node) = sp.feature
          growth.threshold(node) = sp.threshold
          growth.defaultLeft(node) = sp.defaultLeft
          growth.gain(node) = sp.gain.toFloat
          growth.left(node) = growth.addNode(sp.gl, sp.hl, depth + 1)
          growth.right(node) = growth.addNode(sp.gr, sp.hr, depth + 1)
        }
        s += 1
      }
      // route rows to children
      i = 0
      while (i < n) {
        val node = positions(i)
        if (node >= levelStart && node < levelEnd) {
          val sp = splits(node - levelStart)
          if (sp == null) positions(i) = -2 // settled in a leaf
          else {
            val b = binned(i * m + sp.feature) & 0xff
            val goLeft =
              if (b == BinCuts.MissingBin) sp.defaultLeft
              else b <= sp.binIdx
            positions(i) = if (goLeft) growth.left(node) else growth.right(node)
          }
        }
        i += 1
      }
      levelStart = levelEnd
      levelEnd = growth.feature.length
      depth += 1
    }
    growth.toTree(p)
  }

  /** Adds a new tree's predictions into the running margins (all rows,
    * including unsampled ones — raw feature values, not bins). */
  private def updateMargins(
      mat: TrainMatrix, tree: Tree, margins: Array[Float],
      k: Int, cls: Int, missing: Float): Unit = {
    val m = mat.numCols
    val row = new Array[Float](m)
    var i = 0
    while (i < mat.numRows) {
      System.arraycopy(mat.values, i * m, row, 0, m)
      if (!missing.isNaN) {
        var f = 0
        while (f < m) { if (row(f) == missing) row(f) = Float.NaN; f += 1 }
      }
      margins(i * k + cls) += tree.predict(row)
      i += 1
    }
  }
}

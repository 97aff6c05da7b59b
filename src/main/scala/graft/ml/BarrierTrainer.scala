package graft.ml

import org.apache.spark.BarrierTaskContext
import org.apache.spark.sql.DataFrame

import scala.collection.mutable.ArrayBuffer

/** C2/C8: barrier-mode collective training — the faithful re-expression
  * of the reference's distributed path (reference `xgboost_core.py:379-430`
  * `_train_booster` + `utils.py:64-126` Rabit bootstrap):
  *
  *   - N gang-scheduled barrier tasks (`rdd.barrier().mapPartitions`),
  *     exactly the reference's S8 plan shape (`xgboost_core.py:427-430`);
  *   - the Rabit ring is replaced by [[Collective]]: ONE allGather
  *     distributes partition 0's coordinator address (the reference ships
  *     the tracker env the same way, `xgboost_core.py:407-411`), then
  *     per-tree-level histogram allreduces run over persistent TCP. Each
  *     worker contributes its local gradient histogram, receives the
  *     global sum, and derives the SAME split — so every worker grows the
  *     identical tree and "all workers end with the same model", the
  *     invariant that lets only partition 0 emit the booster
  *     (`xgboost_core.py:423-425`);
  *   - traffic per level is O(nodes·features·bins), independent of row
  *     count — Rabit's asymptotics; fine for the tested worker counts,
  *     while [[DistTrainer]] (treeAggregate) remains the default
  *     large-cluster path (SURVEY §7.1 step 7 option b).
  *
  * Determinism: split finding runs on bit-identical global histograms on
  * every worker (the coordinator broadcasts one sum), and feature
  * sampling is seeded by (seed, round, class) — no worker-local
  * randomness leaks into the model structure.
  */
object BarrierTrainer {
  private val MaxBins = 256

  def train(projected: DataFrame, hasW: Boolean, hasV: Boolean, hasM: Boolean,
      p0: BoosterParams, numWorkers: Int, forceRepartition: Boolean,
      useExt: Boolean = false, esp: Int = 5,
      initTrees: Array[Tree] = Array.empty): String = {
    val p = p0.resolved
    val sc = projected.sparkSession.sparkContext
    val input =
      if (forceRepartition || DistTrainer.needsRepartition(projected, numWorkers))
        projected.repartition(numWorkers)
      else projected

    val obj = Objective.fromName(p.objective)
    val k = obj.numGroups(p.numClass)

    // distributed quantile sketch -> bin cuts, broadcast — the same
    // sketch as DistTrainer so both distributed paths bin identically
    val rowsRdd = input.rdd
    val cuts =
      try QuantileCuts.fromRdd(rowsRdd, p.missing, BinCuts.cutBudget(p.maxBin))
      catch { case _: UnsupportedOperationException => // empty RDD
        throw new IllegalArgumentException("empty training input") }
    val cutsBc = sc.broadcast(cuts)

    val jsons = rowsRdd.barrier().mapPartitions { it =>
      val ctx = BarrierTaskContext.get()
      val (train, evalOpt) =
        if (useExt) ExternalStorage.buildMatrices(it, hasW, hasV, hasM, esp)
        else TrainMatrix.fromRows(it, hasW, hasV, hasM)
      ctx.barrier() // all matrices built before the collective starts
      // ONE allGather bootstraps the socket collective (the reference's
      // tracker-env exchange, xgboost_core.py:407-411); histogram rounds
      // then run over persistent TCP, like the Rabit ring
      val coll = Collective.bootstrap(ctx)
      val json =
        try trainWorker(coll, ctx.partitionId(), train, evalOpt.orNull, cutsBc.value, k, p, obj, hasV, initTrees)
        finally coll.close()
      // only partition 0 yields (reference xgboost_core.py:423-425) —
      // every worker holds the identical model at this point
      if (ctx.partitionId() == 0) Iterator.single(json) else Iterator.empty
    }.collect()
    require(jsons.nonEmpty, "barrier training yielded no model")
    jsons(0)
  }

  /** The full boosting loop, run identically on every worker; local data
    * only contributes through histogram/metric allreduces. Workers with
    * empty partitions still join every collective call (a barrier stage
    * deadlocks otherwise — same constraint Rabit had). */
  private def trainWorker(coll: Collective, pid: Int, mat: TrainMatrix,
      eval: TrainMatrix, cuts: BinCuts, k: Int, p: BoosterParams,
      obj: Objective, hasEval: Boolean, initTrees: Array[Tree]): String = {
    val n = mat.numRows
    val m = cuts.numFeatures
    val binned = BinCuts.binMatrix(mat, cuts, p.missing)
    val weights = DistTrainer.effectiveWeights(mat, p)
    val baseMargin = obj.baseMargin(p.baseScore)

    def initMargins(t: TrainMatrix): Array[Float] = {
      val out = new Array[Float](t.numRows * k)
      java.util.Arrays.fill(out, baseMargin)
      if (t.baseMargins != null) {
        var r = 0
        while (r < t.numRows) {
          var c = 0
          while (c < k) { out(r * k + c) += t.baseMargins(r); c += 1 }
          r += 1
        }
      }
      out
    }

    val margins = initMargins(mat)
    val evalMargins = if (eval != null) initMargins(eval) else null
    // warm start: fold init trees into local margins (identical on all
    // workers — no collective needed)
    initTrees.zipWithIndex.foreach { case (t, i) =>
      updateMargins(mat, t, margins, k, i % k, p.missing)
      if (eval != null) updateMargins(eval, t, evalMargins, k, i % k, p.missing)
    }
    val g = new Array[Float](n * k)
    val h = new Array[Float](n * k)
    val gk = new Array[Float](n)
    val hk = new Array[Float](n)
    val trees = new ArrayBuffer[Tree]
    trees ++= initTrees
    val metric = p.evalMetric.getOrElse(obj.defaultMetric(p.numClass))
    var bestScore = if (EvalMetric.lowerIsBetter(metric)) Double.MaxValue else Double.MinValue
    var bestIter = -1
    var round = 0
    var stop = false
    // same sequential draw order as DistTrainer's driver rng, replicated
    // identically on every worker — the two distributed paths pick the
    // SAME per-tree feature subsets even under colsampleBytree < 1
    val frng = new java.util.Random(p.seed)

    while (round < p.numRounds && !stop) {
      if (n > 0) obj.gradHess(margins, mat.labels, weights, k, g, h)
      var cls = 0
      while (cls < k) {
        if (n > 0) {
          if (k == 1) { System.arraycopy(g, 0, gk, 0, n); System.arraycopy(h, 0, hk, 0, n) }
          else {
            var i = 0
            while (i < n) { gk(i) = g(i * k + cls); hk(i) = h(i * k + cls); i += 1 }
          }
        }
        val features = sampleFeatures(m, p.colsampleBytree, frng)
        val sampled = sampleRows(pid, n, round, p)
        trees += growTreeCollective(coll, binned, n, m, cuts, gk, hk, sampled, features, p, round, cls)
        val tree = trees.last
        updateMargins(mat, tree, margins, k, cls, p.missing)
        if (eval != null) updateMargins(eval, tree, evalMargins, k, cls, p.missing)
        cls += 1
      }
      if (hasEval) {
        val parts = new Array[Double](DistTrainer.metricSize(metric))
        if (eval != null && eval.numRows > 0)
          DistTrainer.metricAccum(metric, evalMargins, eval.labels, eval.weights,
            math.max(k, 2), parts)
        val global = coll.allreduce(parts) // everyone sees the same score
        val s = DistTrainer.finishMetricArr(metric, global)
        val improved = if (EvalMetric.lowerIsBetter(metric)) s < bestScore else s > bestScore
        if (improved) { bestScore = s; bestIter = round }
        else if (p.earlyStoppingRounds > 0 && round - bestIter >= p.earlyStoppingRounds)
          stop = true
      }
      round += 1
    }

    val model = new BoosterModel(obj.name, p.numClass, m, baseMargin,
      trees.toArray, p.missing,
      if (hasEval) Some(bestScore) else None,
      // offset by the init booster's rounds — see DistTrainer's note
      if (hasEval && p.earlyStoppingRounds > 0) Some(initTrees.length / k + bestIter) else None)
    ModelJson.toJson(model)
  }

  /** Depth-wise growth with one histogram allreduce per level. All
    * workers execute the same control flow (level counts derive from the
    * shared global splits), so collective calls stay aligned. */
  private def growTreeCollective(coll: Collective, binned: Array[Byte],
      n: Int, m: Int, cuts: BinCuts, g: Array[Float], h: Array[Float],
      sampled: Array[Boolean], features: Array[Int], p: BoosterParams,
      round: Int, cls: Int): Tree = {

    val feature = new ArrayBuffer[Int]
    val threshold = new ArrayBuffer[Float]
    val binIdx = new ArrayBuffer[Int]
    val defaultLeft = new ArrayBuffer[Boolean]
    val left = new ArrayBuffer[Int]
    val right = new ArrayBuffer[Int]
    val gSum = new ArrayBuffer[Double]
    val hSum = new ArrayBuffer[Double]
    val gain = new ArrayBuffer[Float]
    val loB = new ArrayBuffer[Double] // monotone weight bounds
    val hiB = new ArrayBuffer[Double]
    val allowedB = new ArrayBuffer[Array[Long]] // interaction masks (null = all)
    val um = SplitFinder.Interactions.unionMasks(p.interactionConstraints, m)
    def addNode(gs: Double, hs: Double,
        wLo: Double = Double.NegativeInfinity,
        wHi: Double = Double.PositiveInfinity,
        mask: Array[Long] = null): Int = {
      feature += -1; threshold += 0f; binIdx += -1; defaultLeft += true
      left += -1; right += -1; gSum += gs; hSum += hs; gain += 0f
      loB += wLo; hiB += wHi; allowedB += mask
      feature.length - 1
    }

    val positions = new Array[Int](n)
    var gRootLocal = 0.0
    var hRootLocal = 0.0
    var i = 0
    while (i < n) {
      if (sampled == null || sampled(i)) { positions(i) = 0; gRootLocal += g(i); hRootLocal += h(i) }
      else positions(i) = -1
      i += 1
    }
    val rootStats = coll.allreduce(Array(gRootLocal, hRootLocal))
    addNode(rootStats(0), rootStats(1))

    var depth = 0
    var levelStart = 0
    var levelEnd = 1
    var leaves = 1
    while (depth < p.maxDepth && levelStart < levelEnd) {
      val nActive = levelEnd - levelStart
      // keyed (seed, round, cls, depth) sampling: every worker derives the
      // same per-level subset with no extra collective — and the same
      // subset as DistTrainer, keeping the two distributed paths in parity
      val levelFeats = FeatureSampling.subsample(features, p.colsampleBylevel,
        FeatureSampling.levelKey(p.seed, round, cls, depth))
      val localHist = new Array[Double](nActive * m * MaxBins * 2)
      i = 0
      while (i < n) {
        val node = positions(i)
        if (node >= levelStart && node < levelEnd) {
          val slot = node - levelStart
          val rowBase = i * m
          val histBase = slot * m * MaxBins * 2
          var fi = 0
          while (fi < levelFeats.length) {
            val f = levelFeats(fi)
            val b = binned(rowBase + f) & 0xff
            if (b != BinCuts.MissingBin) {
              val idx = histBase + (f * MaxBins + b) * 2
              localHist(idx) += g(i)
              localHist(idx + 1) += h(i)
            }
            fi += 1
          }
        }
        i += 1
      }
      val hist = coll.allreduce(localHist) // the Rabit-equivalent step

      val splits = new Array[SplitFinder.Split](nActive)
      var s = 0
      while (s < nActive) {
        val node = levelStart + s
        val nodeFeats = FeatureSampling.subsample(levelFeats, p.colsampleBynode,
          FeatureSampling.nodeKey(p.seed, round, cls, node))
        val slice = java.util.Arrays.copyOfRange(
          hist, s * m * MaxBins * 2, (s + 1) * m * MaxBins * 2)
        if (p.maxLeaves <= 0 || leaves < p.maxLeaves)
          SplitFinder.findBest(slice, MaxBins, cuts, nodeFeats,
            gSum(node), hSum(node), p, loB(node), hiB(node), allowedB(node)).foreach { sp =>
            splits(s) = sp
            feature(node) = sp.feature
            threshold(node) = sp.threshold
            binIdx(node) = sp.binIdx
            defaultLeft(node) = sp.defaultLeft
            gain(node) = sp.gain.toFloat
            val (ll, lh, rl, rh) = SplitFinder.childBounds(sp, p, loB(node), hiB(node))
            val cm = if (um == null) null
              else SplitFinder.Interactions.childMask(allowedB(node), um, sp.feature)
            left(node) = addNode(sp.gl, sp.hl, ll, lh, cm)
            right(node) = addNode(sp.gr, sp.hr, rl, rh, cm)
            leaves += 1
          }
        s += 1
      }
      i = 0
      while (i < n) {
        val node = positions(i)
        if (node >= levelStart && node < levelEnd) {
          val sp = splits(node - levelStart)
          if (sp == null) positions(i) = -2
          else {
            val b = binned(i * m + sp.feature) & 0xff
            val goLeft =
              if (b == BinCuts.MissingBin) sp.defaultLeft
              else b <= sp.binIdx
            positions(i) = if (goLeft) left(node) else right(node)
          }
        }
        i += 1
      }
      levelStart = levelEnd
      levelEnd = feature.length
      depth += 1
    }

    val nn = feature.length
    val w = new Array[Float](nn)
    i = 0
    while (i < nn) {
      if (left(i) < 0)
        w(i) = (p.eta * SplitFinder.clamp(
          SplitFinder.leafWeightP(gSum(i), hSum(i), p), loB(i), hiB(i))).toFloat
      i += 1
    }
    new Tree(feature.toArray, threshold.toArray, defaultLeft.toArray,
      left.toArray, right.toArray, w, gain.toArray,
      hSum.map(_.toFloat).toArray)
  }

  /** Deterministic per-(partition, round, row) subsample mask — stable
    * under barrier-stage retries. */
  private def sampleRows(partitionId: Int, n: Int, round: Int,
      p: BoosterParams): Array[Boolean] = {
    if (p.subsample >= 1.0) null
    else {
      val out = new Array[Boolean](n)
      var i = 0
      while (i < n) {
        var x = p.seed * 6364136223846793005L +
          partitionId.toLong * 9632455465461L +
          round.toLong * 1442695040888963407L + i.toLong * 2862933555777941757L
        x ^= (x >>> 33); x *= 0xff51afd7ed558ccdL; x ^= (x >>> 33)
        out(i) = ((x >>> 11).toDouble / (1L << 53).toDouble) < p.subsample
        i += 1
      }
      out
    }
  }

  private def sampleFeatures(m: Int, colsample: Double, rng: java.util.Random): Array[Int] = {
    if (colsample >= 1.0) Array.range(0, m)
    else {
      val take = math.max(1, math.round(m * colsample).toInt)
      val idx = Array.range(0, m)
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

  /** Adds one tree's contribution to class column `cls` (raw values, all
    * rows — same as the single-node trainer). */
  private def updateMargins(mat: TrainMatrix, tree: Tree, margins: Array[Float],
      k: Int, cls: Int, missing: Float): Unit = {
    val m = mat.numCols
    if (mat.numRows == 0) return
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

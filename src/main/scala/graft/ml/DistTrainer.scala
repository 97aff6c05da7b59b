package graft.ml

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Repartition, RepartitionByExpression}
import org.apache.spark.storage.StorageLevel

import scala.collection.mutable.ArrayBuffer

/** Distributed training via driver-coordinated histogram aggregation.
  *
  * The reference's distributed path gang-schedules N barrier tasks that run
  * a Rabit allreduce ring (reference `xgboost_core.py:379-430`,
  * `utils.py:64-126`). The idiomatic Spark re-expression (SURVEY §7.1
  * step 7, option b) keeps ONE global model on the driver and aggregates
  * per-partition gradient histograms with `treeAggregate` per tree level
  * ([[BarrierTrainer]] is the gang-scheduled faithful alternative):
  *
  *   - data: ONE cached RDD[PartState] (binned matrix per partition),
  *     persisted MEMORY_AND_DISK and never re-mapped — margins live as
  *     @transient worker-side state, deterministically REPLAYED from the
  *     broadcast tree prefix if a partition is evicted or recomputed, so
  *     there is no per-round lineage growth, no re-persist churn, and no
  *     per-round materialization job;
  *   - per level: one treeAggregate of (node × feature × bin) grad/hess
  *     sums (zero value is lazily allocated on the executors — a null
  *     zero keeps multi-MB arrays out of the job closure) → driver finds
  *     splits with the same [[SplitFinder]] as the single-node path →
  *     every worker sees the identical tree, the invariant Rabit provided;
  *   - gradients: computed once per round from ROUND-START margins for
  *     all K classes (xgboost semantics — numWorkers must not change the
  *     model), memoized on the PartState;
  *   - cuts: driver-side quantile sketch over a bounded sample, broadcast.
  *
  * At scale this shuffles the training set once (the repartition), then
  * only moves O(nodes·features·bins) histograms per level — independent of
  * row count, the property that makes histogram GBT viable at 100 TB.
  */
object DistTrainer {
  private val MaxBins = 256

  /** Per-partition training state. The matrix/binned payload is the only
    * serialized state; margins and gradients are @transient caches,
    * rebuilt deterministically (replay of the broadcast tree prefix) on
    * deserialization or recompute. */
  private final class PartState(
      val train: TrainMatrix,
      val eval: TrainMatrix, // null when absent
      val binned: Array[Byte]) extends Serializable {
    @transient var margins: Array[Float] = _
    @transient var evalMargins: Array[Float] = _
    @transient var applied: Int = 0 // trees already folded into margins
    @transient var gCache: Array[Float] = _
    @transient var hCache: Array[Float] = _
    @transient var cacheRound: Int = -1
    // row → current node of the tree UNDER GROWTH (one per (round, cls)):
    // each level advances a row by the one new step instead of re-routing
    // from the root (O(1) vs O(depth) binned reads per row per level —
    // a measured ~6-8% off q_ml_train_predict_scale at 100×; the
    // remaining cost is the histogram accumulate + per-round gradient
    // passes, linear in rows by contract — SCALE.md r17). The partial
    // tree only appends nodes, so resuming from the stored node reaches
    // the same leaf a root walk would; on eviction/recompute the cache
    // is null and the walk restarts from the root — same result, the
    // determinism story margins already have.
    @transient var nodePos: Array[Int] = _
    @transient var posRound: Int = -1
    @transient var posCls: Int = -1
  }

  /** C7: skip the shuffle iff the optimized plan already ends in a
    * round-robin Repartition with the target partition count — a direct
    * pattern match on the plan instead of the reference's explain-text
    * parsing (reference `xgboost_core.py:291-321`). */
  def needsRepartition(df: DataFrame, n: Int): Boolean =
    df.queryExecution.optimizedPlan match {
      case Repartition(numPartitions, true, _) => numPartitions != n
      case _: RepartitionByExpression => true
      case _ => true
    }

  def train(projected: DataFrame, hasW: Boolean, hasV: Boolean, hasM: Boolean,
      p0: BoosterParams, numWorkers: Int, forceRepartition: Boolean,
      useExt: Boolean = false, esp: Int = 5,
      initTrees: Array[Tree] = Array.empty): String = {
    val p = p0.resolved
    val spark = projected.sparkSession
    val sc = spark.sparkContext
    val input =
      if (forceRepartition || needsRepartition(projected, numWorkers))
        projected.repartition(numWorkers)
      else projected

    val obj = Objective.fromName(p.objective)
    val k = obj.numGroups(p.numClass)

    // ---- distributed per-feature quantile sketch -> bin cuts ----
    val rowsRdd = input.rdd
    val cuts =
      try QuantileCuts.fromRdd(rowsRdd, p.missing, BinCuts.cutBudget(p.maxBin))
      catch { case _: UnsupportedOperationException => // empty RDD
        throw new IllegalArgumentException("empty training input") }
    val numFeatures = cuts.numFeatures
    val cutsBc = sc.broadcast(cuts)

    // ---- build per-partition state ONCE ----
    val state: RDD[PartState] = rowsRdd.mapPartitions { it =>
      val (train, evalOpt) =
        if (useExt) ExternalStorage.buildMatrices(it, hasW, hasV, hasM, esp)
        else TrainMatrix.fromRows(it, hasW, hasV, hasM)
      val eval = evalOpt.orNull
      Iterator.single(new PartState(train, eval,
        BinCuts.binMatrix(train, cutsBc.value, p.missing)))
    }.persist(StorageLevel.MEMORY_AND_DISK)
    state.count() // materialize once

    val baseMargin = obj.baseMargin(p.baseScore)
    val trees = new ArrayBuffer[Tree]
    // warm start: init trees head the ensemble; the broadcast-prefix
    // margin replay folds them in on every worker automatically
    trees ++= initTrees
    val metric = p.evalMetric.getOrElse(obj.defaultMetric(p.numClass))
    val hasEval = hasV
    var bestScore = if (EvalMetric.lowerIsBetter(metric)) Double.MaxValue else Double.MinValue
    var bestIter = -1
    var round = 0
    var stop = false
    val rng = new java.util.Random(p.seed)
    var lastBc: Broadcast[Array[Tree]] = null

    while (round < p.numRounds && !stop) {
      // Round-start tree prefix: gradients for ALL K class trees of the
      // round derive from these margins (xgboost computes grad/hess once
      // per round; advancing margins between classes would train a
      // different multi:softprob model than the single-node path).
      val prefixBc = sc.broadcast(trees.toArray)
      if (lastBc != null) lastBc.destroy()
      var cls = 0
      while (cls < k) {
        val features = sampleFeaturesSeeded(numFeatures, p.colsampleBytree, rng)
        trees += growTree(state, prefixBc, cutsBc, numFeatures, k, cls, round, p, obj, features)
        cls += 1
      }
      lastBc = prefixBc

      if (hasEval) {
        val fullBc = sc.broadcast(trees.toArray) // margins incl. this round
        val mSize = metricSize(metric)
        val agg = state.treeAggregate(null: Array[Double])(
          seqOp = { (acc, ps) =>
            ensureMargins(ps, fullBc.value, k, p, obj, baseMargin)
            val a = if (acc == null) new Array[Double](mSize) else acc
            if (ps.eval != null && ps.eval.numRows > 0)
              metricAccum(metric, ps.evalMargins, ps.eval.labels,
                ps.eval.weights, math.max(k, 2), a)
            a
          },
          combOp = { (x, y) =>
            if (x == null) y else if (y == null) x
            else {
              var i = 0
              while (i < x.length) { x(i) += y(i); i += 1 }
              x
            }
          })
        val s = if (agg == null) Double.NaN else finishMetricArr(metric, agg)
        val improved = if (EvalMetric.lowerIsBetter(metric)) s < bestScore else s > bestScore
        if (improved) { bestScore = s; bestIter = round }
        else if (p.earlyStoppingRounds > 0 && round - bestIter >= p.earlyStoppingRounds)
          stop = true
        fullBc.destroy()
      }
      round += 1
    }
    if (lastBc != null) lastBc.destroy()
    state.unpersist(blocking = false)

    val model = new BoosterModel(obj.name, p.numClass, numFeatures, baseMargin,
      trees.toArray, p.missing,
      if (hasEval) Some(bestScore) else None,
      // best_iteration counts init-booster rounds too (xgboost offsets
      // best_iteration by the warm-start booster's round count), so the
      // default predict prefix keeps the init trees PLUS the best new rounds.
      if (hasEval && p.earlyStoppingRounds > 0) Some(initTrees.length / k + bestIter) else None)
    ModelJson.toJson(model)
  }

  // ---- one tree, depth-wise; one treeAggregate per level ----
  //
  // Histogram-subtraction trick (the standard hist-GBT optimization):
  // only the LIGHTER child of each split accumulates its histogram on
  // the workers; the sibling's histogram is derived on the driver as
  // parent - child. Workers touch at most half the rows per level past
  // the root, and the aggregate moves histograms for only ~half the
  // nodes - worker CPU and network both halve at scale.
  private def growTree(state: RDD[PartState], prefixBc: Broadcast[Array[Tree]],
      cutsBc: Broadcast[BinCuts], m: Int, k: Int, cls: Int, round: Int,
      p: BoosterParams, obj: Objective, features: Array[Int]): Tree = {
    val sc = state.sparkContext
    val baseMargin = obj.baseMargin(p.baseScore)
    val unit = m * MaxBins * 2
    val feature = new ArrayBuffer[Int]
    val binIdx = new ArrayBuffer[Int]
    val defaultLeft = new ArrayBuffer[Boolean]
    val left = new ArrayBuffer[Int]
    val right = new ArrayBuffer[Int]
    val threshold = new ArrayBuffer[Float]
    val gSum = new ArrayBuffer[Double]
    val hSum = new ArrayBuffer[Double]
    val gain = new ArrayBuffer[Float]
    val loB = new ArrayBuffer[Double] // monotone weight bounds
    val hiB = new ArrayBuffer[Double]
    val allowedB = new ArrayBuffer[Array[Long]] // interaction masks (null = all)
    val um = SplitFinder.Interactions.unionMasks(p.interactionConstraints, m)

    def addNode(g: Double, h: Double,
        wLo: Double = Double.NegativeInfinity,
        wHi: Double = Double.PositiveInfinity,
        mask: Array[Long] = null): Int = {
      feature += -1; binIdx += -1; defaultLeft += true; left += -1; right += -1
      threshold += 0f; gSum += g; hSum += h; gain += 0f
      loB += wLo; hiB += wHi; allowedB += mask
      feature.length - 1
    }
    addNode(Double.NaN, Double.NaN) // root stats discovered by level-0 aggregate

    // per-level subtraction bookkeeping (driver-side)
    var prevHist: Array[Double] = null         // full hist of the previous level
    var pairParentSlot: Array[Int] = null      // per child pair: parent slot in prev level
    var pairComputeLeft: Array[Boolean] = null // per pair: which child accumulates

    var levelStart = 0
    var levelEnd = 1
    var depth = 0
    var leaves = 1
    while (depth < p.maxDepth && levelStart < levelEnd) {
      val nActive = levelEnd - levelStart
      val levelFeats = FeatureSampling.subsample(features, p.colsampleBylevel,
        FeatureSampling.levelKey(p.seed, round, cls, depth))
      // Histogram subtraction derives a sibling as parent − child, which
      // requires parent and child LEVELS to have accumulated the same
      // feature columns. colsample_bylevel draws a different set per
      // level, so under it every node accumulates directly instead.
      val noSubtract = p.colsampleBylevel < 1.0
      // children were appended in (left, right) pairs, so slots 2i/2i+1
      // of this level belong to pair i
      val computeSlot = new Array[Int](nActive)
      var nCompute = 0
      if (depth == 0) { computeSlot(0) = 0; nCompute = 1 }
      else if (noSubtract) {
        var i = 0
        while (i < nActive) { computeSlot(i) = i; i += 1 }
        nCompute = nActive
      } else {
        var i = 0
        while (i < nActive / 2) {
          val cSlot = if (pairComputeLeft(i)) 2 * i else 2 * i + 1
          val dSlot = if (pairComputeLeft(i)) 2 * i + 1 else 2 * i
          computeSlot(cSlot) = nCompute; nCompute += 1
          computeSlot(dSlot) = -1
          i += 1
        }
      }
      val partial = (feature.toArray, binIdx.toArray, defaultLeft.toArray,
        left.toArray, right.toArray, computeSlot)
      val partialBc = sc.broadcast(partial)
      val featuresBc = sc.broadcast(levelFeats)
      val histLen = nCompute * unit
      val isRootLevel = depth == 0
      // null zero: the (possibly multi-MB) histogram buffers are
      // allocated executor-side, not serialized into the closure
      val agg = state.treeAggregate(null: (Array[Double], Array[Double], Array[Double]))(
        seqOp = { (acc, ps) =>
          ensureMargins(ps, prefixBc.value, k, p, obj, baseMargin)
          ensureGrads(ps, round, k, p, obj)
          val a = if (acc == null)
            (new Array[Double](histLen), new Array[Double](1), new Array[Double](1))
          else acc
          val (pf, pb, pd, pl, pr, cs) = partialBc.value
          accumulateLevel(ps, pf, pb, pd, pl, pr, cs, isRootLevel, featuresBc.value,
            levelStart, levelEnd, k, cls, round, p, a._1, a._2, a._3)
          a
        },
        combOp = { (x, y) =>
          if (x == null) y else if (y == null) x
          else {
            var i = 0
            while (i < x._1.length) { x._1(i) += y._1(i); i += 1 }
            x._2(0) += y._2(0); x._3(0) += y._3(0)
            x
          }
        })
      partialBc.destroy()
      featuresBc.destroy()
      val (compHist, rootG, rootH) =
        if (agg == null) (new Array[Double](histLen), new Array[Double](1), new Array[Double](1))
        else agg

      // assemble the FULL level histogram: computed nodes copy in,
      // derived nodes = parent - sibling
      val hist = new Array[Double](nActive * unit)
      var s = 0
      while (s < nActive) {
        if (computeSlot(s) >= 0)
          System.arraycopy(compHist, computeSlot(s) * unit, hist, s * unit, unit)
        s += 1
      }
      if (depth > 0 && !noSubtract) {
        var i = 0
        while (i < nActive / 2) {
          val cSlot = if (pairComputeLeft(i)) 2 * i else 2 * i + 1
          val dSlot = if (pairComputeLeft(i)) 2 * i + 1 else 2 * i
          val pBase = pairParentSlot(i) * unit
          val cBase = cSlot * unit
          val dBase = dSlot * unit
          var j = 0
          while (j < unit) {
            hist(dBase + j) = prevHist(pBase + j) - hist(cBase + j)
            j += 1
          }
          i += 1
        }
      }

      if (depth == 0) { gSum(0) = rootG(0); hSum(0) = rootH(0) }
      // (child g/h sums were recorded exactly at addNode from the
      // parent's split stats - no aggregation needed past the root)

      val nextParents = new ArrayBuffer[Int]
      val nextComputeLeft = new ArrayBuffer[Boolean]
      s = 0
      while (s < nActive) {
        val node = levelStart + s
        val nodeFeats = FeatureSampling.subsample(levelFeats, p.colsampleBynode,
          FeatureSampling.nodeKey(p.seed, round, cls, node))
        val slice = java.util.Arrays.copyOfRange(hist, s * unit, (s + 1) * unit)
        if (p.maxLeaves <= 0 || leaves < p.maxLeaves)
          SplitFinder.findBest(slice, MaxBins, cutsBc.value, nodeFeats,
            gSum(node), hSum(node), p, loB(node), hiB(node), allowedB(node)).foreach { sp =>
            feature(node) = sp.feature
            binIdx(node) = sp.binIdx
            threshold(node) = sp.threshold
            defaultLeft(node) = sp.defaultLeft
            gain(node) = sp.gain.toFloat
            val (ll, lh, rl, rh) = SplitFinder.childBounds(sp, p, loB(node), hiB(node))
            val cm = if (um == null) null
              else SplitFinder.Interactions.childMask(allowedB(node), um, sp.feature)
            left(node) = addNode(sp.gl, sp.hl, ll, lh, cm)
            right(node) = addNode(sp.gr, sp.hr, rl, rh, cm)
            nextParents += s
            nextComputeLeft += (sp.hl <= sp.hr) // accumulate the lighter child
            leaves += 1
          }
        s += 1
      }
      prevHist = hist
      pairParentSlot = nextParents.toArray
      pairComputeLeft = nextComputeLeft.toArray
      levelStart = levelEnd
      levelEnd = feature.length
      depth += 1
    }

    val n = feature.length
    val w = new Array[Float](n)
    var i = 0
    while (i < n) {
      if (left(i) < 0)
        w(i) = (p.eta * SplitFinder.clamp(
          SplitFinder.leafWeightP(gSum(i), hSum(i), p), loB(i), hiB(i))).toFloat
      i += 1
    }
    new Tree(feature.toArray, threshold.toArray, defaultLeft.toArray,
      left.toArray, right.toArray, w, gain.toArray,
      hSum.map(_.toFloat).toArray)
  }

  /** Worker-side: fold any not-yet-applied trees of the broadcast prefix
    * into the transient margins (replay is deterministic, so a recomputed
    * or re-deserialized partition converges to the same state). Trees are
    * round-major: tree i contributes to class column i % k. */
  private def ensureMargins(ps: PartState, prefix: Array[Tree], k: Int,
      p: BoosterParams, obj: Objective, baseMargin: Float): Unit = {
    if (ps.margins == null) {
      ps.margins = initMargins(ps.train, baseMargin, k)
      ps.evalMargins = if (ps.eval == null) null else initMargins(ps.eval, baseMargin, k)
      ps.applied = 0
    }
    while (ps.applied < prefix.length) {
      val t = prefix(ps.applied)
      val cls = ps.applied % k
      addTreeMargins(ps.train, t, ps.margins, k, cls, p.missing)
      if (ps.eval != null) addTreeMargins(ps.eval, t, ps.evalMargins, k, cls, p.missing)
      ps.applied += 1
    }
  }

  /** Gradients for the whole round, from round-start margins, memoized. */
  private def ensureGrads(ps: PartState, round: Int, k: Int,
      p: BoosterParams, obj: Objective): Unit = {
    if (ps.cacheRound != round) {
      val n = ps.train.numRows
      if (ps.gCache == null || ps.gCache.length != n * k) {
        ps.gCache = new Array[Float](n * k)
        ps.hCache = new Array[Float](n * k)
      }
      if (n > 0)
        obj.gradHess(ps.margins, ps.train.labels, effectiveWeights(ps.train, p),
          k, ps.gCache, ps.hCache)
      ps.cacheRound = round
    }
  }

  /** Worker-side: route rows through the partial tree on binned values,
    * accumulate histograms ONLY for the level's compute-designated nodes
    * (the lighter child of each split; siblings are derived driver-side
    * by subtraction). Root level also aggregates the node g/h sums. */
  private def accumulateLevel(ps: PartState,
      tFeature: Array[Int], tBinIdx: Array[Int], tDefaultLeft: Array[Boolean],
      tLeft: Array[Int], tRight: Array[Int], computeSlot: Array[Int],
      isRootLevel: Boolean, features: Array[Int],
      levelStart: Int, levelEnd: Int, k: Int, cls: Int,
      round: Int, p: BoosterParams,
      hist: Array[Double], rootG: Array[Double], rootH: Array[Double]): Unit = {
    val mat = ps.train
    val n = mat.numRows
    if (n == 0) return
    val m = mat.numCols
    val g = ps.gCache
    val h = ps.hCache
    // position cache for the tree under growth (see PartState.nodePos):
    // reset to the root when a new (round, cls) tree starts
    if (ps.nodePos == null || ps.nodePos.length != n) ps.nodePos = new Array[Int](n)
    if (ps.posRound != round || ps.posCls != cls) {
      java.util.Arrays.fill(ps.nodePos, 0)
      ps.posRound = round; ps.posCls = cls
    }
    val pos = ps.nodePos

    var i = 0
    while (i < n) {
      if (p.subsample >= 1.0 || sampledRow(p.seed, round, i, mat, p.subsample)) {
        // resume routing from the stored node: only the steps the levels
        // since the last visit appended are walked (amortized one step
        // per level instead of a root walk)
        var node = pos(i)
        var depth = 0
        while (tLeft(node) >= 0 && depth < 64) {
          val b = ps.binned(i * m + tFeature(node)) & 0xff
          val goLeft =
            if (b == BinCuts.MissingBin) tDefaultLeft(node)
            else b <= tBinIdx(node)
          node = if (goLeft) tLeft(node) else tRight(node)
          depth += 1
        }
        pos(i) = node
        if (node >= levelStart && node < levelEnd) {
          val gi = g(i * k + cls)
          val hi = h(i * k + cls)
          if (isRootLevel) { rootG(0) += gi; rootH(0) += hi }
          val slot = computeSlot(node - levelStart)
          if (slot >= 0) {
            val histBase = slot * m * MaxBins * 2
            var fi = 0
            while (fi < features.length) {
              val f = features(fi)
              val b = ps.binned(i * m + f) & 0xff
              if (b != BinCuts.MissingBin) {
                val idx = histBase + (f * MaxBins + b) * 2
                hist(idx) += gi
                hist(idx + 1) += hi
              }
              fi += 1
            }
          }
        }
      }
      i += 1
    }
  }


  private[ml] def effectiveWeights(mat: TrainMatrix, p: BoosterParams): Array[Float] = {
    if (p.scalePosWeight != 1.0 && p.objective == "binary:logistic") {
      val w = new Array[Float](mat.numRows)
      var i = 0
      while (i < mat.numRows) {
        val base = if (mat.weights == null) 1.0f else mat.weights(i)
        w(i) = if (mat.labels(i) == 1.0f) (base * p.scalePosWeight).toFloat else base
        i += 1
      }
      w
    } else mat.weights
  }

  /** Deterministic per-(seed, round, row) Bernoulli draw so recomputed
    * partitions sample identically. */
  private def sampledRow(seed: Long, round: Int, i: Int, mat: TrainMatrix,
      subsample: Double): Boolean = {
    var x = seed * 6364136223846793005L + round * 1442695040888963407L + i * 2862933555777941757L
    x ^= (x >>> 33); x *= 0xff51afd7ed558ccdL; x ^= (x >>> 33)
    ((x >>> 11).toDouble / (1L << 53).toDouble) < subsample
  }

  private def initMargins(mat: TrainMatrix, base: Float, k: Int): Array[Float] = {
    val out = new Array[Float](mat.numRows * k)
    java.util.Arrays.fill(out, base)
    if (mat.baseMargins != null) {
      var r = 0
      while (r < mat.numRows) {
        var c = 0
        while (c < k) { out(r * k + c) += mat.baseMargins(r); c += 1 }
        r += 1
      }
    }
    out
  }

  /** Folds one tree's contribution into class column `cls` in place (all
    * rows, raw feature values — same as the single-node trainer). */
  private def addTreeMargins(mat: TrainMatrix, tree: Tree, margins: Array[Float],
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

  private def sampleFeaturesSeeded(m: Int, colsample: Double, rng: java.util.Random): Array[Int] = {
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

  /** Decomposable metric pieces (weighted numerator, weight sum). */
  private[ml] def metricParts(metric: String, margins: Array[Float], labels: Array[Float],
      weights: Array[Float], numClass: Int): (Double, Double) = {
    val n = labels.length
    var num = 0.0
    var den = 0.0
    var i = 0
    metric match {
      case "rmse" =>
        while (i < n) {
          val w = if (weights == null) 1.0 else weights(i)
          val d = margins(i) - labels(i)
          num += w * d * d; den += w; i += 1
        }
      case "mae" =>
        while (i < n) {
          val w = if (weights == null) 1.0 else weights(i)
          num += w * math.abs(margins(i) - labels(i)); den += w; i += 1
        }
      case "logloss" =>
        while (i < n) {
          val w = if (weights == null) 1.0 else weights(i)
          val p = math.min(math.max(Objective.sigmoid(margins(i)), 1e-16), 1 - 1e-16)
          num += -w * (labels(i) * math.log(p) + (1 - labels(i)) * math.log(1 - p))
          den += w; i += 1
        }
      case "mlogloss" =>
        while (i < n) {
          val w = if (weights == null) 1.0 else weights(i)
          val off = i * numClass
          var mx = Double.MinValue
          var c = 0
          while (c < numClass) { if (margins(off + c) > mx) mx = margins(off + c); c += 1 }
          var s = 0.0
          c = 0
          while (c < numClass) { s += math.exp(margins(off + c) - mx); c += 1 }
          num += -w * (margins(off + labels(i).toInt) - mx - math.log(s))
          den += w; i += 1
        }
      case "error" =>
        while (i < n) {
          val w = if (weights == null) 1.0 else weights(i)
          if ((if (Objective.sigmoid(margins(i)) > 0.5) 1.0 else 0.0) != labels(i)) num += w
          den += w; i += 1
        }
      case "merror" =>
        while (i < n) {
          val w = if (weights == null) 1.0 else weights(i)
          val off = i * numClass
          var best = 0
          var c = 1
          while (c < numClass) { if (margins(off + c) > margins(off + best)) best = c; c += 1 }
          if (best != labels(i).toInt) num += w
          den += w; i += 1
        }
      case "poisson-nloglik" =>
        while (i < n) {
          val w = if (weights == null) 1.0 else weights(i)
          val mu = math.max(math.exp(margins(i)), 1e-16)
          num += w * (mu - labels(i) * math.log(mu) +
            org.apache.commons.math3.special.Gamma.logGamma(labels(i) + 1.0))
          den += w; i += 1
        }
      case other => throw new IllegalArgumentException(s"unsupported eval_metric: $other")
    }
    (num, den)
  }

  private[ml] def finishMetric(metric: String, num: Double, den: Double): Double =
    if (den == 0) Double.NaN
    else if (metric == "rmse") math.sqrt(num / den)
    else num / den

  // ---- array-shaped metric aggregation (sums across workers) ----
  // Pair metrics use [num, den]; AUC uses the 2·AucBins score histogram.

  private[ml] def metricSize(metric: String): Int =
    if (metric == "auc") 2 * EvalMetric.AucBins else 2

  private[ml] def metricAccum(metric: String, margins: Array[Float], labels: Array[Float],
      weights: Array[Float], numClass: Int, acc: Array[Double]): Unit = {
    if (metric == "auc") EvalMetric.aucAccum(margins, labels, weights, acc)
    else {
      val (num, den) = metricParts(metric, margins, labels, weights, numClass)
      acc(0) += num
      acc(1) += den
    }
  }

  private[ml] def finishMetricArr(metric: String, acc: Array[Double]): Double =
    if (metric == "auc") EvalMetric.aucFinish(acc)
    else finishMetric(metric, acc(0), acc(1))
}

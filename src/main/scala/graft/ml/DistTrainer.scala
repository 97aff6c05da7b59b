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
  * per-partition gradient histograms with `treeAggregate` per tree level:
  *
  *   - data: RDD[PartState] — per-partition binned matrix + running margins,
  *     persisted MEMORY_AND_DISK; margins advance by pure `map` (correct
  *     under recomputation), lineage truncated by periodic localCheckpoint;
  *   - per level: one treeAggregate of (node × feature × bin) grad/hess
  *     sums → driver finds splits with the same [[SplitFinder]] as the
  *     single-node path → every worker sees the identical tree, which is
  *     the invariant Rabit provided ("all workers end with the same model");
  *   - cuts: driver-side quantile sketch over a bounded sample, broadcast.
  *
  * At scale this shuffles the training set once (the repartition), then
  * only moves O(nodes·features·bins) histograms per level — independent of
  * row count, the property that makes histogram GBT viable at 100 TB.
  */
object DistTrainer {
  private val MaxBins = 256
  private val SampleForCuts = 200000
  private val CheckpointEvery = 16

  /** Per-partition training state. Immutable per round; margin advance
    * maps to a new instance, so `margins` always holds ROUND-START margins
    * while the round's trees grow — the invariant that keeps numWorkers>1
    * multiclass training equal to the single-node path (gradients for all
    * K class trees of a round come from the same margins).
    *
    * `gCache`/`hCache` memoize the per-round gradients (they depend only
    * on the round-start margins): the first treeAggregate level computes
    * them, later levels and later classes of the round reuse. @transient —
    * a partition recomputed or re-read from disk just recomputes them
    * (idempotent), and they never travel over the wire. */
  private final class PartState(
      val train: TrainMatrix,
      val eval: TrainMatrix, // null when absent
      val binned: Array[Byte],
      val margins: Array[Float],
      val evalMargins: Array[Float]) extends Serializable {
    @transient var gCache: Array[Float] = _
    @transient var hCache: Array[Float] = _
  }

  /** Partial tree broadcast to workers for row routing during growth. */
  private final case class PartialTree(
      feature: Array[Int], binIdx: Array[Int], defaultLeft: Array[Boolean],
      left: Array[Int], right: Array[Int])

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
      p: BoosterParams, numWorkers: Int, forceRepartition: Boolean,
      useExt: Boolean = false, esp: Int = 5): String = {
    val spark = projected.sparkSession
    val sc = spark.sparkContext
    val input =
      if (forceRepartition || needsRepartition(projected, numWorkers))
        projected.repartition(numWorkers)
      else projected

    val obj = Objective.fromName(p.objective)
    val k = obj.numGroups(p.numClass)

    // ---- quantile cuts from a bounded driver-side sample ----
    val rowsRdd = input.rdd
    val sampleRows = rowsRdd.takeSample(withReplacement = false, SampleForCuts min 100000, p.seed)
    require(sampleRows.nonEmpty, "empty training input")
    val (sampleM, _) = TrainMatrix.fromRows(sampleRows.iterator, hasW, hasV, hasM)
    val cuts = BinCuts.fromMatrix(sampleM, p.missing)
    val numFeatures = cuts.numFeatures
    val cutsBc = sc.broadcast(cuts)

    // ---- build per-partition state ----
    val baseMargin = obj.baseMargin(p.baseScore)
    var state: RDD[PartState] = rowsRdd.mapPartitions { it =>
      val (train, evalOpt) =
        if (useExt) ExternalStorage.buildMatrices(it, hasW, hasV, hasM, esp)
        else TrainMatrix.fromRows(it, hasW, hasV, hasM)
      val eval = evalOpt.orNull
      val binned = BinCuts.binMatrix(train, cutsBc.value, p.missing)
      Iterator.single(new PartState(train, eval, binned,
        initMargins(train, baseMargin, k), if (eval == null) null else initMargins(eval, baseMargin, k)))
    }.persist(StorageLevel.MEMORY_AND_DISK)
    state.count() // materialize once

    val trees = new ArrayBuffer[Tree]
    val metric = p.evalMetric.getOrElse(obj.defaultMetric(p.numClass))
    val hasEval = hasV
    var bestScore = Double.MaxValue
    var bestIter = -1
    var round = 0
    var stop = false
    val rng = new java.util.Random(p.seed)

    while (round < p.numRounds && !stop) {
      // Grow ALL K class trees of the round from the same (round-start)
      // margins — xgboost computes grad/hess once per round for all
      // classes; advancing margins between classes trains a different
      // multi:softprob model than the single-node path.
      val roundTrees = new Array[Tree](k)
      var cls = 0
      while (cls < k) {
        val features = sampleFeaturesSeeded(numFeatures, p.colsampleBytree, rng)
        roundTrees(cls) = growTree(state, cutsBc, numFeatures, k, cls, round, p, obj, features)
        trees += roundTrees(cls)
        cls += 1
      }

      // one margin-advance map per round with all K trees (pure — replayable)
      val treesBc = sc.broadcast(roundTrees)
      val prev = state
      state = prev.map { ps =>
        new PartState(ps.train, ps.eval, ps.binned,
          addTreesMargins(ps.train, treesBc.value, ps.margins, k, p.missing),
          if (ps.eval == null) null
          else addTreesMargins(ps.eval, treesBc.value, ps.evalMargins, k, p.missing))
      }.persist(StorageLevel.MEMORY_AND_DISK)
      if (round % CheckpointEvery == CheckpointEvery - 1) state.localCheckpoint()
      state.count()
      prev.unpersist(blocking = false)

      if (hasEval) {
        val (num, den) = state.treeAggregate((0.0, 0.0))(
          seqOp = { case ((a, b), ps) =>
            if (ps.eval == null || ps.eval.numRows == 0) (a, b)
            else {
              val (n2, d2) = metricParts(metric, ps.evalMargins, ps.eval.labels,
                ps.eval.weights, math.max(k, 2))
              (a + n2, b + d2)
            }
          },
          combOp = { case ((a, b), (c, d)) => (a + c, b + d) })
        val s = finishMetric(metric, num, den)
        if (s < bestScore) { bestScore = s; bestIter = round }
        else if (p.earlyStoppingRounds > 0 && round - bestIter >= p.earlyStoppingRounds)
          stop = true
      }
      round += 1
    }
    state.unpersist(blocking = false)

    val model = new BoosterModel(obj.name, p.numClass, numFeatures, baseMargin,
      trees.toArray, p.missing,
      if (hasEval) Some(bestScore) else None,
      if (hasEval && p.earlyStoppingRounds > 0) Some(bestIter) else None)
    ModelJson.toJson(model)
  }

  // ---- one tree, depth-wise; one treeAggregate per level ----
  private def growTree(state: RDD[PartState], cutsBc: Broadcast[BinCuts],
      m: Int, k: Int, cls: Int, round: Int, p: BoosterParams,
      obj: Objective, features: Array[Int]): Tree = {
    val sc = state.sparkContext
    val feature = new ArrayBuffer[Int]
    val binIdx = new ArrayBuffer[Int]
    val defaultLeft = new ArrayBuffer[Boolean]
    val left = new ArrayBuffer[Int]
    val right = new ArrayBuffer[Int]
    val threshold = new ArrayBuffer[Float]
    val gSum = new ArrayBuffer[Double]
    val hSum = new ArrayBuffer[Double]

    def addNode(g: Double, h: Double): Int = {
      feature += -1; binIdx += -1; defaultLeft += true; left += -1; right += -1
      threshold += 0f; gSum += g; hSum += h
      feature.length - 1
    }
    addNode(Double.NaN, Double.NaN) // root stats discovered by level-0 aggregate

    var levelStart = 0
    var levelEnd = 1
    var depth = 0
    while (depth < p.maxDepth && levelStart < levelEnd) {
      val nActive = levelEnd - levelStart
      val partial = PartialTree(feature.toArray, binIdx.toArray,
        defaultLeft.toArray, left.toArray, right.toArray)
      val partialBc = sc.broadcast(partial)
      val featuresBc = sc.broadcast(features)
      val histLen = nActive * m * MaxBins * 2
      val (hist, nodeG, nodeH) = state.treeAggregate(
        (new Array[Double](histLen), new Array[Double](nActive), new Array[Double](nActive)))(
        seqOp = { case ((h0, ng, nh), ps) =>
          accumulateLevel(ps, partialBc.value, featuresBc.value, cutsBc.value,
            levelStart, levelEnd, k, cls, round, p, obj, h0, ng, nh)
          (h0, ng, nh)
        },
        combOp = { case ((h1, g1, hh1), (h2, g2, hh2)) =>
          var i = 0
          while (i < h1.length) { h1(i) += h2(i); i += 1 }
          i = 0
          while (i < g1.length) { g1(i) += g2(i); hh1(i) += hh2(i); i += 1 }
          (h1, g1, hh1)
        })
      partialBc.destroy()
      featuresBc.destroy()

      var s = 0
      while (s < nActive) {
        val node = levelStart + s
        gSum(node) = nodeG(s)
        hSum(node) = nodeH(s)
        val slice = java.util.Arrays.copyOfRange(hist, s * m * MaxBins * 2, (s + 1) * m * MaxBins * 2)
        SplitFinder.findBest(slice, MaxBins, cutsBc.value, features,
          nodeG(s), nodeH(s), p).foreach { sp =>
          feature(node) = sp.feature
          binIdx(node) = sp.binIdx
          threshold(node) = sp.threshold
          defaultLeft(node) = sp.defaultLeft
          left(node) = addNode(sp.gl, sp.hl)
          right(node) = addNode(sp.gr, sp.hr)
        }
        s += 1
      }
      levelStart = levelEnd
      levelEnd = feature.length
      depth += 1
    }

    val n = feature.length
    val w = new Array[Float](n)
    var i = 0
    while (i < n) {
      if (left(i) < 0)
        w(i) = (p.eta * SplitFinder.leafWeight(gSum(i), hSum(i), p.lambda, p.alpha)).toFloat
      i += 1
    }
    new Tree(feature.toArray, threshold.toArray, defaultLeft.toArray,
      left.toArray, right.toArray, w)
  }

  /** Worker-side: gradients from ROUND-START margins (memoized on the
    * PartState — identical for every level and class of the round), route
    * rows through the partial tree on binned values, accumulate the level
    * histogram. */
  private def accumulateLevel(ps: PartState, t: PartialTree, features: Array[Int],
      cuts: BinCuts, levelStart: Int, levelEnd: Int, k: Int, cls: Int,
      round: Int, p: BoosterParams, obj: Objective,
      hist: Array[Double], nodeG: Array[Double], nodeH: Array[Double]): Unit = {
    val mat = ps.train
    val n = mat.numRows
    if (n == 0) return
    val m = mat.numCols
    if (ps.gCache == null) {
      val g0 = new Array[Float](n * k)
      val h0 = new Array[Float](n * k)
      obj.gradHess(ps.margins, mat.labels, effectiveWeights(mat, p), k, g0, h0)
      ps.gCache = g0
      ps.hCache = h0
    }
    val g = ps.gCache
    val h = ps.hCache

    var i = 0
    while (i < n) {
      if (p.subsample >= 1.0 || sampledRow(p.seed, round, i, mat, p.subsample)) {
        // route through partial tree on bins
        var node = 0
        var depth = 0
        while (t.left(node) >= 0 && depth < 64) {
          val b = ps.binned(i * m + t.feature(node)) & 0xff
          val goLeft =
            if (b == BinCuts.MissingBin) t.defaultLeft(node)
            else b <= t.binIdx(node)
          node = if (goLeft) t.left(node) else t.right(node)
          depth += 1
        }
        if (node >= levelStart && node < levelEnd) {
          val slot = node - levelStart
          val gi = g(i * k + cls)
          val hi = h(i * k + cls)
          nodeG(slot) += gi
          nodeH(slot) += hi
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

  /** New margins after one full round: trees(c) contributes to class
    * column c. One row-materialization pass serves all K trees. */
  private def addTreesMargins(mat: TrainMatrix, trees: Array[Tree],
      margins: Array[Float], k: Int, missing: Float): Array[Float] = {
    val out = margins.clone()
    val m = mat.numCols
    val row = new Array[Float](m)
    var i = 0
    while (i < mat.numRows) {
      System.arraycopy(mat.values, i * m, row, 0, m)
      if (!missing.isNaN) {
        var f = 0
        while (f < m) { if (row(f) == missing) row(f) = Float.NaN; f += 1 }
      }
      var c = 0
      while (c < k) { out(i * k + c) += trees(c).predict(row); c += 1 }
      i += 1
    }
    out
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
      case other => throw new IllegalArgumentException(s"unsupported eval_metric: $other")
    }
    (num, den)
  }

  private[ml] def finishMetric(metric: String, num: Double, den: Double): Double =
    if (den == 0) Double.NaN
    else if (metric == "rmse") math.sqrt(num / den)
    else num / den
}

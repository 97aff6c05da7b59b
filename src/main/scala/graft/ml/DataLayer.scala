package graft.ml

import org.apache.spark.ml.linalg.{DenseVector, SparseVector, Vector}
import org.apache.spark.sql.Row

import scala.collection.mutable.ArrayBuilder

/** Dense row-major training matrix plus per-row label/weight/margin arrays.
  *
  * Mirrors the reference's partition→matrix conversion (reference
  * `sparkdl/xgboost/data.py:133-200`): batches of rows are accumulated into
  * one dense float32 matrix per partition. Sparse vectors are DENSIFIED —
  * inactive entries become 0.0f values, not "missing" (reference
  * `xgboost_core.py:780-784`); only NaN (or a user-supplied `missing`
  * sentinel, remapped to NaN at bin time) is treated as missing.
  */
final class TrainMatrix(
    val numRows: Int,
    val numCols: Int,
    val values: Array[Float],       // row-major, length numRows*numCols
    val labels: Array[Float],       // length numRows (0-length if unlabeled)
    val weights: Array[Float],      // null when no weight column
    val baseMargins: Array[Float]) { // null when no base-margin column
  def isEmpty: Boolean = numRows == 0
  def apply(row: Int, col: Int): Float = values(row * numCols + col)
}

object TrainMatrix {
  /** Accumulates rows into dense matrices; validates constant feature dim
    * (reference `data.py:120-130`); optionally splits rows into
    * (train, validation) on a boolean indicator column
    * (reference `data.py:158-160`).
    *
    * Expected row layout (by position, produced by the estimator's
    * projection): 0=features Vector, 1=label (optional — pass hasLabel),
    * then weight / validationIndicator / baseMargin when present.
    */
  final class Builder(hasWeight: Boolean, hasMargin: Boolean) {
    private val vals = new ArrayBuilder.ofFloat
    private val labs = new ArrayBuilder.ofFloat
    private val wts = new ArrayBuilder.ofFloat
    private val margins = new ArrayBuilder.ofFloat
    private var dim: Int = -1
    private var n: Int = 0
    vals.sizeHint(1 << 16)

    def add(features: Vector, label: Float, weight: Float, margin: Float): Unit = {
      if (dim < 0) dim = features.size
      else require(features.size == dim,
        s"feature dimension mismatch: got ${features.size}, expected $dim")
      features match {
        case d: DenseVector =>
          val a = d.values
          var i = 0
          while (i < dim) { vals += a(i).toFloat; i += 1 }
        case s: SparseVector =>
          // densify: inactive entries are real 0.0 values (not missing)
          val row = new Array[Float](dim)
          val idx = s.indices
          val sv = s.values
          var i = 0
          while (i < idx.length) { row(idx(i)) = sv(i).toFloat; i += 1 }
          vals ++= row
      }
      labs += label
      if (hasWeight) wts += weight
      if (hasMargin) margins += margin
      n += 1
    }

    def result(): TrainMatrix = new TrainMatrix(
      n, math.max(dim, 0), vals.result(), labs.result(),
      if (hasWeight) wts.result() else null,
      if (hasMargin) margins.result() else null)
  }

  /** Builds (train, Option[validation]) matrices from a partition iterator.
    * Column positions in each Row: features, label, [weight], [isVal], [margin]
    * — presence flags mirror the reference's `_fit` projection order
    * (reference `xgboost_core.py:439-467`).
    */
  def fromRows(
      rows: Iterator[Row],
      hasWeight: Boolean,
      hasValidation: Boolean,
      hasMargin: Boolean): (TrainMatrix, Option[TrainMatrix]) = {
    val train = new Builder(hasWeight, hasMargin)
    val valid = if (hasValidation) new Builder(hasWeight, hasMargin) else null
    rows.foreach { r =>
      val features = r.getAs[Vector](0)
      val label = numAt(r, 1)
      var pos = 2
      val weight = if (hasWeight) { val w = numAt(r, pos); pos += 1; w } else 1.0f
      val isVal = hasValidation && { val v = r.getBoolean(pos); pos += 1; v }
      val margin = if (hasMargin) { val m = numAt(r, pos); pos += 1; m } else 0.0f
      val b = if (isVal) valid else train
      b.add(features, label, weight, margin)
    }
    (train.result(), Option(valid).map(_.result()).filter(!_.isEmpty))
  }

  private def numAt(r: Row, i: Int): Float = r.get(i) match {
    case null => Float.NaN
    case n: java.lang.Number => n.floatValue()
    case b: java.lang.Boolean => if (b) 1.0f else 0.0f
    case other => throw new IllegalArgumentException(
      s"non-numeric value at position $i: $other")
  }
}

package graft.ml

import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Distributed quantile-sketch bin cuts: equivalence with the exact
  * per-feature construction at small N, and sanity at larger N.
  */
class QuantileCutsSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark

  private def rowsRdd(values: Seq[Array[Double]]) =
    spark.sparkContext.parallelize(
      values.map(v => Row(Vectors.dense(v), 0.0)), 4)

  test("cuts bracket the data and bin monotonically") {
    val rng = new scala.util.Random(13)
    val data = Seq.fill(5000)(Array(rng.nextGaussian(), rng.nextDouble() * 100))
    val cuts = QuantileCuts.fromRdd(rowsRdd(data), Float.NaN)
    assert(cuts.numFeatures == 2)
    (0 until 2).foreach { f =>
      val c = cuts.cuts(f)
      assert(c.length > 50, s"expected many cuts for a continuous feature: ${c.length}")
      assert(c.sameElements(c.sorted))
      // every data value lands in a valid bin and binning is monotone
      val samples = data.map(_(f).toFloat).sorted
      val bins = samples.map(cuts.binOf(f, _))
      assert(bins.head >= 0 && bins.last <= c.length)
      assert(bins.sameElements(bins.sorted), "binOf must be monotone in the value")
    }
  }

  test("low-cardinality features get near-exact cuts (quantiles hit the values)") {
    val data = Seq.tabulate(1000)(i => Array((i % 5).toDouble))
    val cuts = QuantileCuts.fromRdd(rowsRdd(data), Float.NaN)
    // values 0..4 → thresholds must separate all five groups
    val c = cuts.cuts(0)
    val binsOfValues = (0 to 4).map(v => cuts.binOf(0, v.toFloat))
    assert(binsOfValues.distinct.length == 5,
      s"each distinct value needs its own bin: $binsOfValues (cuts ${c.toSeq})")
  }

  test("missing sentinel values stay out of the sketch") {
    val data = Seq.tabulate(100)(i => Array(if (i % 2 == 0) -999.0 else i.toDouble))
    val cuts = QuantileCuts.fromRdd(rowsRdd(data), -999.0f)
    assert(cuts.cuts(0).forall(_ != -999.0f))
    assert(cuts.binOf(0, Float.NaN) == BinCuts.MissingBin)
  }
}

package graft.ml

import org.scalatest.funsuite.AnyFunSuite

/** C7: the repartition-avoidance check — a direct pattern match on the
  * optimized logical plan instead of the reference's explain-text parsing
  * (reference xgboost_core.py:291-321, tested at
  * xgboost_cluster_test.py:308-325).
  */
class RepartitionHeuristicSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def df = Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")).toDF("k", "v")

  test("plan already ending in repartition(n) skips the extra shuffle") {
    assert(!DistTrainer.needsRepartition(df.repartition(3), 3))
  }

  test("repartition with the wrong count still repartitions") {
    assert(DistTrainer.needsRepartition(df.repartition(2), 3))
  }

  test("plain scans and keyed repartitions still repartition") {
    assert(DistTrainer.needsRepartition(df, 3))
    assert(DistTrainer.needsRepartition(df.repartition(3, $"k"), 3))
    assert(DistTrainer.needsRepartition(df.select($"k"), 3))
  }
}

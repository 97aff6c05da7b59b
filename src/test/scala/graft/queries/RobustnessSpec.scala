package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkEntry

/** Every registered query must survive EMPTY input tables (schema
  * present, zero rows) — the shape a partition-pruned read or a
  * filtered-to-nothing upstream stage hands an operator at 100 TB all
  * the time. Round 2's minhash kernel crash on empty text is the class
  * of bug this guards against.
  *
  * Queries whose CONTRACT requires data (driver-collected scalars over a
  * known-nonempty table, ML training which cannot fit on zero rows) are
  * listed with their reason instead of skipped silently.
  */
class RobustnessSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark

  /** Contract-requires-data queries: name → why empty input is outside
    * the operator's domain (mirrors the reference, which also throws when
    * fit() sees zero rows). */
  private val requiresData: Map[String, String] = Map(
    "q_ml_train_predict_reg" -> "GBT fit on zero rows is undefined (reference raises too)",
    "q_ml_train_predict_cls" -> "classifier objective inference needs observed labels",
    "q_ml_train_predict_cls_dist" -> "classifier objective inference needs observed labels (distributed fit on zero rows is undefined)",
    "q_ml_train_predict_dist" -> "distributed fit on zero rows is undefined",
    "q_ml_train_predict_barrier" -> "barrier fit on zero rows is undefined",
    "q_ml_train_predict_scale" -> "distributed fit on zero rows is undefined",
    "q_ml_train_predict_ext" -> "external-storage fit on zero rows is undefined (reference raises too)",
    "q_ml_early_stop" -> "early stopping needs a non-empty validation set to score rounds",
    "q_ml_warm_start" -> "warm-start fit on zero rows is undefined (no rounds to continue from)",
    "q_s9_collect_scalar" -> "driver-collected scalar's contract is a non-empty lookup",
    "q_drift_detect" -> "drift against an empty side is undefined; histogramDrift fails loudly by contract"
  )

  private lazy val emptyDir: String = {
    // events.ts is TIMESTAMP(NANOS): set the conf before ANY read, like
    // Tables.events does (the fixture copies every table's schema)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = java.nio.file.Files.createTempDirectory("sfempty").toString
    graft.Tables.names.foreach { t =>
      graft.Tables.load(spark, "/root/testdata/sf0.001", t)
        .limit(0).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every query runs on empty tables (or declares why it cannot)") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      if (requiresData.contains(name)) None
      else {
        try { fn(spark, emptyDir).count(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(180)}")
        }
      }
    }
    assert(failures.isEmpty, "queries crashing on empty input:\n" + failures.mkString("\n"))
  }

  test("the requiresData list only names registered queries") {
    val unknown = requiresData.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"stale requiresData entries: $unknown")
  }
}

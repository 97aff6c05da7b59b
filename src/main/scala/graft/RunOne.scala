package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: run ONE registered query N times (JIT/warm-cache aware
  * timing) and optionally dump its formatted plan.
  *
  * Usage: runMain graft.RunOne <queryName> <sfDir> [reps] [explain]
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val reps = if (args.length > 2) args(2).toInt else 2
    val doExplain = args.contains("explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    // shared session config (incl. typed-aggregate fallback threshold):
    // GraftSession, pinned by SessionConfigSpec
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    if (doExplain) fn(spark, sfDir).explain("formatted")
    if (args.contains("show")) fn(spark, sfDir).show(60, truncate = false)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      // same full-result materialization as Bench — count() would let
      // Catalyst prune unreferenced heavy subtrees and time a smaller plan
      val n = Bench.materialize(fn(spark, sfDir))
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s  ($n rows)")
    }
    spark.stop()
  }
}

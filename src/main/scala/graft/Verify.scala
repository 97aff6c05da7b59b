package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // shared session config (incl. typed-aggregate fallback threshold):
    // GraftSession, pinned by SessionConfigSpec
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // pin the COLLAPSED tier for the correctness gate: the sf0.01 fixture
    // is ~all-distinct, so the auto tier would verify only the identity
    // (textbook) forms and leave the 100-TB collapse path oracle-ungated.
    // Both tiers are row-identical (CollapseDifferentialSpec); gating the
    // nontrivial one is the point. Bench runs "auto" — what production
    // would. SPARK_GRAFT_COLLAPSE_MODE overrides for builder-local
    // both-tier sweeps (never|auto), as run for the r16 record.
    spark.conf.set(graft.operators.Dedup.CollapseModeConf,
      sys.env.getOrElse("SPARK_GRAFT_COLLAPSE_MODE", "always"))
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_ONLY=q_a,q_b — builder-local subset iteration (same
    // convention as Bench); the driver runs unfiltered.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only.fold(SparkEntry.queries)(
      names => SparkEntry.queries.filter(kv => names(kv._1)))
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // sweep persisted intermediates leaked by operators whose result
      // plan depends on them (see Bench) — 150+ queries in one JVM would
      // otherwise accumulate evicting caches
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val oracles = only.fold(SparkEntry.oracleSql)(
      names => SparkEntry.oracleSql.filter(kv => names(kv._1)))
    val json = oracles
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}

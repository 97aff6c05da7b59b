package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (guide: one session per suite;
  * sharing across suites in the same JVM is fine since config matches). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    // shared session config (incl. typed-aggregate fallback threshold):
    // GraftSession, pinned by SessionConfigSpec
    val s = GraftSession.builder("local[4]", 4)
      .appName("graft-test")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

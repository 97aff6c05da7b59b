package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the shared-session-config contract (VERDICT r12 #6): the
  * ObjectHashAggregate fallback threshold must be set in EVERY session
  * this repo builds, because the failure mode of losing it is not
  * wrongness but a silent ~36× slowdown (the stock 128-key fallback
  * degenerates bounded-top-k cuts into full sorts — measured on
  * q_label_consistency at the 100× fixture).
  *
  * Two layers:
  *   1. runtime — the live test session (built via GraftSession.builder)
  *      actually carries the threshold and the shared knobs;
  *   2. structural — every entry-point source file routes through
  *      GraftSession.builder and none rebuilds SparkSession.builder()
  *      directly, so a future entry point cannot silently drop a knob.
  */
class SessionConfigSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("live session carries the fallback threshold and shared knobs") {
    assert(spark.conf.get(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
      == GraftSession.FallbackThreshold.toString)
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
    assert(spark.conf.get("spark.ui.enabled") == "false")
  }

  test("GraftSession.builder sets the threshold for every master/cpus shape") {
    // the builder's config map is what every entry point inherits; check
    // it directly rather than spinning extra sessions (one JVM, one SC)
    val b = GraftSession.builder("local[2]", 2)
    // options() is a public accessor on SparkSessionBuilder (the api
    // superclass) — getMethod resolves it through the hierarchy
    val f = b.getClass.getMethod("options")
    val opts = f.invoke(b).asInstanceOf[scala.collection.Map[String, String]]
    assert(opts("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
      == GraftSession.FallbackThreshold.toString)
    assert(opts("spark.sql.shuffle.partitions") == "2")
    assert(opts("spark.master") == "local[2]")
  }

  test("every entry point routes through GraftSession.builder (no direct " +
      "SparkSession.builder in a main)") {
    val entryPoints = Seq(
      "src/main/scala/graft/Bench.scala",
      "src/main/scala/graft/Verify.scala",
      "src/main/scala/graft/RunOne.scala",
      "src/main/scala/graft/Plans.scala",
      "src/test/scala/graft/SparkTestSession.scala")
    entryPoints.foreach { p =>
      val path = Paths.get(p)
      assert(Files.exists(path), s"entry point moved: $p — update this spec")
      val src = new String(Files.readAllBytes(path), "UTF-8")
      assert(src.contains("GraftSession.builder"),
        s"$p no longer routes through GraftSession.builder — the " +
          "fallback-threshold contract is broken")
      assert(!src.contains("SparkSession.builder"),
        s"$p builds a raw SparkSession.builder() — config knobs will " +
          "silently diverge from GraftSession")
    }
    // and no OTHER main-source file quietly builds its own session either
    import scala.jdk.CollectionConverters._
    val offenders = Files.walk(Paths.get("src/main/scala")).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .filterNot(p => p.toString.endsWith("GraftSession.scala"))
      .filter(p => new String(Files.readAllBytes(p), "UTF-8")
        .contains("SparkSession.builder"))
      .map(_.toString).toSeq
    assert(offenders.isEmpty,
      s"main sources building raw sessions outside GraftSession: $offenders")
  }
}

package graft.sources

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

class GraftSinkSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_sink_$tag").toFile
    d.getAbsolutePath
  }

  test("round-trips atomic types, nulls, and JSON-hostile strings exactly") {
    val out = freshDir("rt")
    val df = Seq(
      (1L, Some("""plain"""), Some(1.5)),
      (2L, Some("quote \" backslash \\ newline \n tab \t done"), Some(-0.125)),
      (3L, None: Option[String], None: Option[Double]),
      (4L, Some("unicode é中 control "), Some(1.0e-300))
    ).toDF("id", "s", "d").repartition(3)
    df.write.format("graft-sink").option("path", out).mode("append").save()
    val back = spark.read.schema(df.schema).json(s"$out/part-*.jsonl")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    val orig = df.collect().map(r => (r.getLong(0), Option(r.getString(1)),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(back === orig)
    // no corrupt-record fallout: every line parsed under the strict schema
    assert(spark.read.schema(df.schema).json(s"$out/part-*.jsonl").count() === 4)
  }

  test("two-phase commit publishes a manifest that accounts for every row, " +
      "and leaves no temp files behind") {
    val out = freshDir("2pc")
    val df = spark.range(0, 1000, 1, 5)
      .select($"id", ($"id" % 7).cast("long").as("g"))
    df.write.format("graft-sink").option("path", out).mode("append").save()
    val manifest = Files.readAllLines(Paths.get(out, "_MANIFEST")).asScala
      .filter(_.nonEmpty).map(_.split(",")).map(a => (a(0), a(1).toLong))
    assert(manifest.map(_._2).sum === 1000L, s"manifest rows: $manifest")
    // every manifest file exists; nothing temp-ish survives the commit
    manifest.foreach { case (name, _) =>
      assert(new File(out, name).isFile, s"missing committed file $name")
    }
    assert(!new File(out, "_tmp").exists() ||
      new File(out, "_tmp").list().isEmpty, "temp files must not survive commit")
    assert(spark.read.schema(df.schema).json(s"$out/part-*.jsonl").count() === 1000)
  }

  test("unsupported field types fail loudly, not silently") {
    val out = freshDir("loud")
    val df = Seq((1L, Seq(1, 2, 3))).toDF("id", "arr")
    val e = intercept[Exception] {
      df.write.format("graft-sink").option("path", out).mode("append").save()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("atomic types only")),
      s"expected the loud type error, got: ${messages(e)}")
  }
}

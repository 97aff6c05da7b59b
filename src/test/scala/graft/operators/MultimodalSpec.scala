package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def media = Multimodal.syntheticMediaTable(
    Seq((0L, "hello world"), (1L, "spark histogram"), (2L, ""), (3L, "audio bytes here"))
      .toDF("doc_id", "text"))

  test("schema convention: binary content + typed metadata struct") {
    val schema = media.schema
    assert(schema("content").dataType.typeName == "binary")
    val meta = schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSet == Set("kind", "width", "height", "sample_rate", "duration_ms"))
  }

  test("decodeFeatures appends a fixed-dim float feature column, deterministically") {
    val out = Multimodal.decodeFeatures(media, "content")
    assert(out.schema("features").dataType.simpleString == "array<float>")
    val rows = out.select("media_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(rows.values.forall(_.length == Multimodal.FeatureDim))
    // determinism: re-running yields identical features
    val rows2 = Multimodal.decodeFeatures(media, "content")
      .select("media_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(rows == rows2)
    // empty content → zero vector, not a crash
    assert(rows(2L).forall(_ == 0.0f))
    // different content → different features
    assert(rows(0L) != rows(1L))
  }

  test("batched execution: batch boundaries do not change results") {
    val big = Multimodal.syntheticMediaTable(
      (0 until 300).map(i => (i.toLong, s"content number $i")).toDF("doc_id", "text"))
    val one = Multimodal.decodeFeatures(big.repartition(1), "content")
      .select("media_id", "features").collect().map(_.toString).sorted
    val many = Multimodal.decodeFeatures(big.repartition(7), "content")
      .select("media_id", "features").collect().map(_.toString).sorted
    assert(one.sameElements(many))
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  // kinds by doc_id mod 3: 0,3→image 1→audio 2,5→video (2 has empty content)
  private def media = Multimodal.syntheticMediaTable(
    Seq((0L, "hello world"), (1L, "spark histogram"), (2L, ""),
      (3L, "audio bytes here"), (5L, "a long enough synthetic video payload"))
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

  test("resizeImages rewrites image rows and metadata, passes others through") {
    val out = Multimodal.resizeImages(media, 224, 224)
    assert(out.count() == media.count(), "row count unchanged")
    val byId = out.collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    val origKinds = media.select(col("media_id"), col("meta.kind")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    byId.foreach { case (id, r) =>
      val m = r.getStruct(r.fieldIndex("meta"))
      assert(m.getString(0) == origKinds(id), "kind preserved")
      if (origKinds(id) == "image") {
        assert(m.getInt(1) == 224 && m.getInt(2) == 224, "metadata rewritten")
        assert(r.getAs[Array[Byte]]("content").length == 224 * 224 / 1024)
      }
    }
  }

  test("sampleFrames explodes videos into n frames, skips other kinds") {
    val frames = Multimodal.sampleFrames(media, 4)
    val got = frames.collect().map(r => (r.getLong(0), r.getInt(1)))
    // id 2 is a video with EMPTY content (no frames); id 5 is the real one
    assert(got.map(_._1).toSet == Set(5L), s"only non-empty videos produce frames: ${got.toSeq}")
    assert(got.map(_._2).sorted.sameElements(0 until 4), "4 evenly-indexed frames")
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

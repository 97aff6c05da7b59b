package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with a typed metadata struct, processed by batched partition
  * maps (the Scala analogue of `mapInPandas`-style vectorized UDFs).
  *
  * The actual media decode is STUBBED — this container has no image/audio
  * codecs — behind [[DecodeStub]], a deterministic fake that derives
  * features from the bytes. Everything Spark-side is real and tested:
  * the schema convention, the batched mapPartitions execution (fixed
  * batch shape, one decoder init per partition — the same pattern that
  * amortizes model/codec setup at scale), partition sizing, and the
  * output feature schema.
  */
object Multimodal {

  val MediaMetaType: StructType = StructType(Seq(
    StructField("kind", StringType),        // "image" | "audio" | "video"
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", IntegerType)))

  val BatchSize = 64
  val FeatureDim = 8

  /** STUB decode: real implementation would decode pixels/samples here
    * (??? in production without codecs); the fake derives a deterministic
    * FeatureDim-float vector from the content bytes so the pipeline is
    * fully testable. One instance per partition = one codec init per task. */
  final class DecodeStub extends Serializable {
    def decodeBatch(contents: Array[Array[Byte]]): Array[Array[Float]] =
      contents.map { bytes =>
        val out = new Array[Float](FeatureDim)
        if (bytes != null) {
          var h = 0xcbf29ce484222325L
          var i = 0
          while (i < bytes.length) {
            h ^= (bytes(i) & 0xffL)
            h *= 0x100000001b3L
            out(i % FeatureDim) += ((h >>> 40).toInt & 0xffff) / 65536.0f
            i += 1
          }
        }
        out
      }
  }

  /** Attaches a `features array<float>` column by decoding the binary
    * column in fixed-size batches per partition. Schema change via
    * mapPartitions + explicit RowEncoder (the S7 pattern). */
  def decodeFeatures(df: DataFrame, contentCol: String): DataFrame = {
    val outSchema = df.schema.add(StructField("features", ArrayType(FloatType), nullable = false))
    val contentIdx = df.schema.fieldIndex(contentCol)
    implicit val enc = Encoders.row(outSchema)
    df.mapPartitions { rows =>
      val decoder = new DecodeStub // one init per partition/task
      rows.grouped(BatchSize).flatMap { batch =>
        val contents = batch.map(_.getAs[Array[Byte]](contentIdx)).toArray
        val feats = decoder.decodeBatch(contents)
        batch.iterator.zipWithIndex.map { case (r, i) =>
          Row.fromSeq(r.toSeq :+ (feats(i).toIndexedSeq: Seq[Float]))
        }
      }
    }
  }

  /** STUB resize: a real implementation decodes pixels and rescales
    * (??? without codecs); the fake derives a (targetW × targetH)-shaped
    * byte payload deterministically. The Spark-side contract is real:
    * only `kind == "image"` rows are touched, metadata is rewritten to
    * the target dimensions, everything else passes through. */
  final class ResizeStub(targetW: Int, targetH: Int) extends Serializable {
    def resizeBatch(contents: Array[Array[Byte]]): Array[Array[Byte]] =
      contents.map { bytes =>
        val out = new Array[Byte](math.max(1, targetW * targetH / 1024))
        if (bytes != null && bytes.length > 0) {
          var i = 0
          while (i < out.length) {
            out(i) = bytes(((i.toLong * bytes.length) / out.length).toInt)
            i += 1
          }
        }
        out
      }
  }

  /** Resizes image rows to (targetW, targetH); audio/video pass through
    * untouched. Batched partition map, one codec init per task. */
  def resizeImages(df: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val schema = df.schema
    val contentIdx = schema.fieldIndex("content")
    val metaIdx = schema.fieldIndex("meta")
    implicit val enc = Encoders.row(schema)
    df.mapPartitions { rows =>
      val stub = new ResizeStub(targetW, targetH)
      rows.grouped(BatchSize).flatMap { batch =>
        val (images, rest) = batch.partition { r =>
          val m = r.getStruct(metaIdx)
          m != null && m.getString(0) == "image"
        }
        val resized = stub.resizeBatch(images.map(_.getAs[Array[Byte]](contentIdx)).toArray)
        images.iterator.zipWithIndex.map { case (r, i) =>
          val vals = r.toSeq.toArray
          vals(contentIdx) = resized(i)
          val m = r.getStruct(metaIdx)
          vals(metaIdx) = Row("image", targetW, targetH, m.get(3), m.get(4))
          Row.fromSeq(vals.toIndexedSeq)
        } ++ rest.iterator
      }
    }
  }

  /** Samples `n` evenly-spaced "frames" from each video row (a real
    * decoder would seek keyframes — stubbed as byte-range slices with
    * the same output contract: one row per sampled frame, frame index +
    * frame bytes). Non-video rows produce no frames. */
  def sampleFrames(df: DataFrame, n: Int): DataFrame = {
    val schema = df.schema
    val outSchema = StructType(Seq(
      StructField("media_id", schema("media_id").dataType),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType)))
    val idIdx = schema.fieldIndex("media_id")
    val contentIdx = schema.fieldIndex("content")
    val metaIdx = schema.fieldIndex("meta")
    implicit val enc = Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val m = r.getStruct(metaIdx)
        if (m == null || m.getString(0) != "video") Iterator.empty
        else {
          val bytes = r.getAs[Array[Byte]](contentIdx)
          if (bytes == null || bytes.isEmpty) Iterator.empty
          else (0 until n).iterator.map { f =>
            val start = ((f.toLong * bytes.length) / n).toInt
            val end = (((f + 1).toLong * bytes.length) / n).toInt
            Row(r.get(idIdx), f, java.util.Arrays.copyOfRange(bytes, start, math.max(end, start + 1)))
          }
        }
      }
    }
  }

  /** Builds a multimodal table from the documents table: text bytes stand
    * in for media blobs; metadata is derived deterministically. */
  def syntheticMediaTable(docs: DataFrame): DataFrame = {
    val kind = element_at(array(lit("image"), lit("audio"), lit("video")),
      (pmod(col("doc_id"), lit(3)) + 1).cast("int"))
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("content"),
      struct(
        kind.as("kind"),
        when(kind === "image", lit(640)).otherwise(lit(null).cast("int")).as("width"),
        when(kind === "image", lit(480)).otherwise(lit(null).cast("int")).as("height"),
        when(kind === "audio", lit(16000)).otherwise(lit(null).cast("int")).as("sample_rate"),
        when(kind =!= "image", (length(col("text")) * 10).cast("int"))
          .otherwise(lit(null).cast("int")).as("duration_ms")).as("meta"))
  }
}

package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DSv2 WRITE connector (`format("graft-sink")`) — the write half
  * of the connector surface next to the read-side `graft-synth`
  * ([[SynthSource]]). JSON-lines output with the full two-phase commit
  * protocol a distributed sink needs for exactly-once batch writes:
  *
  *   - every task writes to a PRIVATE temp file keyed by (partition,
  *     task attempt) — concurrent speculative attempts can never collide;
  *   - the task's `commit()` hands the temp path to the DRIVER as its
  *     commit message; `abort()` deletes it;
  *   - only the driver's `BatchWrite.commit` renames committed temp
  *     files to their final names (rename is the atomic publish) and
  *     writes a `_MANIFEST` of (file, rows) — a reader that respects the
  *     manifest never sees uncommitted data; `BatchWrite.abort` removes
  *     every temp file, so a failed job leaves nothing visible.
  *
  * Local-filesystem paths (this environment); on a cluster the same
  * protocol runs over the Hadoop FileSystem API. Append-only by design —
  * overwrite is the caller clearing the directory, mirroring how
  * warehouse compaction jobs stage new segments. Supported field types:
  * the atomic ones a text interchange format round-trips losslessly
  * (integral, double via shortest-repr `Double.toString`, string,
  * boolean, date as days, timestamp as micros). */
class GraftSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-sink"
  // write-only source: the schema comes from the DataFrame being written
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new UnsupportedOperationException(
      "graft-sink is write-only; reads go through spark.read.json on its output")
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty, "graft-sink requires a path option")
    new GraftSinkTable(schema, path)
  }
}

final class GraftSinkTable(writeSchema: StructType, path: String)
    extends Table with SupportsWrite {
  override def name(): String = s"graft_sink($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new GraftSinkBatchWrite(info.schema(), path)
      }
    }
}

final case class GraftSinkCommit(tmpPath: String, finalName: String,
    rows: Long) extends WriterCommitMessage

final class GraftSinkBatchWrite(schema: StructType, path: String)
    extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new GraftSinkWriterFactory(schema.toDDL, path)

  /** Driver-side publish: rename every committed temp file, then write
    * the manifest. Runs once, after every task committed. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val msgs = messages.collect { case m: GraftSinkCommit => m }
    msgs.foreach { m =>
      Files.move(Paths.get(m.tmpPath), Paths.get(path, m.finalName),
        StandardCopyOption.ATOMIC_MOVE)
    }
    val manifest = msgs.sortBy(_.finalName)
      .map(m => s"${m.finalName},${m.rows}").mkString("", "\n", "\n")
    Files.write(Paths.get(path, "_MANIFEST"),
      manifest.getBytes(StandardCharsets.UTF_8))
    val tmp = new File(path, "_tmp")
    if (tmp.isDirectory && tmp.list().isEmpty) tmp.delete()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: GraftSinkCommit => m }
      .foreach(m => Files.deleteIfExists(Paths.get(m.tmpPath)))
}

final class GraftSinkWriterFactory(schemaDdl: String, path: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] = {
    val schema = StructType.fromDDL(schemaDdl)
    new File(path, "_tmp").mkdirs()
    val tmp = new File(new File(path, "_tmp"),
      f"part-$partitionId%05d-$taskId.jsonl")
    val finalName = f"part-$partitionId%05d.jsonl"
    new GraftSinkWriter(schema, tmp, finalName)
  }
}

/** One task's writer: streams JSON lines to its private temp file. */
final class GraftSinkWriter(schema: StructType, tmp: File, finalName: String)
    extends DataWriter[InternalRow] {
  private val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
    new java.io.FileOutputStream(tmp), StandardCharsets.UTF_8))
  private var rows = 0L

  private def esc(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  override def write(row: InternalRow): Unit = {
    val sb = new StringBuilder(64)
    sb.append('{')
    var i = 0
    schema.fields.foreach { f =>
      if (i > 0) sb.append(',')
      sb.append('"').append(esc(f.name)).append("\":")
      if (row.isNullAt(i)) sb.append("null")
      else f.dataType match {
        case LongType => sb.append(row.getLong(i))
        case IntegerType | DateType => sb.append(row.getInt(i))
        case ShortType => sb.append(row.getShort(i))
        case ByteType => sb.append(row.getByte(i))
        case DoubleType => sb.append(java.lang.Double.toString(row.getDouble(i)))
        case FloatType => sb.append(java.lang.Float.toString(row.getFloat(i)))
        case BooleanType => sb.append(row.getBoolean(i))
        case TimestampType | TimestampNTZType => sb.append(row.getLong(i))
        case StringType => sb.append('"').append(esc(row.getUTF8String(i).toString)).append('"')
        case dt => throw new UnsupportedOperationException(
          s"graft-sink supports atomic types only; got $dt for field ${f.name}")
      }
      i += 1
    }
    sb.append('}')
    out.write(sb.toString)
    out.newLine()
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    GraftSinkCommit(tmp.getAbsolutePath, finalName, rows)
  }

  override def abort(): Unit = {
    out.close()
    tmp.delete()
  }

  override def close(): Unit = ()
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** One shared scratch root for every query that writes — sink
  * round-trips, streaming checkpoints, staged materialized views, model
  * persistence. Two problems this solves:
  *
  *  1. **Measurement noise**: scattering per-query temp directories
  *     across `/tmp` made suite wall-time hostage to disk contention
  *     (the r8 driver run was ~35% slower than the same-commit builder
  *     run, entirely on tempdir-I/O queries). A single root on tmpfs
  *     (`/dev/shm`, RAM-backed) when available takes the disk out of
  *     the timed path; `GRAFT_STAGING_DIR` / `-Dgraft.staging.dir`
  *     override it for constrained machines.
  *  2. **Publish atomicity**: staged views were written in place under
  *     a `_SUCCESS` double-check, which a second JVM on the same
  *     fixture could observe mid-`overwrite` (delete-then-write).
  *     [[publishParquet]] builds into a process-unique temp directory
  *     and renames into place — readers only ever see absent or
  *     complete.
  *
  * On a real cluster the staging root maps to the job-scratch prefix on
  * the shared filesystem (HDFS/S3 `__staging/`); the
  * write-temp-then-rename publish is the same recipe Spark's own
  * FileOutputCommitter v1 uses for task commits.
  */
object Staging {

  /** Resolved once per JVM. Precedence: env `GRAFT_STAGING_DIR`, system
    * property `graft.staging.dir`, `/dev/shm/graft-<user>` when writable
    * AND roomy (tmpfs — RAM speed, cleared on reboot; tmpfs defaults to
    * half RAM, so large fixtures fall back to disk rather than ENOSPC
    * mid-write), else `/tmp/graft-<user>`. The per-user suffix keeps the
    * path unpredictable-enough in the world-writable parents while still
    * shared across this user's JVMs (the cross-JVM publish contract).
    * The chosen root is validated EAGERLY (created + writability probe)
    * so a bad override fails here with a clear message instead of
    * surfacing later as an opaque parquet-commit error. */
  lazy val root: String = {
    val user = sys.props.getOrElse("user.name", "anon")
    val chosen = sys.env.get("GRAFT_STAGING_DIR")
      .orElse(sys.props.get("graft.staging.dir"))
      .getOrElse {
        val shm = new java.io.File("/dev/shm")
        val minFree = 8L * 1024 * 1024 * 1024
        if (shm.isDirectory && shm.canWrite && shm.getUsableSpace >= minFree)
          s"/dev/shm/graft-$user"
        else s"/tmp/graft-$user"
      }
    val f = new java.io.File(chosen)
    f.mkdirs()
    require(f.isDirectory && f.canWrite,
      s"staging root is not a writable directory: $chosen " +
        "(set GRAFT_STAGING_DIR / -Dgraft.staging.dir to a writable path)")
    chosen
  }

  /** A subdirectory under the staging root, created eagerly so the
    * first timed query never pays directory creation. */
  def dir(sub: String): String = {
    val d = new java.io.File(root, sub)
    d.mkdirs()
    d.getAbsolutePath
  }

  /** A process-unique scratch directory under the staging root — for
    * artifacts that are written and read back WITHIN one query run
    * (model save/load round-trips). Unlike [[publishParquet]] paths,
    * these are never shared across JVMs, so two processes on the same
    * fixture can never interleave a save with a load. Caller deletes
    * via [[deleteRecursively]] when done. */
  def scratchDir(prefix: String): java.io.File = {
    val d = new java.io.File(dir("scratch"),
      s"$prefix-${java.util.UUID.randomUUID}")
    d.mkdirs()
    d
  }

  def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete()
  }

  /** Name of the schema sidecar written inside every published
    * directory. Leading underscore → invisible to Spark's data-file
    * listing (same convention as `_SUCCESS`/`_metadata`). It makes an
    * EMPTY publish readable: zero input rows write a parquet directory
    * with no data files, and a plain `read.parquet` on that throws
    * `UNABLE_TO_INFER_SCHEMA` — exactly the shape a partition-pruned or
    * filtered-to-nothing corpus hands the staging layer at scale. */
  private val SchemaSidecar = "_graft_schema.json"

  private def writeSidecar(dir: java.io.File, schema: StructType): Unit =
    java.nio.file.Files.write(new java.io.File(dir, SchemaSidecar).toPath,
      schema.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def readSidecar(dir: java.io.File): Option[StructType] = {
    val f = new java.io.File(dir, SchemaSidecar)
    if (!f.isFile) None
    else Some(DataType.fromJson(new String(
      java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8)).asInstanceOf[StructType])
  }

  /** Write-once parquet staging with ATOMIC publish. First caller per
    * `path` builds the DataFrame into `<path>.tmp-<uuid>` and renames
    * the directory into place; every caller (including losers of a
    * cross-JVM race) reads the published directory. `_SUCCESS` inside a
    * published directory is written by Spark's committer before the
    * rename, so `path/_SUCCESS` existing implies the rename — and
    * therefore the whole dataset — is complete. A directory present
    * WITHOUT `_SUCCESS` is a crashed in-place write from an older
    * layout; it is renamed ASIDE (not deleted in place — deleting would
    * race a concurrent JVM that published between our check and the
    * delete) and discarded only after our own rename lands. The build's
    * schema is persisted as a sidecar so the read-back is schema-exact
    * even when the build produced zero rows (no data files). */
  def publishParquet(s: SparkSession, path: String,
      partitionBy: Seq[String] = Nil)(build: => DataFrame): DataFrame = {
    val target = new java.io.File(path)
    val done = new java.io.File(target, "_SUCCESS")
    if (!done.isFile) synchronized {
      if (!done.isFile) {
        val df = build
        val parent = target.getParentFile
        parent.mkdirs()
        val tmp = new java.io.File(parent,
          s".${target.getName}.tmp-${java.util.UUID.randomUUID}")
        df.write.mode("overwrite").partitionBy(partitionBy: _*)
          .parquet(tmp.getAbsolutePath)
        writeSidecar(tmp, df.schema)
        if (!tmp.renameTo(target)) {
          // rename blocked: either another JVM published first, or a
          // stale incomplete directory occupies the path. Re-check
          // _SUCCESS IMMEDIATELY before acting so a concurrent publish
          // that landed since the outer check is never clobbered.
          if (done.isFile) {
            deleteRecursively(tmp)
          } else {
            val aside = new java.io.File(parent,
              s".${target.getName}.stale-${java.util.UUID.randomUUID}")
            target.renameTo(aside) // stale junk out of the way, not deleted
            if (tmp.renameTo(target)) {
              deleteRecursively(aside)
            } else {
              deleteRecursively(tmp)
              deleteRecursively(aside)
              require(done.isFile,
                s"staging publish lost a race it could not recover at $path")
            }
          }
        }
      }
    }
    readSidecar(target) match {
      case Some(schema) => s.read.schema(schema).parquet(path)
      // pre-sidecar published directory (older layout): infer as before
      case None => s.read.parquet(path)
    }
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    * property `graft.staging.dir`, `/dev/shm/graft` when writable (tmpfs
    * — RAM speed, cleared on reboot), else `/tmp/graft`. */
  lazy val root: String = {
    val chosen = sys.env.get("GRAFT_STAGING_DIR")
      .orElse(sys.props.get("graft.staging.dir"))
      .getOrElse {
        val shm = new java.io.File("/dev/shm")
        if (shm.isDirectory && shm.canWrite) "/dev/shm/graft" else "/tmp/graft"
      }
    new java.io.File(chosen).mkdirs()
    chosen
  }

  /** A subdirectory under the staging root, created eagerly so the
    * first timed query never pays directory creation. */
  def dir(sub: String): String = {
    val d = new java.io.File(root, sub)
    d.mkdirs()
    d.getAbsolutePath
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete()
  }

  /** Write-once parquet staging with ATOMIC publish. First caller per
    * `path` builds the DataFrame into `<path>.tmp-<uuid>` and renames
    * the directory into place; every caller (including losers of a
    * cross-JVM race) reads the published directory. `_SUCCESS` inside a
    * published directory is written by Spark's committer before the
    * rename, so `path/_SUCCESS` existing implies the rename — and
    * therefore the whole dataset — is complete. A directory present
    * WITHOUT `_SUCCESS` is a crashed in-place write from an older
    * layout; it is discarded. */
  def publishParquet(s: SparkSession, path: String,
      partitionBy: Seq[String] = Nil)(build: => DataFrame): DataFrame = {
    val target = new java.io.File(path)
    val done = new java.io.File(target, "_SUCCESS")
    if (!done.isFile) synchronized {
      if (!done.isFile) {
        val parent = target.getParentFile
        parent.mkdirs()
        val tmp = new java.io.File(parent,
          s".${target.getName}.tmp-${java.util.UUID.randomUUID}")
        build.write.mode("overwrite").partitionBy(partitionBy: _*)
          .parquet(tmp.getAbsolutePath)
        if (!tmp.renameTo(target)) {
          if (done.isFile) {
            // another JVM published while we were building — theirs wins
            deleteRecursively(tmp)
          } else {
            // stale incomplete directory blocks the rename: replace it
            deleteRecursively(target)
            if (!tmp.renameTo(target)) {
              deleteRecursively(tmp)
              require(done.isFile,
                s"staging publish lost a race it could not recover at $path")
            }
          }
        }
      }
    }
    s.read.parquet(path)
  }
}

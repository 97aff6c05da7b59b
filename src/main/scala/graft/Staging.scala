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
    * mid-write), else `/tmp/graft-<user>`. The chosen root is validated
    * EAGERLY (created + writability probe) so a bad override fails here
    * with a clear message instead of surfacing later as an opaque
    * parquet-commit error.
    *
    * The default fixed paths sit inside world-writable sticky parents
    * (/dev/shm, /tmp) and are fully PREDICTABLE, so another local user
    * can pre-create them mode 0777 — and staged parquet is later read
    * back as trusted query results. Defense: after mkdirs, the
    * directory must be OWNED by the current user (a pre-created foreign
    * dir fails this — mkdirs on an existing dir doesn't change its
    * owner) and is closed to group/world (0700). On an ownership
    * mismatch the JVM falls back to a private `createTempDirectory`
    * 0700 root: cross-JVM sharing is lost but no foreign-writable path
    * is ever trusted. Explicit overrides are used as given — the
    * operator who sets a path owns its permissions. */
  lazy val root: String = {
    val user = sys.props.getOrElse("user.name", "anon")
    val override_ = sys.env.get("GRAFT_STAGING_DIR")
      .orElse(sys.props.get("graft.staging.dir"))
    val chosen = override_.getOrElse {
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
    if (override_.isDefined) chosen
    else {
      import java.nio.file.{Files, Paths}
      import java.nio.file.attribute.PosixFilePermissions
      val p = Paths.get(chosen)
      val owned =
        try Files.getOwner(p).getName == user
        catch { case _: UnsupportedOperationException => true } // non-POSIX fs
      if (owned) {
        try Files.setPosixFilePermissions(p,
          PosixFilePermissions.fromString("rwx------"))
        catch { case _: UnsupportedOperationException => () }
        chosen
      } else {
        val priv = Files.createTempDirectory("graft-",
          PosixFilePermissions.asFileAttribute(
            PosixFilePermissions.fromString("rwx------")))
        // LOUD fallback: in containers Files.getOwner can report a
        // numeric uid that differs from user.name, in which case every
        // JVM silently gets a private root and the cross-JVM
        // fixture-sharing contract is lost — make that visible.
        val owner = try Files.getOwner(p).getName catch { case _: Throwable => "?" }
        System.err.println(
          s"[graft.Staging] WARNING: $chosen is owned by '$owner', not '$user' — " +
            s"falling back to private staging root $priv; cross-JVM fixture sharing is OFF for this process")
        // deleteOnExit cannot remove a non-empty directory; use a
        // recursive-delete shutdown hook instead.
        Runtime.getRuntime.addShutdownHook(new Thread(() =>
          try deleteRecursively(priv.toFile) catch { case _: Throwable => () }))
        priv.toString
      }
    }
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

  /** A per-JVM scratch NAMESPACE under the staging root — for scratch
    * that a query wipes and rebuilds on every run (sink round-trip
    * outputs, streaming state/checkpoints). These used to live at fixed
    * shared paths, which made two JVMs benching the same query race
    * delete-against-read: the round-10 100× full-suite run crashed in
    * exactly that window (`q_sink_custom_write`'s clear-first step in
    * one JVM emptied the `part-*.jsonl` glob another JVM was
    * resolving). Keying by JVM pid + start-time makes concurrent
    * processes disjoint while staying STABLE within a JVM (best-of-2
    * bench reruns reuse one path instead of accumulating a dir per
    * call); a shutdown hook removes the whole namespace so repeated
    * runs don't strand scratch on tmpfs. Shared STAGED FIXTURES
    * (read-only once built) stay under [[dir]] + [[publishParquet]],
    * whose file lock makes cross-JVM sharing safe — the split is
    * mutate-per-run ⇒ per-JVM, build-once-read-many ⇒ shared. */
  lazy val jvmRoot: String = {
    val rt = java.lang.management.ManagementFactory.getRuntimeMXBean
    val d = new java.io.File(dir("jvm"),
      s"p${ProcessHandle.current().pid()}-t${rt.getStartTime}")
    d.mkdirs()
    Runtime.getRuntime.addShutdownHook(
      new Thread(() => deleteRecursively(d), "graft-scratch-cleanup"))
    d.getAbsolutePath
  }

  def jvmDir(sub: String): String = {
    val d = new java.io.File(jvmRoot, sub)
    d.mkdirs()
    d.getAbsolutePath
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
    * therefore the whole dataset — is complete.
    *
    * Cross-JVM races are excluded by an OS FILE LOCK on
    * `<parent>/.<name>.lock`, held for the whole check-build-rename
    * sequence (in-JVM threads are serialized by the `synchronized`
    * outside it — `FileLock` is not reentrant within a JVM). The
    * earlier lock-free recovery re-checked `_SUCCESS` and renamed a
    * stale directory aside, but had an unfixable TOCTOU window: a
    * concurrent publish landing between the re-check and the rename
    * would be swapped aside and deleted under that JVM's readers. Under
    * the lock no concurrent publish can land at all, so a directory
    * found at the path WITHOUT `_SUCCESS` is always a crashed in-place
    * write from a pre-lock layout — never live data — and can safely be
    * renamed aside and discarded after our rename lands. The build's
    * schema is persisted as a sidecar so the read-back is schema-exact
    * even when the build produced zero rows (no data files).
    *
    * The `.lock` file itself is deliberately LEFT on disk: unlinking a
    * lock file is the classic fcntl race (process A deletes while B has
    * the fd open and C then creates a fresh inode — B and C now "hold"
    * different locks on the same name). One empty dotfile per published
    * dataset, removed with the staging root at shutdown/cleanup, is the
    * safe steady state. */
  /** Build-provenance feed for bench records (VERDICT r14 #3): every
    * [[publishParquet]] call that actually BUILDS (wins the lock race
    * and writes) enqueues (root-relative path, build+publish seconds).
    * Bench drains this per timed query and emits `staged_views_built`
    * in the detail JSON line — the r14 driver record charged pagerank
    * 4× the builder's same-HEAD number purely because a cold staging
    * root put a one-time C(basket,2) pair build inside the first
    * consumer's timed window, and nothing in the record said so. */
  private val buildEvents =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]()

  private def recordBuild(path: String, sec: Double): Unit = {
    val rel =
      if (path.startsWith(root)) path.stripPrefix(root).stripPrefix("/") else path
    buildEvents.add((rel, sec))
  }

  /** Remove and return all build events recorded since the last drain. */
  private[graft] def drainBuildEvents(): Seq[(String, Double)] = {
    val out = scala.collection.mutable.ListBuffer.empty[(String, Double)]
    var e = buildEvents.poll()
    while (e != null) { out += e; e = buildEvents.poll() }
    out.toList
  }

  /** Write-once TEXT staging with the same atomic-publish + lock +
    * build-accounting discipline as [[publishParquet]], for tiny
    * driver-side artifacts (one-line corpus profiles): the first caller
    * per `path` evaluates `build` (typically one Spark aggregate),
    * writes it to a temp file and renames into place; every later
    * caller — in this or any JVM — reads the file back with NO Spark
    * job. Build seconds feed `staged_views_built` like any staged
    * view. */
  def publishText(path: String)(build: => String): String = {
    val target = new java.io.File(path)
    if (!target.isFile) synchronized {
      if (!target.isFile) {
        val parent = target.getParentFile
        parent.mkdirs()
        val lockCh = java.nio.channels.FileChannel.open(
          new java.io.File(parent, s".${target.getName}.lock").toPath,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        val lock = lockCh.lock()
        try {
          if (!target.isFile) {
            val buildT0 = System.nanoTime()
            val content = build
            val tmp = new java.io.File(parent,
              s".${target.getName}.tmp-${java.util.UUID.randomUUID}")
            java.nio.file.Files.write(tmp.toPath,
              content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            recordBuild(path, (System.nanoTime() - buildT0) / 1e9)
            require(tmp.renameTo(target) || target.isFile,
              s"staging publishText cannot rename into $path")
          }
        } finally {
          lock.release()
          lockCh.close()
        }
      }
    }
    new String(java.nio.file.Files.readAllBytes(target.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
  }

  def publishParquet(s: SparkSession, path: String,
      partitionBy: Seq[String] = Nil)(build: => DataFrame): DataFrame = {
    val target = new java.io.File(path)
    val done = new java.io.File(target, "_SUCCESS")
    if (!done.isFile) synchronized {
      if (!done.isFile) {
        val parent = target.getParentFile
        parent.mkdirs()
        val lockCh = java.nio.channels.FileChannel.open(
          new java.io.File(parent, s".${target.getName}.lock").toPath,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        val lock = lockCh.lock()
        try {
          // the winner of the lock race may have published while we
          // queued: the locked re-check makes this JVM a plain reader
          if (!done.isFile) {
            val buildT0 = System.nanoTime()
            val df = build
            val tmp = new java.io.File(parent,
              s".${target.getName}.tmp-${java.util.UUID.randomUUID}")
            df.write.mode("overwrite").partitionBy(partitionBy: _*)
              .parquet(tmp.getAbsolutePath)
            writeSidecar(tmp, df.schema)
            recordBuild(path, (System.nanoTime() - buildT0) / 1e9)
            if (!tmp.renameTo(target)) {
              // occupied by a crashed pre-lock in-place write (no
              // _SUCCESS; a complete publish is impossible here — every
              // publisher holds the lock): move it aside, land ours.
              val aside = new java.io.File(parent,
                s".${target.getName}.stale-${java.util.UUID.randomUUID}")
              val movedAside = target.renameTo(aside)
              require(movedAside,
                s"staging publish cannot move stale occupant of $path aside (filesystem refused rename to $aside)")
              require(tmp.renameTo(target),
                s"staging publish cannot rename into $path (aside-clear succeeded but final rename was refused)")
              deleteRecursively(aside)
            }
          }
        } finally {
          lock.release()
          lockCh.close()
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

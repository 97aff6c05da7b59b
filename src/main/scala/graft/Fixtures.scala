package graft

/** Fixture-file fingerprint shared by every derived-state cache. */
object Fixtures {

  /** Stable per-(dir, file-generation) key: a CRC32 of the raw dir string
    * (raw, not sanitized — '/a/b' and '/a_b' must not collide) + the
    * source file's (length, sub-second mtime, edge-content CRC). Derived
    * state keyed by it — streaming checkpoints, the synthetic media
    * cache, schema probes — is invalidated when the fixture is
    * regenerated IN PLACE (a file-source checkpoint records processed
    * paths, so without the fingerprint the old checkpoint marks new data
    * already-read and serves the previous generation's rows). The content
    * CRC over the first+last 4 KiB closes the residual hazard of a
    * same-length rewrite within one coarse-mtime tick. A missing file
    * fingerprints as 0_0_0 — constant, so the caller's subsequent read
    * fails loudly on its own terms.
    *
    * A parquet DIRECTORY (Spark-written multi-file output, as every
    * test-constructed corpus is) fingerprints over its contained files:
    * sorted relative paths × (name, length, mtime, edge-content CRC)
    * folded into one CRC, plus the total length and max mtime in the
    * key string. Pre-r17 a directory fingerprinted as the constant
    * 0_0_0, so an in-place rewrite of a directory corpus silently kept
    * every derived cache (profile sidecars, media cache, checkpoints). */
  def key(dir: String, file: String): String = {
    val f = new java.io.File(dir, file)
    val dirCrc = {
      val c = new java.util.zip.CRC32()
      c.update(dir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.lang.Long.toHexString(c.getValue)
    }
    if (f.isDirectory) {
      val files = {
        def walk(d: java.io.File): Seq[java.io.File] =
          Option(d.listFiles()).toSeq.flatten.sortBy(_.getName).flatMap {
            case c if c.isDirectory => walk(c)
            case c => Seq(c)
          }
        walk(f)
      }
      val crc = new java.util.zip.CRC32()
      var totalLen = 0L
      var maxMtime = 0L
      files.foreach { c =>
        // fold the dir-RELATIVE path, not the leaf name: a renamed
        // value-bearing subdirectory (hive partition dirs) must change
        // the key even when the leaf files are byte-identical
        crc.update(f.toPath.relativize(c.toPath).toString
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val mtime = java.nio.file.Files
          .getLastModifiedTime(c.toPath).toInstant.toEpochMilli
        crc.update(java.nio.ByteBuffer.allocate(16)
          .putLong(c.length()).putLong(mtime).array())
        edgeCrc(c, crc)
        totalLen += c.length(); maxMtime = math.max(maxMtime, mtime)
      }
      return s"d${dirCrc}_${totalLen}_${maxMtime}_${java.lang.Long.toHexString(crc.getValue)}"
    }
    if (!f.isFile) return s"d${dirCrc}_0_0_0"
    // Files.getLastModifiedTime keeps sub-second precision where the
    // filesystem has it; File.lastModified truncates to millis on some
    // JDK/FS combinations.
    val mtime = java.nio.file.Files
      .getLastModifiedTime(f.toPath).toInstant.toEpochMilli
    val crc = new java.util.zip.CRC32()
    edgeCrc(f, crc)
    s"d${dirCrc}_${f.length()}_${mtime}_${java.lang.Long.toHexString(crc.getValue)}"
  }

  /** Fold the first+last 4 KiB of `f` into `crc`. */
  private def edgeCrc(f: java.io.File, crc: java.util.zip.CRC32): Unit = {
    val raf = new java.io.RandomAccessFile(f, "r")
    try {
      val len = raf.length()
      val head = new Array[Byte](math.min(4096L, len).toInt)
      raf.readFully(head); crc.update(head)
      if (len > 4096) {
        val tail = new Array[Byte](math.min(4096L, len - 4096).toInt)
        raf.seek(len - tail.length); raf.readFully(tail); crc.update(tail)
      }
    } finally raf.close()
  }
}

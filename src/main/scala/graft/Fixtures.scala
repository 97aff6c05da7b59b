package graft

/** Fixture-file fingerprint shared by every derived-state cache. */
object Fixtures {

  /** Stable per-(dir, file-generation) key: sanitized dir + the source
    * file's (length, mtime). Derived state keyed by it — streaming
    * checkpoints, the synthetic media cache, schema probes — is
    * invalidated when the fixture is regenerated IN PLACE (a file-source
    * checkpoint records processed paths, so without the fingerprint the
    * old checkpoint marks new data already-read and serves the previous
    * generation's rows). A missing file fingerprints as 0_0 — constant,
    * so the caller's subsequent read fails loudly on its own terms. */
  def key(dir: String, file: String): String = {
    val f = new java.io.File(dir, file)
    dir.replaceAll("[^A-Za-z0-9._-]", "_") + s"_${f.length()}_${f.lastModified()}"
  }
}

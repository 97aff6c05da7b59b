package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables (TESTDATA.md).
  *
  * All queries take the scale-factor directory as a parameter so the same
  * code runs at sf0.001 (smoke), sf0.01 (correctness) and sf0.1+ (bench).
  * Reads are plain parquet scans: Catalyst pushes filters and prunes
  * columns into the scan, which is exactly what we want at 100 TB.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  /** events.ts has shipped as parquet TIMESTAMP(NANOS) (older fixture
    * generations) and as plain TIMESTAMP (µs). Setting nanosAsLong HERE
    * keeps the nanos vintage readable (ts → epoch-nanos long) without
    * order-dependence on which query runs first; it is a no-op for the
    * µs vintage, which reads as TimestampType. Consumers that do time
    * arithmetic dispatch on `schema("ts").dataType`; the streaming path
    * normalizes in [[graft.streaming.EventStreams.eventsBatch]]. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, sfDir, "events")
  }
  /** Loading the documents corpus measures (once, staged — later calls
    * are a memoized driver-side read, no job) its duplication ratio and
    * registers it in [[CorpusProfile]]'s path-keyed registry: the
    * collapse-first tier choice
    * ([[graft.operators.Dedup.collapseWorthwhile]]) resolves the ratio
    * from each plan's OWN scan provenance, so two corpora loaded in one
    * session each tier off their own measurement — load order cannot
    * flip a global switch. The session conf set here is only the
    * FALLBACK for inputs whose provenance doesn't name a measured
    * corpus. `spark.graft.collapse.mode` (always/never) overrides the
    * auto decision — Verify pins `always` so the collapsed scale path
    * stays oracle-gated on the distinct-text fixtures. */
  def documents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set(graft.operators.Dedup.DuplicationRatioConf,
      CorpusProfile.duplicationRatio(spark, sfDir).toString)
    load(spark, sfDir, "documents")
  }
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  /** Bucketed managed-table variant of a table, written once per
    * (session, sfDir) into the session warehouse — bucketed AND sorted by
    * the join key, so a join of two same-bucketed tables reads
    * pre-distributed data and runs with ZERO Exchange (Spark ≥3.1 still
    * re-sorts the pre-sorted runs cheaply; the scan-order shortcut sits
    * behind a legacy flag). The 100 TB recipe: keep fact tables bucketed
    * on their recurring join keys; every downstream join skips the
    * shuffle that would otherwise dominate the job. */
  def bucketed(spark: SparkSession, sfDir: String, table: String,
      keyCol: String, buckets: Int = 8): DataFrame = {
    val tag = sfDir.replaceAll("[^a-zA-Z0-9]", "_")
    val name = s"graft_${table}_b$buckets$tag"
    if (!spark.catalog.tableExists(name)) {
      // the in-memory catalog is per-session but the warehouse directory
      // outlives the JVM — clear a stale location before recreating
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      val whPath = if (wh.startsWith("file:")) new java.net.URI(wh).getPath else wh
      deleteRecursively(new java.io.File(whPath, name))
      // repartition on the bucket key first: the repartition hash and the
      // bucket-id hash agree (both pmod(murmur3, n)), so each bucket gets
      // exactly ONE file — the condition under which the scan reports its
      // sort order and the downstream SortMergeJoin skips its Sort
      load(spark, sfDir, table)
        .repartition(buckets, org.apache.spark.sql.functions.col(keyCol))
        .write.mode("overwrite")
        .bucketBy(buckets, keyCol).sortBy(keyCol).saveAsTable(name)
    }
    spark.table(name)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}

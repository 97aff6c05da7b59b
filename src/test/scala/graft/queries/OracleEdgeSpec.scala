package graft.queries

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Spark-side edge semantics the generated DuckDB oracles
  * replay for empty, whitespace-only, and NULL text — the fixtures the
  * real corpus never exercises. The expected literals were derived from
  * an independent replay of the kernels and verified equal to the
  * generated oracle SQL's output on this exact fixture, so this spec
  * failing means query and oracle have diverged on an edge class.
  *
  * Fixture: 1/8 share a text, 2 is a near-dup of it, 3/7 are empty,
  * 4 is whitespace-only, 5 is NULL, 6 is unrelated.
  */
class OracleEdgeSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog and runs away fast"

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("edgefix").toString
    Seq(
      (1L, base, "en", "web", base.length.toLong),
      (2L, base + " today", "en", "web", (base.length + 6).toLong),
      (3L, "", "en", "web", 0L),
      (4L, "   ", "en", "web", 3L),
      (5L, null.asInstanceOf[String], "en", "web", 0L),
      (6L, "completely different text about spark engines and data pipelines", "en", "web", 65L),
      (7L, "", "en", "web", 0L),
      (8L, base, "en", "web", base.length.toLong)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def rows(q: String): Seq[Row] =
    graft.SparkEntry.queries(q)(spark, dir).collect().toSeq

  test("minhash candidates pair empty docs as duplicates, NULL never pairs") {
    val got = rows("q_dedup_minhash").map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got == Seq(
      (1L, 2L, 0.9219), (1L, 8L, 1.0), (2L, 8L, 0.9219),
      (3L, 4L, 1.0), (3L, 7L, 1.0), (4L, 7L, 1.0)), s"got $got")
  }

  test("verified pairs carry exact trigram jaccard incl. the empty-gram case") {
    val got = rows("q_dedup_minhash_verified").map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got == Seq(
      (1L, 2L, 0.9167), (1L, 8L, 1.0), (2L, 8L, 0.9167),
      (3L, 4L, 1.0), (3L, 7L, 1.0), (4L, 7L, 1.0)), s"got $got")
  }

  test("simhash table: tokenless docs hash to 0, NULL text stays NULL") {
    val got = rows("q_dedup_simhash")
    val byId = got.map(r => r.getLong(0) -> r).toMap
    assert(byId(3L).getLong(1) == 0L && byId(4L).getLong(1) == 0L)
    assert(byId(5L).isNullAt(1) && byId(5L).isNullAt(2))
    assert(byId(1L).getLong(1) == byId(8L).getLong(1))
  }

  test("simhash pairs include tokenless docs at hamming 0, never NULL docs") {
    val got = rows("q_dedup_simhash_pairs").map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got == Seq((1L, 8L, 0), (3L, 4L, 0), (3L, 7L, 0), (4L, 7L, 0)), s"got $got")
  }

  test("fnv fingerprint: empty text hashes to the FNV basis, NULL stays NULL") {
    val got = rows("q_text_fingerprint_fnv")
    val byId = got.map(r => r.getLong(0) -> r).toMap
    assert(byId(3L).getLong(1) == -3750763034362895579L) // FNV-1a 64 basis, signed
    assert(byId(5L).isNullAt(1))
    assert(byId(1L).getLong(1) == byId(8L).getLong(1))
  }

  test("q_s15_conf invariants hold AND the live values match the SparkContext " +
      "(the driver compares only the session-independent booleans)") {
    val out = graft.SparkEntry.queries("q_s15_conf")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> (r.getBoolean(1), r.getBoolean(2))).toMap
    assert(out.keySet == Set("maxNumConcurrentTasks", "spark.task.cpus"))
    assert(out.values.forall { case (pos, sane) => pos && sane })
    // the values behind the booleans are the real session capacities
    val sc = spark.sparkContext
    val taskCpus = sc.getConf.getInt("spark.task.cpus", 1)
    val slots = math.max(sc.defaultParallelism / taskCpus, 1)
    assert(taskCpus > 0 && slots > 0 && slots <= 4096,
      s"live introspection out of the oracle's pinned range: cpus=$taskCpus slots=$slots")
  }
}

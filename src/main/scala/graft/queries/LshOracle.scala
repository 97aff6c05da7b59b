package graft.queries

import graft.operators.Similarity

/** Generated DuckDB replays of the hyperplane-LSH queries.
  *
  * The seeded Gaussian planes are compiled as double literals into BOTH
  * the Spark kernel ([[graft.functions.KernelExpressions.HyperplaneBucket]])
  * and this SQL — `Double.toString` round-trips exactly, so the two
  * engines run the identical sequential double dot product and the same
  * `> 0` sign rule per bit. Bucket ids therefore replay BIT-EXACTLY and
  * the whole LSH pipeline (bucketing → candidate join → scoring → cut)
  * is hash-checkable, not merely recall-pinned — same trick as
  * `q_embed_project`'s literal projection planes.
  *
  * Embeddings are 64-dim by the testdata contract (TESTDATA.md), like
  * every other embedding oracle in the suite.
  */
object LshOracle {
  import HashSqlParts.arr

  /** `b`-bit sign bucket of DOUBLE[] column `v` under seeded planes —
    * bit i set iff plane_i · v > 0, exactly the kernel's rule. */
  private def bucketExpr(planes: Array[Array[Double]]): String =
    planes.zipWithIndex.map { case (p, b) =>
      s"(CASE WHEN list_dot_product(v, ${arr(p)}) > 0 THEN ${1 << b} ELSE 0 END)"
    }.mkString("\n            + ")

  /** Replay of [[Similarity.lshTopK]]: per-table buckets, single-bit
    * multiprobe, candidate dedup, exact cosine rank, top-k cut. The
    * query side is the `vec_id < 10` slice, as in the registered query. */
  def topkSql(k: Int, bits: Int, tables: Int, seed: Long): String = {
    val planes = (0 until tables).map(t => Similarity.gaussianPlanes(64, bits, seed + t))
    val bCols = (0 until tables)
      .map(t => s"${bucketExpr(planes(t))} AS b$t").mkString(",\n          ")
    val corpus = (0 until tables)
      .map(t => s"SELECT vec_id AS vid, ${t * (1 << bits)} + b$t AS bucket FROM bk")
      .mkString("\n          UNION ALL ")
    val flips = 0 +: (0 until bits).map(1 << _)
    val probes = (0 until tables).flatMap(t => flips.map(f =>
        s"SELECT vec_id AS qid, ${t * (1 << bits)} + xor(b$t, $f) AS bucket FROM bk WHERE vec_id < 10"))
      .mkString("\n          UNION ALL ")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      bk AS (SELECT vec_id, $bCols FROM e),
      c AS ($corpus),
      p AS ($probes),
      cand AS (SELECT DISTINCT qid, vid FROM p JOIN c USING (bucket)
               WHERE qid <> vid),
      scored AS (SELECT cand.qid, cand.vid,
          round(list_cosine_similarity(qe.v, ce.v), 6) AS cos
        FROM cand JOIN e qe ON qe.vec_id = cand.qid
                  JOIN e ce ON ce.vec_id = cand.vid),
      ranked AS (SELECT qid, vid, cos,
          row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rank
        FROM scored)
      SELECT qid, rank, vid, cos FROM ranked WHERE rank <= $k
      ORDER BY qid, rank"""
  }

  /** Replay of [[Similarity.embeddingNearDupPairs]] at EXPLICIT
    * (bits, tables): bucket self-join with `a < b`, unit-vector dot
    * (replayed as divide-then-dot, the kernel's exact op order — the
    * threshold compares UNROUNDED doubles, so the replay must match the
    * kernel bit for bit, not just to 6 dp), threshold, pair dedup. */
  def pairsSql(minCos: Double, bits: Int, tables: Int, seed: Long): String = {
    val planes = (0 until tables).map(t => Similarity.gaussianPlanes(64, bits, seed + t))
    val bCols = (0 until tables)
      .map(t => s"${bucketExpr(planes(t))} AS b$t").mkString(",\n          ")
    val posting = (0 until tables)
      .map(t => s"SELECT vec_id, uv, ${t * (1 << bits)} + b$t AS bucket FROM bk")
      .mkString("\n          UNION ALL ")
    s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      e AS (SELECT vec_id, v FROM e0
            UNION ALL
            SELECT vec_id + 100000, list_concat([v[1] + 0.5], v[2:]) AS v
            FROM e0 WHERE vec_id < 40),
      bk AS (SELECT vec_id,
          list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS uv,
          $bCols FROM e),
      c AS ($posting),
      pr AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b,
          list_dot_product(x.uv, y.uv) AS cos
        FROM c x JOIN c y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
        WHERE list_dot_product(x.uv, y.uv) >= $minCos)
      SELECT a, b, round(cos, 4) AS cos FROM pr ORDER BY a, b"""
  }
}

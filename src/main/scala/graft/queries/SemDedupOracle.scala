package graft.queries

/** DuckDB replay of [[graft.operators.Similarity.semanticDedupPinned]]
  * over the planted-twin embeddings corpus (same planting arithmetic as
  * `q_dedup_embedding_lsh`: ids < 40 re-keyed +100000, first coordinate
  * +0.5 — cos ≈ 0.99 twins the semantic screen must find).
  *
  * Shares [[IvfOracle.pinnedCentroids]] — the same frozen coarse
  * quantizer serves ANN probes and semantic dedup, exactly how a
  * production index reuses one offline-trained quantizer. Because the
  * centroids are double literals on BOTH sides, cell assignment
  * (argmax raw dot, first-index tie-break), the unit-dot centrality,
  * the UNROUNDED in-cell threshold compare, and the keep rule all
  * replay bit-exactly — hash-checked, not recall-pinned.
  */
object SemDedupOracle {
  import HashSqlParts.arr

  def sql(minCos: Double): String = {
    val cents = IvfOracle.pinnedCentroids
    val ds = cents.map(c => s"list_dot_product(v, ${arr(c)})")
      .mkString("[\n          ", ",\n          ", "]")
    val uds = cents.map(c => s"list_dot_product(uv, ${arr(c)})")
      .mkString("[\n          ", ",\n          ", "]")
    s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      e AS (SELECT vec_id, v FROM e0
            UNION ALL
            SELECT vec_id + 100000, list_concat([v[1] + 0.5], v[2:]) AS v
            FROM e0 WHERE vec_id < 40),
      u AS (SELECT vec_id, v,
          list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS uv
        FROM e),
      d AS (SELECT vec_id, uv, $ds AS ds, $uds AS uds FROM u),
      cc AS (SELECT vec_id, uv,
          list_position(ds, list_max(ds)) - 1 AS cell,
          uds[list_position(ds, list_max(ds))] AS ccos FROM d),
      p AS (SELECT x.vec_id AS a, x.ccos AS accos, y.vec_id AS b, y.ccos AS bccos
        FROM cc x JOIN cc y ON x.cell = y.cell AND x.vec_id < y.vec_id
        WHERE list_dot_product(x.uv, y.uv) >= $minCos),
      nb AS (SELECT a AS vid, accos AS ccos, b AS nvid, bccos AS nccos FROM p
             UNION ALL
             SELECT b, bccos, a, accos FROM p),
      vd AS (SELECT vid, count(*) AS n_dups,
          bool_or(ccos > nccos OR (ccos = nccos AND vid > nvid)) AS removed
        FROM nb GROUP BY vid)
      SELECT cc.vec_id, cc.cell, round(cc.ccos, 6) AS centroid_cos,
        coalesce(vd.n_dups, 0) AS n_dups,
        NOT coalesce(vd.removed, false) AS keep
      FROM cc LEFT JOIN vd ON vd.vid = cc.vec_id
      ORDER BY cc.vec_id"""
  }

  /** Replay of [[graft.operators.Similarity.semanticDedupIncremental]]
    * with the raw embeddings as the corpus and the planted twins as the
    * incoming batch. */
  def incrementalSql(minCos: Double): String = {
    val cents = IvfOracle.pinnedCentroids
    val ds = cents.map(c => s"list_dot_product(v, ${arr(c)})")
      .mkString("[\n          ", ",\n          ", "]")
    s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      corp0 AS (SELECT vec_id, v FROM e0),
      bat0 AS (SELECT vec_id + 100000 AS vec_id,
          list_concat([v[1] + 0.5], v[2:]) AS v
        FROM e0 WHERE vec_id < 40),
      corp AS (SELECT vec_id, uv, list_position(ds, list_max(ds)) - 1 AS cell
        FROM (SELECT vec_id,
            list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS uv,
            $ds AS ds
          FROM corp0)),
      bat AS (SELECT vec_id, uv, list_position(ds, list_max(ds)) - 1 AS cell
        FROM (SELECT vec_id,
            list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS uv,
            $ds AS ds
          FROM bat0)),
      pc AS (SELECT b.vec_id AS vid, min(c.vec_id) AS dup_of_corpus
        FROM bat b JOIN corp c ON b.cell = c.cell
          AND list_dot_product(b.uv, c.uv) >= $minCos
        GROUP BY b.vec_id),
      pb AS (SELECT x.vec_id AS vid, min(y.vec_id) AS dup_of_batch
        FROM bat x JOIN bat y ON x.cell = y.cell AND y.vec_id < x.vec_id
          AND list_dot_product(x.uv, y.uv) >= $minCos
        GROUP BY x.vec_id)
      SELECT b.vec_id, b.cell, pc.dup_of_corpus, pb.dup_of_batch,
        (pc.dup_of_corpus IS NOT NULL OR pb.dup_of_batch IS NOT NULL) AS is_dup
      FROM bat b LEFT JOIN pc ON pc.vid = b.vec_id
                 LEFT JOIN pb ON pb.vid = b.vec_id
      ORDER BY b.vec_id"""
  }

  /** Replay of [[graft.streaming.EventStreams.semanticDedupStream]] —
    * the STREAMING CDC composition of the incremental screen. The
    * 4-micro-batch loop is unrolled into CTE stages: stage `b` screens
    * batch `b` against corpus-state `st{b}` (base corpus ∪ every doc
    * ACCEPTED by earlier batches) plus earlier ids of its own batch, and
    * `st{b+1}` folds batch `b`'s accepted docs in. Stream-doc planting
    * arithmetic (negation / twin-shift / echo / reversal) is the same
    * double arithmetic on both sides, so every verdict — including the
    * cross-batch "dup of a doc accepted two batches ago" rows that only
    * exist in the CDC composition — replays bit-exactly. */
  def streamSql(minCos: Double): String = {
    val cents = IvfOracle.pinnedCentroids
    val ds = cents.map(c => s"list_dot_product(v, ${arr(c)})")
      .mkString("[\n          ", ",\n          ", "]")
    def assigned(src: String, extra: String) =
      s"""SELECT vec_id, $extra uv, list_position(ds, list_max(ds)) - 1 AS cell
        FROM (SELECT vec_id, $extra
            list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS uv,
            $ds AS ds
          FROM $src)"""
    val stages = (0 to 3).map { b =>
      s"""v$b AS (
        SELECT x.vec_id AS vid, x.b AS batch_id, x.cell,
          (SELECT min(c.vec_id) FROM st$b c WHERE c.cell = x.cell
             AND list_dot_product(x.uv, c.uv) >= $minCos) AS dup_of_corpus,
          (SELECT min(y.vec_id) FROM sd y WHERE y.b = $b AND y.cell = x.cell
             AND y.vec_id < x.vec_id
             AND list_dot_product(x.uv, y.uv) >= $minCos) AS dup_of_batch
        FROM sd x WHERE x.b = $b),
      st${b + 1} AS (
        SELECT vec_id, uv, cell FROM st$b
        UNION ALL
        SELECT s.vec_id, s.uv, s.cell FROM sd s JOIN v$b ON v$b.vid = s.vec_id
        WHERE v$b.dup_of_corpus IS NULL AND v$b.dup_of_batch IS NULL)"""
    }.mkString(",\n      ")
    s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      sd0 AS (
        SELECT vec_id + 200000 AS vec_id, 0 AS b,
            list_transform(v, x -> -x) AS v
          FROM e0 WHERE vec_id < 10
        UNION ALL
        SELECT vec_id + 200010, 1, list_concat([v[1] + 0.5], v[2:])
          FROM e0 WHERE vec_id < 10
        UNION ALL
        SELECT vec_id + 200020, 2,
            list_concat([-v[1] + 0.05], list_transform(v[2:], x -> -x))
          FROM e0 WHERE vec_id < 10
        UNION ALL
        SELECT vec_id + 200030, 3, list_reverse(v)
          FROM e0 WHERE vec_id < 5
        UNION ALL
        SELECT vec_id + 200035, 3,
            list_concat([list_reverse(v)[1] + 0.05], list_reverse(v)[2:])
          FROM e0 WHERE vec_id < 5),
      st0 AS (${assigned("e0", "")}),
      sd AS (${assigned("sd0", "b,")}),
      $stages
      SELECT vid AS vec_id, batch_id, cell, dup_of_corpus, dup_of_batch,
        (dup_of_corpus IS NOT NULL OR dup_of_batch IS NOT NULL) AS is_dup
      FROM (SELECT * FROM v0 UNION ALL SELECT * FROM v1
            UNION ALL SELECT * FROM v2 UNION ALL SELECT * FROM v3)
      ORDER BY vec_id"""
  }
}

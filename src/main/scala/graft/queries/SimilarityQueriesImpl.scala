package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity

/** Similarity-search queries over the embeddings table. */
object SimilarityQueriesImpl {

  private def queriesSlice(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.embeddings(s, dir).where(col("vec_id") < 10)

  /** Exact top-5 cosine neighbors for 10 query vectors — broadcast query
    * side, streaming corpus. Oracle-checked against DuckDB. */
  val bruteForce = Q(
    "q_sim_topk_brute",
    (s, dir) => {
      Similarity.bruteForceTopK(Tables.embeddings(s, dir), queriesSlice(s, dir),
          "vec_id", "embedding", 5)
        .orderBy(col("qid"), col("rank"))
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      pairs AS (
        SELECT q.vec_id AS qid, c.vec_id AS vid,
          round(list_cosine_similarity(q.v, c.v), 6) AS cos
        FROM e q JOIN e c ON q.vec_id < 10 AND q.vec_id <> c.vec_id),
      ranked AS (
        SELECT qid, vid, cos,
          row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rank
        FROM pairs)
      SELECT qid, rank, vid, cos FROM ranked WHERE rank <= 5
      ORDER BY qid, rank"""))

  /** LSH-bucketed ANN (random hyperplanes, single-bit multiprobe). The
    * seeded planes are literals on BOTH sides ([[LshOracle]]), so the
    * whole pipeline — bucket bits, multiprobe candidates, cosine rank —
    * is hash-checked, not merely recall-pinned. */
  val lsh = Q(
    "q_sim_topk_lsh",
    (s, dir) => {
      Similarity.lshTopK(Tables.embeddings(s, dir), queriesSlice(s, dir),
          "vec_id", "embedding", 5)
        .orderBy(col("qid"), col("rank"))
    },
    Some(LshOracle.topkSql(k = 5, bits = 4, tables = 3, seed = 42L)))

  /** The SAVED IVF index over the pinned quantizer: built once per
    * (fixture, quantizer version) as a cell-partitioned parquet staging
    * table — the production serving shape where index build is amortized
    * across every query batch ([[Similarity.ivfIndex]] build side /
    * [[Similarity.ivfProbe]] serve side). Both IVF consumers
    * (`q_sim_topk_ivf`, `q_label_consistency`) probe THIS table; no
    * assignment pass over raw corpus vectors sits in any query path. */
  private val IvfIndexVersion = 1

  private def stagedIvfIndex(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val key = graft.Fixtures.key(dir, "embeddings.parquet")
    graft.Staging.publishParquet(s,
        s"${graft.Staging.dir("ivf")}/v$IvfIndexVersion/$key",
        partitionBy = Seq("cell")) {
      Similarity.ivfIndex(Tables.embeddings(s, dir), "vec_id", "embedding",
        IvfOracle.pinnedCentroids)
    }
  }

  /** IVF-flat ANN over the PINNED coarse quantizer (nProbe=4): the
    * fixture-fit, unit-normalized centroids are literals on both sides
    * ([[IvfOracle]]), so assignment/probe/rerank all hash-check. The
    * query probes the SAVED index table ([[stagedIvfIndex]]); the
    * online-fit tier ([[Similarity.ivfTopK]]) stays the API for fresh
    * corpora and is recall-pinned in SimilaritySpec. */
  val ivf = Q(
    "q_sim_topk_ivf",
    (s, dir) => {
      Similarity.ivfProbe(stagedIvfIndex(s, dir), queriesSlice(s, dir),
          "vec_id", "embedding", 5, IvfOracle.pinnedCentroids)
        .orderBy(col("qid"), col("rank"))
    },
    Some(IvfOracle.topkSql(k = 5, nProbe = 4)))

  /** The projection planes are seeded literals, so the SAME values are
    * compiled into the Spark expression and the generated oracle SQL —
    * both engines then run the identical sequential double dot product
    * and the replay is bit-exact, not approximately equal. Embeddings
    * are 64-dim by the testdata contract. */
  private val projPlanes =
    graft.operators.Similarity.gaussianPlanes(dim = 64, rows = 8, seed = 7L)

  /** Per-dimension corpus statistics over the embedding matrix — the
    * anisotropy / collapse diagnostic an embedding rollout checks before
    * indexing (a dimension with near-zero variance wastes index bits; a
    * dominant-mean dimension calls for centering before cosine). One
    * posexplode + ONE (dim)-keyed aggregation with map-side partials —
    * 64 groups regardless of corpus size; moments from explicit sums
    * (the formula text is identical in both engines, same q1_agg-family
    * double-sum precedent). */
  val embedDimStats = Q(
    "q_embed_dim_stats",
    (s, dir) => {
      Tables.embeddings(s, dir)
        .select(posexplode(col("embedding").cast("array<double>"))
          .as(Seq("d0", "x")))
        .select((col("d0") + 1).as("dim"), col("x"))
        .groupBy(col("dim"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("x") * col("x")).as("sxx"),
          round(min(col("x")), 6).as("lo"), round(max(col("x")), 6).as("hi"))
        .select(col("dim"), col("n"),
          round(col("sx") / col("n"), 6).as("mean"),
          round((col("sxx") - col("sx") * col("sx") / col("n")) / col("n"), 6)
            .as("var_pop"),
          col("lo"), col("hi"))
        .orderBy(col("dim"))
    },
    Some("""WITH x AS (
        SELECT u.dim, CAST(embedding[u.dim] AS DOUBLE) AS x
        FROM embeddings, unnest(range(1, 65)) AS u(dim)),
      m AS (SELECT dim, count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx,
          round(min(x), 6) AS lo, round(max(x), 6) AS hi
        FROM x GROUP BY dim)
      SELECT CAST(dim AS INT) AS dim, n,
        round(sx / n, 6) AS mean,
        round((sxx - sx * sx / n) / n, 6) AS var_pop,
        lo, hi
      FROM m ORDER BY dim"""))

  /** Label-noise screen by neighbor agreement (confident-learning-lite):
    * EVERY vector queries the pinned IVF index for its top-5 neighbors
    * and is scored by how many share its label — the mislabeled-example
    * audit run before training. The index bounds candidate volume
    * (|corpus| · nProbe/nCells per query instead of all-pairs); at
    * production scale nCells grows with the corpus, so the screen stays
    * near-linear. The fixture's labels are independent of geometry, so
    * agreement hovers near 1/|classes| — the screen machinery, cut
    * ordering, and zero-neighbor handling are what the oracle pins. */
  val labelConsistency = Q(
    "q_label_consistency",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      // full-corpus query side → the guarded selector: collapse-first
      // screen (class-pair candidate work, invariant under exact
      // replication) while the distinct-vector broadcast fits its
      // budget, row-form ivfProbe beyond it — both row-identical
      // (IvfServePlanSpec), so the tier choice never changes results
      val nb = Similarity.ivfScreenAuto(stagedIvfIndex(s, dir), e, "vec_id",
        "embedding", 5, IvfOracle.pinnedCentroids, nProbe = 2)
      val lab = e.select(col("vec_id"), col("label"))
      val ag = nb
        .join(lab.select(col("vec_id").as("vid"), col("label").as("nlab")), "vid")
        .join(lab.select(col("vec_id").as("qid"), col("label").as("qlab")), "qid")
        .groupBy(col("qid").as("vec_id"))
        .agg(count(lit(1)).as("n_nbrs"),
          sum(when(col("nlab") === col("qlab"), 1L).otherwise(0L)).as("n_same"))
      lab.join(ag, Seq("vec_id"), "left")
        .select(col("vec_id"), col("label"),
          coalesce(col("n_nbrs"), lit(0L)).as("n_nbrs"),
          coalesce(col("n_same"), lit(0L)).as("n_same"),
          when(coalesce(col("n_nbrs"), lit(0L)) > 0,
            round(col("n_same") / col("n_nbrs"), 4)).as("agree"))
        .orderBy(col("vec_id"))
    },
    Some(IvfOracle.labelConsistencySql(k = 5, nProbe = 2)))

  /** Random-projection (Johnson-Lindenstrauss) dimensionality reduction
    * 64 -> 8, per-row and shuffle-free — the cheap pre-step before ANN
    * indexing at 100 TB (the projected vectors are what gets bucketed /
    * quantized downstream). */
  val embedProject = Q(
    "q_embed_project",
    (s, dir) => {
      // sort-first: the projection kernel stays above the range exchange
      // (the sort-last form pays a full second kernel pass inside
      // RangePartitioner's sampling — see TextQueriesImpl.docsSorted)
      val proj = graft.operators.Similarity.randomProjection(
        Tables.embeddings(s, dir).orderBy(col("vec_id")),
        "embedding", projPlanes, "proj")
      proj.select(Seq(col("vec_id")) ++
          (1 to 8).map(i => round(element_at(col("proj"), i), 6).as(s"p$i")): _*)
    },
    Some {
      val cols = projPlanes.zipWithIndex.map { case (p, i) =>
        val arr = HashSqlParts.arr(p)
        s"round(list_dot_product(embedding::DOUBLE[], $arr), 6) AS p${i + 1}"
      }.mkString(",\n        ")
      s"""SELECT vec_id,
        $cols
      FROM embeddings ORDER BY vec_id"""
    })

  /** Per-vector int8 quantization ([[Similarity.int8Quantize]]) with the
    * full code vector in the output — the oracle pins every code byte,
    * not just aggregates. The code vector is serialized to a canonical
    * CSV string (`codes_csv`) on BOTH sides: the driver's comparator
    * sorts cell values and cannot hash a top-level array column, so the
    * per-byte exactness witness must be a scalar. */
  val embedQuantize = Q(
    "q_embed_quantize",
    (s, dir) =>
      // sort-first (see TextQueriesImpl.docsSorted): 12.7 s -> 1.1 s at
      // the 100x fixture; the quantize kernel runs once, above the
      // range exchange
      Similarity.int8Quantize(
          Tables.embeddings(s, dir).orderBy(col("vec_id")),
          "vec_id", "embedding")
        .withColumn("codes_csv", array_join(col("codes").cast("array<string>"), ","))
        .drop("codes")
        .select(col("vec_id"), col("maxabs"), col("codes_csv"),
          col("code_sum"), col("code_abs_sum"), col("recon_cos")),
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      q AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS maxabs FROM e),
      c AS (SELECT vec_id, v, maxabs,
          CASE WHEN maxabs > 0
            THEN list_transform(v, x -> CAST(round(x * (127.0 / maxabs)) AS INTEGER))
            ELSE list_transform(v, x -> 0) END AS codes
        FROM q)
      SELECT vec_id, round(maxabs, 6) AS maxabs,
        array_to_string(codes, ',') AS codes_csv,
        CAST(list_sum(codes) AS BIGINT) AS code_sum,
        CAST(list_sum(list_transform(codes, c -> abs(c))) AS BIGINT) AS code_abs_sum,
        CASE WHEN maxabs > 0 THEN
          round(list_cosine_similarity(v,
            list_transform(codes, c -> c / (127.0 / maxabs))), 6)
        END AS recon_cos
      FROM c ORDER BY vec_id"""))

  /** Special-value (NaN / ±Inf / zero-norm) semantics of the vector
    * kernels, ORACLE-CHECKED — the driver-verified witness for the
    * round-15 semantics adjudication (COVERAGE.md "ANSI & special-value
    * semantics"): the kernels contract IEEE arithmetic (NaN propagates,
    * 0/0 → NaN, x/0 → ±Inf, NaN code → 0 — never an error), while the
    * session runs ANSI-on for relational arithmetic. The fixture corpus
    * carries only finite embeddings, so the query PLANTS the specials
    * (same planted-suffix pattern as `q_text_unicode_nfc`): vec_id%4
    * appends NaN / +Inf / -Inf or zeroes the whole vector. Every output
    * is a classification ('nan'/'posinf'/'neginf'/'null'/'finite'), an
    * exact count, or a finite rounded double — raw NaN/Inf never reaches
    * the driver's hash comparator. The DuckDB oracle REPLAYS the
    * kernels' formulas; DuckDB is IEEE except divisor-exactly-0 → NULL,
    * so the oracle spells the x/0 edge as `x * +Inf` (bit-equal for
    * every sign and NaN) — the same spelling the ANSI-safe composed
    * Spark references use in KernelFuzzSpec. */
  val embedSpecials = Q(
    "q_embed_specials",
    (s, dir) => {
      import org.apache.spark.sql.Column
      import graft.functions.KernelExpressions
      val m = pmod(col("vec_id"), lit(4))
      val vd = col("embedding").cast("array<double>")
      val planted = when(m === 0, concat(vd, array(lit(Double.NaN))))
        .when(m === 1, concat(vd, array(lit(Double.PositiveInfinity))))
        .when(m === 2, concat(vd, array(lit(Double.NegativeInfinity))))
        .otherwise(transform(vd, _ => lit(0.0)))
      val plantName = when(m === 0, lit("nan")).when(m === 1, lit("posinf"))
        .when(m === 2, lit("neginf")).otherwise(lit("zeros"))
      def kind(c: Column): Column =
        when(c.isNull, lit("null")).when(isnan(c), lit("nan"))
          .when(c === lit(Double.PositiveInfinity), lit("posinf"))
          .when(c === lit(Double.NegativeInfinity), lit("neginf"))
          .otherwise(lit("finite"))
      def finite(c: Column): Column =
        when(c.isNotNull && !isnan(c) &&
            c =!= lit(Double.PositiveInfinity) &&
            c =!= lit(Double.NegativeInfinity), round(c, 6))
      val q8 = KernelExpressions.int8_quantize(col("t"))
      val u = KernelExpressions.unit_vector(col("t"))
      Tables.embeddings(s, dir).where(col("vec_id") < 256)
        .select(col("vec_id"), plantName.as("plant"), vd.as("v"), planted.as("t"))
        .select(col("vec_id"), col("plant"), q8.as("__q"), u.as("__u"),
          // v vs t exercises the kernel's min-length contract: the
          // appended special is IGNORED, so the value is finite cos(v,v)
          KernelExpressions.cosine_sim(col("v"), col("t")).as("__cvt"),
          KernelExpressions.cosine_sim(col("t"), col("t")).as("__ctt"))
        .select(col("vec_id"), col("plant"),
          kind(col("__q.maxabs")).as("maxabs_kind"),
          finite(col("__q.maxabs")).as("maxabs_fin"),
          size(col("__q.codes")).cast("long").as("code_n"),
          col("__q.code_sum").as("code_sum"),
          col("__q.code_abs_sum").as("code_abs_sum"),
          kind(col("__q.recon_cos")).as("recon_kind"),
          size(filter(col("__u"), x => isnan(x))).cast("long").as("u_nan"),
          size(filter(col("__u"), x => x === lit(0.0))).cast("long").as("u_zero"),
          kind(col("__cvt")).as("cos_vt_kind"),
          finite(col("__cvt")).as("cos_vt_fin"),
          kind(col("__ctt")).as("cos_tt_kind"))
        .orderBy(col("vec_id"))
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
        FROM embeddings WHERE vec_id < 256),
      a AS (SELECT vec_id, v,
          CASE CAST(vec_id % 4 AS INTEGER)
            WHEN 0 THEN list_append(v, 'nan'::DOUBLE)
            WHEN 1 THEN list_append(v, 'infinity'::DOUBLE)
            WHEN 2 THEN list_append(v, '-infinity'::DOUBLE)
            ELSE list_transform(v, x -> 0.0::DOUBLE) END AS t,
          CASE CAST(vec_id % 4 AS INTEGER) WHEN 0 THEN 'nan' WHEN 1 THEN 'posinf'
            WHEN 2 THEN 'neginf' ELSE 'zeros' END AS plant
        FROM e),
      m AS (SELECT vec_id, v, t, plant,
          list_max(list_transform(t, x -> abs(x))) AS maxabs FROM a),
      c AS (SELECT *,
          CASE WHEN maxabs > 0 THEN list_transform(t, x ->
              CASE WHEN NOT isfinite(x * (127.0 / maxabs)) THEN 0
                   ELSE CAST(round(x * (127.0 / maxabs)) AS INTEGER) END)
            ELSE list_transform(t, x -> 0) END AS codes
        FROM m),
      d AS (SELECT *,
          CASE WHEN maxabs > 0 THEN list_transform(codes, k ->
              CASE WHEN 127.0 / maxabs = 0 THEN k * 'infinity'::DOUBLE
                   ELSE k / (127.0 / maxabs) END) END AS dq
        FROM c),
      r AS (SELECT *,
          CASE WHEN maxabs > 0 THEN
            CASE WHEN sqrt(list_dot_product(t, t)) * sqrt(list_dot_product(dq, dq)) = 0
                 THEN list_dot_product(t, dq) * 'infinity'::DOUBLE
                 ELSE list_dot_product(t, dq) /
                   (sqrt(list_dot_product(t, t)) * sqrt(list_dot_product(dq, dq))) END
          END AS recon,
          sqrt(list_dot_product(t, t)) AS norm,
          list_dot_product(v, t[1:len(v)]) AS dot_vt,
          sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(t[1:len(v)], t[1:len(v)])) AS den_vt,
          list_dot_product(t, t) AS dot_tt,
          sqrt(list_dot_product(t, t)) * sqrt(list_dot_product(t, t)) AS den_tt
        FROM d),
      r2 AS (SELECT *,
          CASE WHEN den_vt = 0 THEN dot_vt * 'infinity'::DOUBLE
               ELSE dot_vt / den_vt END AS cvt,
          CASE WHEN den_tt = 0 THEN dot_tt * 'infinity'::DOUBLE
               ELSE dot_tt / den_tt END AS ctt
        FROM r)
      SELECT vec_id, plant,
        CASE WHEN maxabs IS NULL THEN 'null' WHEN isnan(maxabs) THEN 'nan'
             WHEN maxabs = 'infinity'::DOUBLE THEN 'posinf'
             WHEN maxabs = '-infinity'::DOUBLE THEN 'neginf'
             ELSE 'finite' END AS maxabs_kind,
        CASE WHEN isfinite(maxabs) THEN round(maxabs, 6) END AS maxabs_fin,
        CAST(len(codes) AS BIGINT) AS code_n,
        CAST(list_sum(codes) AS BIGINT) AS code_sum,
        CAST(list_sum(list_transform(codes, k -> abs(k))) AS BIGINT) AS code_abs_sum,
        CASE WHEN recon IS NULL THEN 'null' WHEN isnan(recon) THEN 'nan'
             WHEN recon = 'infinity'::DOUBLE THEN 'posinf'
             WHEN recon = '-infinity'::DOUBLE THEN 'neginf'
             ELSE 'finite' END AS recon_kind,
        CAST(len(list_filter(t, x -> isnan(
          CASE WHEN norm = 0 THEN x * 'infinity'::DOUBLE ELSE x / norm END)))
          AS BIGINT) AS u_nan,
        CAST(len(list_filter(t, x ->
          (CASE WHEN norm = 0 THEN x * 'infinity'::DOUBLE ELSE x / norm END) = 0))
          AS BIGINT) AS u_zero,
        CASE WHEN cvt IS NULL THEN 'null' WHEN isnan(cvt) THEN 'nan'
             WHEN cvt = 'infinity'::DOUBLE THEN 'posinf'
             WHEN cvt = '-infinity'::DOUBLE THEN 'neginf'
             ELSE 'finite' END AS cos_vt_kind,
        CASE WHEN isfinite(cvt) THEN round(cvt, 6) END AS cos_vt_fin,
        CASE WHEN ctt IS NULL THEN 'null' WHEN isnan(ctt) THEN 'nan'
             WHEN ctt = 'infinity'::DOUBLE THEN 'posinf'
             WHEN ctt = '-infinity'::DOUBLE THEN 'neginf'
             ELSE 'finite' END AS cos_tt_kind
      FROM r2 ORDER BY vec_id"""))

  def all: Seq[Q] = Seq(bruteForce, lsh, ivf, labelConsistency, embedProject,
    embedDimStats, embedQuantize, embedSpecials)
}

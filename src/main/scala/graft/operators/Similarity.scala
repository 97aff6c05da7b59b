package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.KernelExpressions.unit_vector
import graft.functions.VectorFunctions.array_dot

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Three tiers, by scale:
  *   - bruteForceTopK: exact; the QUERY side is broadcast (small), the
  *     corpus side streams — no shuffle of the corpus, no all-pairs
  *     materialization beyond the per-partition top-k the window prunes.
  *     Right answer when |queries| · |corpus| compute fits the cluster.
  *   - lshTopK: random-hyperplane signs bucket the corpus; queries probe
  *     their bucket plus single-bit flips. Corpus side shuffles once on
  *     bucket id; candidate set is |corpus| / 2^bits · (bits+1) per query.
  *   - ivfTopK: KMeans coarse quantizer (trained on a sample); corpus
  *     partitioned by nearest centroid, queries probe nProbe cells. The
  *     classic IVF-flat layout — at 100 TB the cells become partition keys
  *     so a probe touches only its cells' files.
  */
object Similarity {

  /** struct(dot, −cell) entries under pinned centroids — THE
    * cell-assignment expression every IVF / SemDedup path shares:
    * array_max picks the highest raw dot, ties break to the SMALLEST
    * cell id via the negated index. ONE definition (r17 review — it was
    * re-implemented in ivfIndex, ivfProbe, ivfScreenFromClasses, and
    * assignPinned, whose bit-identical-assignment contract a tie-break
    * tweak applied to one copy would silently break). */
  private def centroidEntries(centroids: Array[Array[Double]])(v: Column): Column =
    array(centroids.zipWithIndex.map { case (cen, i) =>
      struct(array_dot(v, typedLit(cen.toSeq)).as("d"), lit(-i).as("nc"))
    }: _*)


  /** Exact top-k neighbors for each query row (same table by default).
    * Output: (qid, rank, vid, cos) — cosine rounded for stable ordering. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), unit_vector(col(vecCol)).as("qvec"))
    val c = corpus.select(col(idCol).as("vid"), unit_vector(col(vecCol)).as("cvec"))
    val cos = round(array_dot(col("qvec"), col("cvec")), 6)
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid"))
    c.crossJoin(broadcast(q))
      .where(col("qid") =!= col("vid"))
      .select(col("qid"), col("vid"), cos.as("cos"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vid"), col("cos"))
  }

  /** Deterministic random hyperplanes (seeded), returned as literal arrays. */
  private def hyperplanes(dim: Int, bits: Int, seed: Long): Array[Array[Double]] = {
    val rng = new java.util.Random(seed)
    Array.fill(bits)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** Public deterministic Gaussian plane matrix (rows x dim), seeded —
    * shared by the LSH buckets, the random-projection operator, and the
    * oracle-SQL generators (same values on both sides by construction). */
  def gaussianPlanes(dim: Int, rows: Int, seed: Long): Array[Array[Double]] =
    hyperplanes(dim, rows, seed)

  /** Random-projection (Johnson-Lindenstrauss) dimensionality reduction:
    * projects the embedding onto `planes` (one output dimension per
    * plane) with the codegen'd ArrayDot kernel — a pure per-row
    * projection, no shuffle, streams at any scale. The classic cheap
    * pre-step before ANN indexing when the raw dimension is large. */
  def randomProjection(df: DataFrame, vecCol: String,
      planes: Array[Array[Double]], outCol: String): DataFrame = {
    require(planes.nonEmpty, "need at least one projection plane")
    val v = graft.functions.VectorFunctions.toDoubleArray(col(vecCol))
    df.withColumn(outCol, array(planes.map(p =>
      array_dot(v, typedLit(p.toSeq))): _*))
  }

  /** Sign-bit bucket id of a numeric-array embedding under the planes —
    * the codegen'd [[graft.functions.KernelExpressions.HyperplaneBucket]]
    * expression (a Scala UDF here boxed every vector element and broke
    * whole-stage codegen for all four LSH bucket projections). */
  private def bucketCol(planes: Array[Array[Double]])(v: Column): Column =
    graft.functions.KernelExpressions.hyperplane_bucket(v, planes)

  /** Multi-table LSH ANN (textbook layout: L independent b-bit tables);
    * each query probes its bucket plus all single-bit flips per table.
    * Tune (bits, tables) with corpus size: candidates/query ≈
    * |corpus| · L · (bits+1) / 2^bits. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, bits: Int = 4, tables: Int = 3,
      seed: Long = 42L): DataFrame = {
    // empty-corpus guard: there is no vector to size the hyperplanes from,
    // and no possible neighbor — return the empty result, correctly shaped
    // probe a NON-NULL vector for the dimension: size(NULL) is NULL and
    // head.getInt would NPE at plan construction when the first corpus
    // row happens to carry a null embedding (r17 review); an all-null or
    // empty corpus takes the empty-result branch below
    val dimRow = corpus.where(col(vecCol).isNotNull)
      .select(size(col(vecCol))).head(1)
    if (dimRow.isEmpty)
      return corpus.sparkSession.createDataFrame(
        corpus.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("qid",
            queries.schema(idCol).dataType), // qid comes from the QUERIES side
          org.apache.spark.sql.types.StructField("rank",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("vid",
            corpus.schema(idCol).dataType),
          org.apache.spark.sql.types.StructField("cos",
            org.apache.spark.sql.types.DoubleType))))
    val dim = dimRow.head.getInt(0)
    val allPlanes = (0 until tables).map(t => hyperplanes(dim, bits, seed + t))
    val bucketCols = (t: Column, b: Column) => t * lit(1 << bits) + b // (table, bucket) key
    val c = corpus.select(col(idCol).as("vid"), unit_vector(col(vecCol)).as("cvec"),
        explode(array((0 until tables).map(t =>
          bucketCols(lit(t), bucketCol(allPlanes(t))(col(vecCol)))): _*)).as("bucket"))
    val q0 = queries.select(col(idCol).as("qid"), unit_vector(col(vecCol)).as("qvec"),
      array((0 until tables).map(t => bucketCol(allPlanes(t))(col(vecCol))): _*).as("qbs"))
    val probeArr = array((0 until tables).flatMap { t =>
      (0 to bits).map { i =>
        val base = element_at(col("qbs"), t + 1)
        val b = if (i == 0) base else base.bitwiseXOR(lit(1 << (i - 1)))
        bucketCols(lit(t), b)
      }
    }: _*)
    val q = q0.select(col("qid"), col("qvec"), explode(probeArr).as("bucket"))
    val cos = round(array_dot(col("qvec"), col("cvec")), 6)
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid"))
    c.join(broadcast(q), Seq("bucket"))
      .where(col("qid") =!= col("vid"))
      .select(col("qid"), col("vid"), cos.as("cos"))
      .dropDuplicates("qid", "vid")
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vid"), col("cos"))
  }

  /** Embedding near-dup PAIRS at scale: random-hyperplane LSH bucket
    * self-join (the scale path the brute-force cross join falls back
    * from). Candidates shuffle on (table, bucket) keys only; each pair
    * is scored once with the fused cosine kernel, and the threshold
    * filter runs BELOW the pair-dedup so only survivors shuffle.
    *
    * Self-tuning (overridable): bits ≈ log2(n/32) keeps the expected
    * bucket ~32 rows as the corpus grows (candidate count stays
    * ~n · 16 · tables instead of n²/2^bits); tables are then sized for
    * ~95 % recall AT the threshold via the standard sign-LSH collision
    * rate p = (1 − θ/π)^bits, capped at 8. A fixed (bits, tables) pair
    * measured 219 s on a 40 k-vector corpus; the auto-sizing holds the
    * candidate set near-linear in n. */
  def embeddingNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
      minCos: Double, bits: Int = 0, tables: Int = 0,
      seed: Long = 42L): DataFrame = {
    // probe a NON-NULL vector for the dimension: size(NULL) is NULL and
    // head.getInt would NPE at plan construction when the first corpus
    // row happens to carry a null embedding (r17 review); an all-null or
    // empty corpus takes the empty-result branch below
    val dimRow = corpus.where(col(vecCol).isNotNull)
      .select(size(col(vecCol))).head(1)
    if (dimRow.isEmpty) // no vectors → no pairs (and no dim to tune from)
      return corpus.sparkSession.createDataFrame(
        corpus.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("a",
            corpus.schema(idCol).dataType),
          org.apache.spark.sql.types.StructField("b",
            corpus.schema(idCol).dataType),
          org.apache.spark.sql.types.StructField("cos",
            org.apache.spark.sql.types.DoubleType))))
    val dim = dimRow.head.getInt(0)
    val b =
      if (bits > 0) bits
      else {
        val n = corpus.count()
        math.max(6, math.min(14,
          (64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n / 32)) - 1).toInt))
      }
    val collideP = math.pow(1.0 - math.acos(math.min(0.999, math.max(minCos, 0.0))) / math.Pi, b)
    val t =
      if (tables > 0) tables
      else math.max(2, math.min(8, math.ceil(math.log(0.05) / math.log1p(-collideP)).toInt))
    val allPlanes = (0 until t).map(i => hyperplanes(dim, b, seed + i))
    val keyed = corpus.select(col(idCol).as("vid"), unit_vector(col(vecCol)).as("uvec"),
      explode(array((0 until t).map(i =>
        lit(i) * lit(1 << b) + bucketCol(allPlanes(i))(col(vecCol))): _*)).as("bucket"))
    val x = keyed.alias("x")
    val y = keyed.alias("y")
    x.join(y, col("x.bucket") === col("y.bucket") && col("x.vid") < col("y.vid"))
      .select(col("x.vid").as("a"), col("y.vid").as("b"),
        graft.functions.VectorFunctions.array_dot(col("x.uvec"), col("y.uvec")).as("cos"))
      .where(col("cos") >= minCos)
      .dropDuplicates("a", "b")
  }

  /** Row cap for the IVF coarse-quantizer KMeans fit. */
  val IvfFitSampleCap = 100000

  /** IVF-flat ANN: KMeans coarse cells, probe the nProbe nearest cells. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nCells: Int = 16, nProbe: Int = 4,
      seed: Long = 42L): DataFrame = {
    val spark = corpus.sparkSession
    val withVec = corpus.select(col(idCol).as("vid"), unit_vector(col(vecCol)).as("cvec"),
      array_to_vector(col(vecCol)).as("fvec"))
    // random init skips the kmeans|| init passes (several Spark jobs) and
    // 5 iterations is plenty for a coarse quantizer — cell assignment
    // quality barely moves the recall of an nProbe=4 probe. The fit runs
    // on a bounded sample: 5 KMeans iterations over the FULL corpus would
    // be 5 extra full passes — the dominant cost at 100 TB — while a
    // ~100k-row sample pins the centroids just as well for coarse cells.
    val n = withVec.count()
    val fitDf =
      if (n <= IvfFitSampleCap) withVec
      else withVec.sample(withReplacement = false, IvfFitSampleCap.toDouble / n, seed)
    val km = new KMeans().setK(nCells).setSeed(seed).setFeaturesCol("fvec")
      .setPredictionCol("cell").setMaxIter(5).setInitMode("random")
    val model = km.fit(fitDf)
    val c = model.transform(withVec).select(col("vid"), col("cvec"), col("cell"))

    // query → nProbe nearest centroids (tiny driver-side centroid table)
    val centroids = model.clusterCenters.zipWithIndex.map { case (v, i) => (i, v.toArray) }
    val centroidDf = spark.createDataFrame(centroids.toIndexedSeq).toDF("cell", "centroid")
    val q = queries.select(col(idCol).as("qid"), unit_vector(col(vecCol)).as("qvec"))
    val qcos = Dedup.cosine(col("qvec"), col("centroid"))
    val wq = Window.partitionBy(col("qid")).orderBy(col("ccos").desc, col("cell"))
    val probes = q.crossJoin(broadcast(centroidDf))
      .select(col("qid"), col("qvec"), col("cell"), qcos.as("ccos"))
      .withColumn("crank", row_number().over(wq))
      .where(col("crank") <= nProbe)
      .select(col("qid"), col("qvec"), col("cell"))

    val cos = round(array_dot(col("qvec"), col("cvec")), 6)
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid"))
    c.join(broadcast(probes), Seq("cell"))
      .where(col("qid") =!= col("vid"))
      .select(col("qid"), col("vid"), cos.as("cos"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vid"), col("cos"))
  }

  /** IVF-flat ANN over a FROZEN coarse quantizer: the centroids are
    * compile-time literals (trained offline — [[graft.queries.IvfOracle]]
    * pins the fixture fit), so cell assignment is a pure per-row
    * expression with no KMeans job, no sample pass, and a bit-exact
    * DuckDB replay. This is the production IVF layout: the quantizer
    * trains once on a sample and is immutable while the index serves
    * (re-fitting would re-shard every cell); at 100 TB the cell id is
    * the partition key and a probe touches only its cells' files.
    *
    * Cell of a vector = argmax over dot(v, centroid_i), ties to the
    * smallest cell id. Centroid literals are unit-normalized at pin
    * time and the row norm is a positive per-row constant, so raw-dot
    * ranking equals cosine ranking — no per-row normalization needed
    * for assignment. Queries probe their nProbe best cells (dot desc,
    * cell asc); candidates re-rank on exact unit-vector cosine.
    */
  def ivfTopKPinned(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, centroids: Array[Array[Double]],
      nProbe: Int = 4): DataFrame =
    ivfProbe(ivfIndex(corpus, idCol, vecCol, centroids), queries, idCol,
      vecCol, k, centroids, nProbe)

  /** BUILD side of the pinned-quantizer IVF index: one pass over the
    * corpus assigning each vector to its cell and unit-normalizing —
    * `(vid, cvec, cell)`, the table a deployment PERSISTS (partitioned
    * by `cell`) and serves many query batches from. Index build is paid
    * once; [[ivfProbe]] never re-scans raw corpus vectors. */
  def ivfIndex(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    require(centroids.nonEmpty, "need at least one pinned centroid")
    // struct(dot, -cell): array_max → highest dot, ties to SMALLEST cell
    def entries(v: Column): Column = centroidEntries(centroids)(v)
    def rawV(c: Column): Column = graft.functions.VectorFunctions.toDoubleArray(c)
    val cell = (-array_max(entries(rawV(col(vecCol)))).getField("nc")).as("cell")
    corpus.select(col(idCol).as("vid"), unit_vector(col(vecCol)).as("cvec"), cell)
  }

  /** SERVE side: probe a built (or reloaded) [[ivfIndex]] table. Each
    * query ranks its nProbe best cells per-row (no window, no shuffle on
    * the query side) and broadcasts onto the index; when the index is a
    * cell-partitioned parquet table, the broadcast join's dynamic
    * partition pruning skips every unprobed cell's files — the 100 TB
    * serving shape where a probe touches nProbe/nCells of the data. */
  def ivfProbe(index: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, centroids: Array[Array[Double]],
      nProbe: Int = 4): DataFrame = {
    require(centroids.nonEmpty, "need at least one pinned centroid")
    def entries(v: Column): Column = centroidEntries(centroids)(v)
    def rawV(c: Column): Column = graft.functions.VectorFunctions.toDoubleArray(c)
    // per-row probe list: sort entries descending (d desc, nc desc ⇒ cell
    // asc on ties), slice nProbe
    val probeCells = transform(
      slice(reverse(array_sort(entries(rawV(col(vecCol))))), 1, nProbe),
      e => -e.getField("nc"))
    val q = queries.select(col(idCol).as("qid"), unit_vector(col(vecCol)).as("qvec"),
      explode(probeCells).as("cell"))
    val cos = round(array_dot(col("qvec"), col("cvec")), 6)
    // each vid lives in exactly one cell and probe cells are distinct,
    // so (qid, vid) candidates are already unique — no dedup needed.
    // Ranking is the bounded top-k AGGREGATE (value desc, id asc — the
    // same total order as the window-row_number form; TopKSpec pins the
    // equivalence), NOT a row_number window: a full-corpus screen like
    // q_label_consistency feeds |queries|·|corpus|·nProbe/nCells
    // candidate rows into the ranking, and the window form shuffles and
    // SORTS all of them (~5·10⁹ rows / ~200 GB at the 100× fixture —
    // the old count()-probe benchmarks never executed this sort, so the
    // cost was invisible until the honest materialize() probe). The
    // aggregate keeps at most k rows per query in each map task, so the
    // shuffle is O(queries·k·tasks) regardless of candidate volume.
    index.join(broadcast(q), Seq("cell"))
      .where(col("qid") =!= col("vid"))
      .select(col("qid"), col("vid"), cos.as("cos"))
      .groupBy(col("qid"))
      .agg(graft.functions.TopKByValue.top_k_by(col("cos"), col("vid"), k).as("tk"))
      .select(col("qid"), posexplode(col("tk")).as(Seq("r0", "e")))
      .select(col("qid"), (col("r0") + 1).as("rank"),
        col("e").getField("id").as("vid"), col("e").getField("value").as("cos"))
  }

  /** Full-corpus screen variant of [[ivfProbe]], collapse-first: identical
    * output contract (`qid`, `rank`, `vid`, `cos` — IvfServePlanSpec pins
    * row-for-row equality with ivfProbe, plain and under replication),
    * but the candidate generation runs over DISTINCT embedding values
    * instead of rows.
    *
    * Why a separate form exists: when the QUERY side is the whole corpus
    * (q_label_consistency's shape), ivfProbe's candidate volume is
    * |queries|·|corpus|·nProbe/nCells — quadratic in the corpus against
    * a fixed quantizer (the honest materialize() probe measured 345 s at
    * the 100× fixture; the old count() probe had erased the whole
    * ranking join, recording 0.2 s). Cosine depends only on the VALUE of
    * the two vectors, so both sides collapse first — the same
    * replication-invariance argument as the dedup family's
    * collapse-first joins:
    *
    *   1. query classes: distinct query vectors, each probing its nProbe
    *      cells once (the probe list is a function of the value);
    *   2. index classes: distinct `(cvec, cell)` with the k+1 SMALLEST
    *      member vids (a deeper member can never rank above k+1 of its
    *      own classmates — same cos, larger vid);
    *   3. per query class: top k+1 `(cos, vid)` pairs via the bounded
    *      top-k aggregate (k+1 because at most ONE entry — the member
    *      itself — is excluded per consumer);
    *   4. expand class results to members (broadcast of one small row
    *      per distinct vector), drop self, keep k.
    *
    * Both quadratic stages now run over distinct values (class-pair work,
    * invariant under exact replication); everything row-count-sized is a
    * linear scan. The per-(query,candidate) cosine is the same expression
    * over the same operands as ivfProbe, so results are bit-identical.
    *
    * CONTRACT (same shape as [[graft.operators.Joins.rangeJoinAggCollapsed]]):
    * the two broadcasts (`qcls`, `qtop`) are O(distinct query vectors),
    * each row carrying a full embedding array — the collapse pays off
    * exactly when the corpus has meaningful value-duplication or is small
    * enough that distinct-vectors·dim fits a broadcast. On a corpus of
    * genuinely distinct vectors at cluster scale (say 10⁹ × 768 floats),
    * that broadcast is unbounded and will blow the driver/broadcast
    * limit — callers with high distinct-vector cardinality should stay on
    * [[ivfProbe]], whose per-query candidate join shuffles instead of
    * broadcasting. [[ivfScreenAuto]] makes that choice from a cheap
    * distinct-count estimate; registered queries route through it. */
  def ivfScreen(index: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, centroids: Array[Array[Double]],
      nProbe: Int = 4): DataFrame =
    ivfScreenFromClasses(index,
      queries.select(col(vecCol).as("__qv")).distinct(),
      queries, idCol, vecCol, k, centroids, nProbe)

  /** [[ivfScreen]] body over a PRECOMPUTED distinct-class side
    * (one `__qv` row per distinct query vector) — lets
    * [[ivfScreenAuto]]'s hard-cap confirm job double as the screen's own
    * stage 1 instead of running the distinct twice. */
  private def ivfScreenFromClasses(index: DataFrame, classes: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      centroids: Array[Array[Double]], nProbe: Int): DataFrame = {
    require(centroids.nonEmpty, "need at least one pinned centroid")
    def entries(v: Column): Column = centroidEntries(centroids)(v)
    def rawV(c: Column): Column = graft.functions.VectorFunctions.toDoubleArray(c)
    val probeCells = transform(
      slice(reverse(array_sort(entries(rawV(col("__qv"))))), 1, nProbe),
      e => -e.getField("nc"))
    val qcls = classes
      .select(col("__qv"), unit_vector(col("__qv")).as("__qu"),
        explode(probeCells).as("cell"))
    // k+1 smallest vids per class: top_k_by on the NEGATED vid (exact in
    // double far past any id range here), ascending-vid order falls out
    val icls = index.groupBy(col("cvec"), col("cell"))
      .agg(graft.functions.TopKByValue
        .top_k_by(-col("vid").cast("double"), col("vid"), k + 1).as("__iv"))
      .select(col("cell"), col("cvec"),
        transform(col("__iv"), e => e.getField("id")).as("__vids"))
    val cos = round(array_dot(col("__qu"), col("cvec")), 6)
    val qtop = icls.join(broadcast(qcls), Seq("cell"))
      .select(col("__qv"), cos.as("__cos"), explode(col("__vids")).as("__vid"))
      .groupBy(col("__qv"))
      .agg(graft.functions.TopKByValue
        .top_k_by(col("__cos"), col("__vid"), k + 1).as("__tk"))
    queries.select(col(idCol).as("qid"), col(vecCol).as("__qv"))
      .join(broadcast(qtop), Seq("__qv"))
      .select(col("qid"), posexplode(
        slice(filter(col("__tk"), e => e.getField("id") =!= col("qid")), 1, k))
        .as(Seq("r0", "e")))
      .select(col("qid"), (col("r0") + 1).as("rank"),
        col("e").getField("id").as("vid"), col("e").getField("value").as("cos"))
  }

  /** Form selector for a full-corpus screen: [[ivfScreen]] (collapse-
    * first, broadcast O(distinct vectors)) when the estimated distinct-
    * vector broadcast fits `maxBroadcastBytes`, [[ivfProbe]] (row-form,
    * shuffling candidate join) otherwise. Both forms are row-for-row
    * identical (IvfServePlanSpec), so the choice is purely a plan-shape
    * decision — the same guarded-tier pattern as
    * [[graft.operators.Joins.rangeJoinAggCollapsed]]'s contract note.
    *
    * The tier choice is JOB-FREE (round 15; VERDICT r14 #6): it reads
    * Catalyst statistics off the query side's optimized plan instead of
    * running an estimate aggregate, so constructing or explaining a plan
    * that embeds an auto-screen launches ZERO Spark jobs (PlanSpec pins
    * this for the registered IVF queries). The row upper bound is
    * `stats.rowCount` when CBO provides one, else
    * `stats.sizeInBytes / (4·dim)` — dim comes from the pinned
    * centroids, and 4·dim bytes/row assumes float vectors at ~1×
    * parquet compression, the floor for the near-incompressible random
    * mantissas real embeddings carry (a corpus that DOES compress
    * further does so through value duplication, which shrinks the
    * distinct-class broadcast the bound is protecting — the misestimate
    * direction is self-correcting). Filters/projections above the scan
    * keep size-only stats conservative (they don't shrink sizeInBytes).
    * Sizing: a query class broadcasts its raw + unit vector (doubles
    * downstream) plus a (k+1)-entry top-k array — ≈ nd·(16·dim +
    * 16·(k+2)) bytes. The default 256 MB budget keeps the broadcast an
    * order of magnitude under Spark's hard 8 GB limit while letting a
    * ~200k-distinct-vector ×64-dim corpus (the 100× fixture) take the
    * collapse-first path.
    *
    * The estimate is advisory; the cap is still HARD — now enforced
    * INSIDE the screen plan instead of by a construction-time confirm
    * job: the stage-1 distinct is wrapped in `limit(cap+1)` + a window
    * count + `assert_true(count <= cap)`, so if the true distinct-class
    * count exceeds the byte budget's row cap the query fails LOUDLY at
    * execution (naming ivfProbe as the tier to use) before a single
    * over-budget byte broadcasts — never silently truncated, never an
    * unbounded broadcast. Degradation contract vs r14: an over-cap
    * misestimate now raises instead of auto-falling-back, because the
    * fallback decision would need the very runtime count the job-free
    * construction is not allowed to take. */
  def ivfScreenAuto(index: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, centroids: Array[Array[Double]],
      nProbe: Int = 4, maxBroadcastBytes: Long = 256L << 20): DataFrame =
    ivfScreenAutoTiered(index, queries, idCol, vecCol, k, centroids,
      nProbe, maxBroadcastBytes)._1

  /** [[ivfScreenAuto]] returning the chosen tier alongside the plan —
    * `"screen"` (stats bound under budget; in-plan hard-cap guard armed)
    * or `"probe"` (stats bound over budget). `estimateOverride`
    * substitutes the stats-derived row bound so specs can force a
    * misestimate in either direction — high forces the probe tier, low
    * forces the screen tier whose execution must then trip the in-plan
    * cap guard; production callers leave it None. */
  private[graft] def ivfScreenAutoTiered(index: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, centroids: Array[Array[Double]],
      nProbe: Int = 4, maxBroadcastBytes: Long = 256L << 20,
      estimateOverride: Option[Long] = None): (DataFrame, String) = {
    require(centroids.nonEmpty, "need at least one pinned centroid")
    val dim = centroids(0).length.toLong
    val perClassBytes = 16L * dim + 16L * (k + 2)
    // job-free row upper bound from Catalyst statistics (see
    // ivfScreenAuto's scaladoc for why 4·dim bytes/row is the safe floor)
    val stats = queries.queryExecution.optimizedPlan.stats
    val rowBound: BigInt = estimateOverride.map(BigInt(_)).getOrElse(
      stats.rowCount.getOrElse(stats.sizeInBytes / BigInt(4L * dim).max(1)))
    if (rowBound * perClassBytes > maxBroadcastBytes)
      return (ivfProbe(index, queries, idCol, vecCol, k, centroids, nProbe),
        "probe")
    // HARD cap, enforced inside the plan (no construction-time job): a
    // map-side-partial COUNT of the distinct classes rides a one-row
    // broadcast onto every class row, and assert_true fails the query
    // loudly before anything broadcasts. Within the cap the guard is a
    // row-preserving no-op. (The previous form bounded rows with
    // limit(cap+1) + an empty-partition window count — both funnel every
    // class row, VECTORS INCLUDED, through a single partition. The
    // fixtures' distinct-class counts are small so no bench query moved,
    // but the guard exists precisely for distinct-heavy corpora, where
    // the funnel grows to cap ≈ 236k full vector rows (~100 MB through
    // one task) just before the tier flips to probe. The count aggregate
    // ships per-partition partial longs instead, and the distinct's
    // exchange is reused across the count and the class stream.)
    val cap = math.max(1L, maxBroadcastBytes / perClassBytes)
    val dcls = queries.select(col(vecCol).as("__qv")).distinct()
    val clsN = dcls.agg(count(lit(1)).as("__cls_n"))
    val classes = dcls.crossJoin(broadcast(clsN))
      .where(assert_true(col("__cls_n") <= cap, lit(
        s"ivfScreenAuto: distinct query-vector classes exceed the $cap-row " +
          s"hard cap implied by the $maxBroadcastBytes-byte broadcast budget " +
          s"(stats row bound was $rowBound) — the corpus is too " +
          "distinct-heavy for the collapse-first screen; call ivfProbe, " +
          "whose candidate join shuffles instead of broadcasting")).isNull)
      .drop("__cls_n")
    (ivfScreenFromClasses(index, classes, queries, idCol, vecCol, k,
      centroids, nProbe), "screen")
  }

  /** SemDeDup semantic deduplication (Abbas et al. 2023, arXiv:2303.09540):
    * cluster the embeddings with a FROZEN coarse quantizer, compare pairs
    * only WITHIN a cluster, and for every pair above the cosine threshold
    * drop the more-central member — keeping low-centrality examples
    * preserves diversity, the paper's best-performing keep rule.
    *
    * Scale shape: pair volume is Σ_c (distinct vectors in c)² instead of
    * N² — exact duplicates are collapsed to one representative BEFORE the
    * in-cell join (see [[semanticDedupPinned]]), and the cluster count
    * grows with the corpus (k ∝ N holds E[n_c] constant, the paper
    * uses k≈10⁴ for 10⁸ docs), the cell id is the ONE shuffle key in the
    * plan, and each cell's pairs are generated cell-locally. Assignment
    * is a pure per-row expression over the pinned centroids (same frozen-
    * quantizer contract as [[ivfTopKPinned]]: train offline on a sample,
    * immutable while serving), so the whole pipeline — assignment,
    * in-cell pair join, unrounded threshold compare, keep rule — replays
    * bit-exactly in SQL.
    *
    * Output: one row per input doc — (id, cell, centroid_cos, n_dups,
    * keep) where keep=false iff some same-cell neighbor above `minCos`
    * is strictly LESS central (smaller unit-dot to the cell centroid;
    * fp-exact ties broken toward keeping the smaller id).
    */
  /** Online-quantizer tier of [[semanticDedupPinned]] for a FRESH corpus
    * with no offline quantizer yet: fit KMeans on a bounded sample (same
    * [[IvfFitSampleCap]] policy as [[ivfTopK]] — the fit never scans the
    * full corpus twice), unit-normalize the centroids, and run the same
    * cell-bounded pair logic. No SQL replay exists for Lloyd's
    * iterations, so this tier is spec-pinned (parity vs the pinned tier
    * on its own centroids) while `q_dedup_semantic` hash-checks the
    * shared pipeline via literals. */
  def semanticDedup(corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int, minCos: Double, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    val withVec = corpus.select(col(idCol), col(vecCol),
      array_to_vector(col(vecCol)).as("fvec"))
    val n = withVec.count()
    val fitDf =
      if (n <= IvfFitSampleCap) withVec
      else withVec.sample(withReplacement = false, IvfFitSampleCap.toDouble / n, seed)
    val km = new KMeans().setK(nCells).setSeed(seed).setFeaturesCol("fvec")
      .setPredictionCol("cell").setMaxIter(5).setInitMode("random")
    val centroids = km.fit(fitDf).clusterCenters.map { v =>
      val a = v.toArray
      val norm = math.sqrt(a.map(x => x * x).sum)
      if (norm > 0) a.map(_ / norm) else a
    }
    semanticDedupPinned(corpus, idCol, vecCol, centroids, minCos)
  }

  /** (vid, uvec, cell) under the frozen quantizer: struct(dot, -cell)
    * array_max → highest raw dot, ties to SMALLEST cell id (raw-dot
    * argmax ≡ cosine argmax: unit centroids, positive row norm). */
  private def assignPinned(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], passthrough: Seq[String] = Nil): DataFrame = {
    def entries(v: Column): Column = centroidEntries(centroids)(v)
    def rawV(c: Column): Column = graft.functions.VectorFunctions.toDoubleArray(c)
    val cell = (-array_max(entries(rawV(col(vecCol)))).getField("nc")).as("cell")
    df.select(col(idCol).as("vid") +: unit_vector(col(vecCol)).as("uvec") +: cell +:
      passthrough.map(col): _*)
  }

  /** Incremental semantic dedup: screen a NEW batch against an existing
    * corpus (and against itself) under the frozen quantizer — the
    * nightly-ingest shape. Per batch doc: the smallest-id corpus doc it
    * duplicates (same cell, cosine ≥ minCos), the smallest-id EARLIER
    * batch doc it duplicates, and the combined is_dup verdict — the
    * embedding-space mirror of [[Dedup.incrementalDedup]]'s contract.
    *
    * Scale shape: the CORPUS never self-joins — cost is
    * |batch|·E[cell occupancy] + |batch|²-within-cell, and both
    * verdict aggregates are batch-sized broadcasts back onto the batch
    * rows. The corpus side's cell assignment is a pure per-row
    * expression over the same literals serving ANN and full dedup. */
  def semanticDedupIncremental(corpus: DataFrame, batch: DataFrame,
      idCol: String, vecCol: String, centroids: Array[Array[Double]],
      minCos: Double): DataFrame = {
    require(centroids.nonEmpty, "need at least one pinned centroid")
    val c = assignPinned(corpus, idCol, vecCol, centroids)
    val b = assignPinned(batch, idCol, vecCol, centroids)
    val vsCorpus = b.alias("b").join(c.alias("c"),
        col("b.cell") === col("c.cell") &&
        array_dot(col("b.uvec"), col("c.uvec")) >= minCos)
      .groupBy(col("b.vid").as("vid"))
      .agg(min(col("c.vid")).as("dup_of_corpus"))
    val vsBatch = b.alias("x").join(b.alias("y"),
        col("x.cell") === col("y.cell") && col("y.vid") < col("x.vid") &&
        array_dot(col("x.uvec"), col("y.uvec")) >= minCos)
      .groupBy(col("x.vid").as("vid"))
      .agg(min(col("y.vid")).as("dup_of_batch"))
    b.select(col("vid"), col("cell"))
      .join(broadcast(vsCorpus), Seq("vid"), "left")
      .join(broadcast(vsBatch), Seq("vid"), "left")
      .select(col("vid"), col("cell"), col("dup_of_corpus"), col("dup_of_batch"),
        (col("dup_of_corpus").isNotNull || col("dup_of_batch").isNotNull).as("is_dup"))
  }

  def semanticDedupPinned(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], minCos: Double): DataFrame = {
    require(centroids.nonEmpty, "need at least one pinned centroid")
    // centrality = unit-vector dot to the OWN cell's centroid (centroid
    // literals are unit-normalized at pin time, so this IS the cosine)
    val uds = array(centroids.map(cen =>
      array_dot(col("uvec"), typedLit(cen.toSeq))): _*)
    // EXACT-COLLAPSE FIRST — the same move the three LSH dedup families
    // make. Members with bit-identical embedding arrays share uvec, cell,
    // centrality and every pairwise dot by construction, so the in-cell
    // pair join only needs one REPRESENTATIVE per distinct vector:
    // candidate volume is Σ_c (distinct vectors in cell c)² — invariant
    // under corpus duplication — instead of Σ_c n_c², which grows
    // quadratically with every exact copy (a 100×-replicated corpus pays
    // 10 000× the pairs for the same information). One window shuffle on
    // the raw vector attaches each member to its group (min-id
    // representative `__gmin`, group size `__gsz`); everything group-
    // level is then expanded back per member in closed form.
    val w = Window.partitionBy(col(vecCol))
    val members = corpus
      .withColumn("__gmin", min(col(idCol)).over(w))
      .withColumn("__gsz", count(lit(1)).over(w))
    // identical members duplicate EACH OTHER iff the self-dot clears the
    // threshold — true for any real unit vector (dot(u,u) ≈ 1), false for
    // the zero vector (unit_vector(0) = 0) or a minCos pinned above the
    // fp self-dot; gating keeps the collapsed form bit-equal to the
    // member-level pair join on those edges
    def selfdup: Column =
      coalesce(array_dot(col("uvec"), col("uvec")) >= minCos, lit(false))
    val reps = assignPinned(
        members.where(col(idCol) === col("__gmin")), idCol, vecCol, centroids,
        passthrough = Seq("__gsz"))
      .withColumn("ccos", element_at(uds, col("cell") + 1))
    val pairs = reps.alias("x").join(reps.alias("y"),
        col("x.cell") === col("y.cell") && col("x.vid") < col("y.vid"))
      .where(array_dot(col("x.uvec"), col("y.uvec")) >= minCos)
      .select(col("x.vid").as("a"), col("x.ccos").as("accos"),
        col("x.__gsz").as("asz"),
        col("y.vid").as("b"), col("y.ccos").as("bccos"),
        col("y.__gsz").as("bsz"))
    // group-level verdict over both pair directions: the cross-group dup
    // mass (Σ of neighbor-group sizes — every member of a paired group is
    // a neighbor of every member of this one, identical arrays make all
    // those cosines equal), the strictly-less-central witness, and the
    // smallest rep id among fp-TIED neighbor groups (rep id = min member
    // id, which is exactly the id the member-level tie rule compares)
    val nbrs = pairs.select(col("a").as("gid"), col("accos").as("ccos"),
        col("b").as("ngid"), col("bccos").as("nccos"), col("bsz").as("nsz"))
      .unionByName(pairs.select(col("b").as("gid"), col("bccos").as("ccos"),
        col("a").as("ngid"), col("accos").as("nccos"), col("asz").as("nsz")))
    val gver = nbrs.groupBy(col("gid"))
      .agg(sum(col("nsz")).as("xdups"),
        max(col("ccos") > col("nccos")).as("gt"),
        min(when(col("ccos") === col("nccos"), col("ngid"))).as("tiemin"))
    // expand to members: cell/centrality are recomputed per row (same
    // array → same bits as the rep), group stats arrive via the verdict,
    // which holds only groups that HAVE a near-dup (sub-percent of a real
    // corpus) — broadcast it so the full doc side never shuffles on id
    val keyed = assignPinned(members, idCol, vecCol, centroids,
        passthrough = Seq("__gmin", "__gsz"))
      .withColumn("ccos", element_at(uds, col("cell") + 1))
    val removed =
      coalesce(col("gt"), lit(false)) ||
        (selfdup && col("vid") > col("__gmin")) ||
        (col("tiemin").isNotNull && col("vid") > col("tiemin"))
    keyed.join(broadcast(gver), col("__gmin") === col("gid"), "left")
      .select(col("vid"), col("cell"),
        round(col("ccos"), 6).as("centroid_cos"),
        (when(selfdup, col("__gsz") - 1).otherwise(0L) +
          coalesce(col("xdups"), lit(0L))).as("n_dups"),
        (!removed).as("keep"))
  }

  /** The pre-collapse member-level form of [[semanticDedupPinned]] —
    * kept as the parity oracle for the spec: Σ_c n_c² pairs, every
    * member joins every same-cell member. Bit-equal output by contract;
    * never the serving path. */
  private[operators] def semanticDedupPinnedDirect(corpus: DataFrame,
      idCol: String, vecCol: String,
      centroids: Array[Array[Double]], minCos: Double): DataFrame = {
    require(centroids.nonEmpty, "need at least one pinned centroid")
    val uds = array(centroids.map(cen =>
      array_dot(col("uvec"), typedLit(cen.toSeq))): _*)
    val keyed = assignPinned(corpus, idCol, vecCol, centroids)
      .withColumn("ccos", element_at(uds, col("cell") + 1))
    val pairs = keyed.alias("x").join(keyed.alias("y"),
        col("x.cell") === col("y.cell") && col("x.vid") < col("y.vid"))
      .where(array_dot(col("x.uvec"), col("y.uvec")) >= minCos)
      .select(col("x.vid").as("a"), col("x.ccos").as("accos"),
        col("y.vid").as("b"), col("y.ccos").as("bccos"))
    val nbrs = pairs.select(col("a").as("vid"), col("accos").as("ccos"),
        col("b").as("nvid"), col("bccos").as("nccos"))
      .unionByName(pairs.select(col("b").as("vid"), col("bccos").as("ccos"),
        col("a").as("nvid"), col("accos").as("nccos")))
    val verdict = nbrs.groupBy(col("vid"))
      .agg(count(lit(1)).as("n_dups"),
        max((col("ccos") > col("nccos")) ||
          (col("ccos") === col("nccos") && col("vid") > col("nvid"))).as("removed"))
    keyed.join(broadcast(verdict), Seq("vid"), "left")
      .select(col("vid"), col("cell"),
        round(col("ccos"), 6).as("centroid_cos"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        coalesce(!col("removed"), lit(true)).as("keep"))
  }

  /** Symmetric per-vector int8 quantization — the 4× memory cut that
    * makes a 100 TB ANN corpus fit executor RAM (IVF/LSH candidates are
    * re-ranked on codes; only survivors touch float vectors). scale =
    * 127/max|x| per vector, code_i = round(x_i · scale) ∈ [-127, 127]
    * (round of a value ≤ 127 in magnitude — never clamps). Output keeps
    * the diagnostics a quantization rollout needs: code checksums and the
    * reconstruction cosine against the original vector.
    *
    * Per-row, shuffle-free, streams at any scale. All arithmetic is
    * double-exact and replayable: one multiply per element, round-half-up
    * (Spark ROUND ≡ DuckDB round, both away from zero), dequantized
    * values are codes/scale. All-zero vectors quantize to all-zero codes
    * with a NULL reconstruction cosine (0/0). */
  def int8Quantize(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    // ONE fused kernel pass (maxabs, HALF_UP codes, integer sums,
    // reconstruction cosine) — the composed transform/aggregate-HOF
    // form it replaced ran INTERPRETED per element (~23 s for 200 k
    // vectors at the 100× fixture) and is kept below as the spec-pinned
    // parity reference; PipelineOpsSpec pins bit-equality per field
    val st = graft.functions.KernelExpressions.int8_quantize(col(vecCol))
    df.select(col(idCol), st.as("__q"))
      .select(col(idCol),
        round(col("__q.maxabs"), 6).as("maxabs"),
        col("__q.codes").as("codes"),
        col("__q.code_sum").as("code_sum"),
        col("__q.code_abs_sum").as("code_abs_sum"),
        round(col("__q.recon_cos"), 6).as("recon_cos"))
  }

  /** The composed-HOF form of [[int8Quantize]] — PARITY REFERENCE ONLY
    * (PipelineOpsSpec pins the kernel bit-equal to it): four interpreted
    * `transform`s plus two interpreted `aggregate` folds per row make it
    * ~20× the kernel's cost at scale.
    *
    * Differs from the pre-kernel query form in ONE latent detail the
    * kernel surfaced: the original computed `recon_cos` and the rounded
    * `maxabs` output in the SAME select, so Spark's lateral-column-alias
    * resolution silently bound the dequantization scale to the ROUNDED
    * maxabs — a ~1e-12-level divergence from the DuckDB oracle (which
    * binds the raw column) that was invisible at 6 dp on realistic
    * magnitudes but flips recon_cos to NaN when maxabs rounds to 0.
    * Here the rounding happens in a separate outer select, so the
    * reference is unambiguous and matches both the kernel and the
    * oracle's raw-maxabs semantics.
    *
    * ANSI-SAFE BY CONSTRUCTION (round 15): the reference expresses the
    * kernel's IEEE special-value contract in forms legal under the
    * session's pinned ANSI mode — divisors go through `nullif(_, 0)` so
    * no Divide can raise DIVIDE_BY_ZERO regardless of evaluation order
    * (ANSI subexpression hoisting can evaluate past a `when` guard on
    * local relations), the int cast goes through `nanvl` + a
    * [-2^31, 2^31-1] clamp so a NaN/±Inf code value maps to the kernel's
    * Java `Double.toInt` result (0 / saturation) instead of raising
    * CAST_OVERFLOW, and the one true IEEE x/0 edge (maxabs = +Inf makes
    * scale exactly 0) is spelled `c * +Inf`, which is bit-equal to
    * c/0.0 for every sign and for NaN. KernelFuzzSpec replays this form
    * against the kernel on NaN/±Inf/subnormal vectors under ANSI. */
  private[graft] def int8QuantizeComposed(df: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val maxabs = array_max(transform(v, x => abs(x)))
    val scale = lit(127.0) / nullif(col("maxabs"), lit(0.0))
    val codes = when(col("maxabs") > 0,
      transform(col("v"), x =>
        greatest(lit(Int.MinValue.toDouble),
          least(lit(Int.MaxValue.toDouble),
            nanvl(round(x * scale, 0), lit(0.0)))).cast("int")))
      .otherwise(transform(col("v"), _ => lit(0)))
    val dq = transform(col("codes"), c =>
      when(scale === lit(0.0), c.cast("double") * lit(Double.PositiveInfinity))
        .otherwise(c / nullif(scale, lit(0.0))))
    df.select(col(idCol), v.as("v"), maxabs.as("maxabs"))
      .withColumn("codes", codes)
      .select(col(idCol), col("maxabs"), col("codes"),
        aggregate(col("codes"), lit(0L), (acc, c) => acc + c).as("code_sum"),
        aggregate(col("codes"), lit(0L), (acc, c) => acc + abs(c)).as("code_abs_sum"),
        when(col("maxabs") > 0,
          round(Dedup.cosine(col("v"), dq), 6)).as("recon_cos"))
      .select(col(idCol), round(col("maxabs"), 6).as("maxabs"), col("codes"),
        col("code_sum"), col("code_abs_sum"), col("recon_cos"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph-motif counting: triangle listing / per-vertex
  * triangle counts over an undirected edge list — the graph-shaped
  * diagnostic (community density, link-farm detection, co-purchase
  * triads) that complements [[Components]]' connectivity.
  *
  * The naive 3-way self-join explodes on high-degree vertices: a hub of
  * degree d contributes C(d,2) wedges no matter how few triangles close.
  * The classical fix (Chiba–Nishizeki / Suri–Vassilvitskii) is DEGREE
  * ORIENTATION: point every undirected edge from its lower-(degree, id)
  * endpoint to the higher one. The result is acyclic, every triangle
  * survives as EXACTLY one directed path u→v, v→w plus closing edge
  * u→w, and the out-degree of any vertex is O(sqrt(m)) — so the wedge
  * join's fan-out is bounded by graph arboricity, not by hub degree.
  * On a 1000-executor cluster the three joins are plain shuffle hash
  * joins on vertex keys; nothing is ever nested-loop.
  */
object Graph {

  /** Per-vertex triangle counts from an edge list with columns `(a, b)`.
    * Input edges may be duplicated, reversed, or self-looped — they are
    * canonicalized first (undirected simple graph). Output:
    * `(node, n_triangles)`, one row per vertex in >= 1 triangle.
    *
    * Candidate generation is adjacency-list INTERSECTION, not a wedge
    * join: per oriented vertex, out-neighbors collect into one sorted
    * array (bounded O(sqrt m) entries by the orientation — collect_list
    * here cannot blow up on hubs), then each edge (u,v) intersects
    * nbrs(u) with nbrs(v); every common neighbor closes exactly one
    * triangle. This never MATERIALIZES the Σ outdeg² wedge rows the join
    * form streams through its hash probe (83 M at sf0.1 from 1.2 M
    * edges) — the intersection walks the same candidate space inside one
    * codegen'd array op per edge and emits only actual triangles
    * (measured 3x: 5.2-6.5 s → 1.8-2.0 s warm at sf0.1). When the
    * neighbor table fits a broadcast (`broadcastMaxEdges` total array
    * entries, same order as the edge list) both enrichment joins
    * broadcast, so triangles stream map-side; past that they are plain
    * shuffle hash joins on vertex keys — never nested-loop. Corners are
    * counted with ONE explode over (x, y, z).
    *
    * Cache-lifetime contract (ADVICE r17 #3): the oriented adjacency is
    * persisted and released after the FIRST Dataset action on the
    * returned frame ([[graft.CacheLifecycle.releaseAfterFirstAction]]).
    * A second action recomputes the adjacency uncached — correct but
    * slower; callers that act repeatedly should persist/checkpoint the
    * RESULT themselves. Probes that bypass the Dataset action listener
    * (e.g. counting `queryExecution.toRdd` directly, as Bench does)
    * never trigger the release, so the entry lives until a
    * `clearCache()` sweep — which Bench runs between queries.
    */
  def triangleCorners(edges: DataFrame,
      broadcastMaxEdges: Long = 20000000L,
      assumeCanonical: Boolean = false): DataFrame = {
    // assumeCanonical: caller guarantees a < b, no self-loops, no
    // duplicates (e.g. a staged edge table) — skips a full |E| shuffle
    val und =
      if (assumeCanonical) edges.select(col("a").as("u"), col("b").as("v"))
      else edges
        .where(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v"))
        .distinct()
    val deg = und.select(col("u").as("node"))
      .unionByName(und.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // orient each edge from lower (deg, id) to higher — acyclic by
    // totality of the order, out-degree bounded by O(sqrt m)
    val oriented = und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          col("u")).otherwise(col("v")).as("src"),
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          col("v")).otherwise(col("u")).as("dst"))
      .persist()
    val m = oriented.count() // materializes the cache; sizes the tier
    def side(df: DataFrame): DataFrame =
      if (m <= broadcastMaxEdges) broadcast(df) else df
    val nbrs = oriented.groupBy(col("src"))
      .agg(sort_array(collect_list(col("dst"))).as("ns"))
    // inner joins drop edges whose endpoint has no out-neighbors — such
    // an edge heads no wedge (it can still CLOSE a triangle, which only
    // consults the arrays, so nothing is lost)
    val triangles = oriented
      .join(side(nbrs.select(col("src").as("src"), col("ns").as("nu"))), "src")
      .join(side(nbrs.select(col("src").as("dst"), col("ns").as("nv"))), "dst")
      .select(col("src").as("x"), col("dst").as("y"),
        explode(array_intersect(col("nu"), col("nv"))).as("z"))
    val result = triangles
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
    // release the persisted adjacency after the result's first action —
    // without this every triangleCorners call leaked one CacheManager
    // entry for the session's lifetime (r17 review; the same
    // long-lived-session leak CacheLifecycle was built to close)
    CacheLifecycle.releaseAfterFirstAction(oriented, result)
  }

  /** Fixed-point PageRank over an undirected edge list `(a, b)`: the
    * importance/centrality score a curation pipeline uses to weight
    * documents by link authority or parts by co-purchase centrality.
    *
    * Ranks are held as BIGINT millionths (`scale` = 1e6) and every step
    * is INTEGER arithmetic — `contrib = rank div deg`, `rank' =
    * (100-d)%·scale + (d% · Σ contribs) div 100` — so the computation is
    * bit-reproducible across engines, runs, and partitionings. A
    * floating-point PageRank would make the per-vertex Σ depend on the
    * order partial sums arrive in (non-associative double addition);
    * exact integers make the shuffle order irrelevant. The cost is a
    * truncation leak of < deg ulps per vertex per iteration — noise at
    * scale 1e6, and identically reproduced by any engine computing the
    * same recurrence.
    *
    * Plan shape per iteration: one join (ranks ⋈ adjacency on src) and
    * one shuffle aggregation on dst (map-side partials bound the shuffle
    * by |V|·partitions, not |E|). The adjacency+degree table is built in
    * ONE shuffle (count window over the src partitioning) and persisted
    * hash-partitioned and sorted on src, so per-iteration joins read it
    * in place and move only the |V|-row rank side — the classic
    * bulk-synchronous PageRank dataflow with the big side's exchange
    * paid once. On an undirected graph every vertex has an in-edge, so
    * no dangling-mass term is needed.
    *
    * Cache-lifetime contract (ADVICE r17 #3): same as
    * [[triangleCorners]] — the persisted adjacency is released after
    * the FIRST Dataset action on the result; later actions recompute it
    * uncached, and toRdd-style probes rely on an external
    * `clearCache()` sweep (Bench's between-query protocol).
    */
  def pagerankFixedPoint(edges: DataFrame, iters: Int,
      dampingPct: Int = 85, scale: Long = 1000000L,
      assumeCanonical: Boolean = false): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampingPct >= 0 && dampingPct <= 100, s"bad damping $dampingPct")
    val und =
      if (assumeCanonical) edges.select(col("a").as("u"), col("b").as("v"))
      else edges
        .where(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v"))
        .distinct()
    val adj = und.select(col("u").as("src"), col("v").as("dst"))
      .unionByName(und.select(col("v").as("src"), col("u").as("dst")))
    // deg is persisted too: the rank SEED reads it, and without the cache
    // the whole edge-build pipeline (self-join + distinct) would appear a
    // second time in the iteration lineage and execute again
    // ONE shuffle builds the iteration-ready adjacency: out-degree via a
    // count window over the src partitioning (no separate groupBy+join
    // pass over |E| rows), and the window's sort leaves the cache
    // hash-partitioned AND sorted on src — InMemoryRelation reports its
    // child's outputPartitioning/ordering, so each iteration's
    // sort-merge join reads the adjacency in place and shuffles only the
    // |V|-row rank table. Same recipe as a bucketed fact table: pay the
    // big side's exchange once, iterate on the small side.
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
    val adjDeg = adj
      .withColumn("deg", count(lit(1)).over(w))
      .persist()
    val base = (scale * (100 - dampingPct)) / 100
    var ranks = adjDeg.select(col("src").as("node")).distinct()
      .select(col("node"), lit(scale).as("pr"))
    for (_ <- 1 to iters) {
      ranks = adjDeg.join(ranks, adjDeg("src") === ranks("node"))
        .select(col("dst"), expr("pr div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
        .select(col("dst").as("node"),
          (lit(base) + expr(s"($dampingPct * s) div 100")).as("pr"))
    }
    // all `iters` references to the cached adjacency live inside the ONE
    // returned plan, so releasing after its first action is safe — and
    // closes the per-call CacheManager leak (r17 review)
    CacheLifecycle.releaseAfterFirstAction(adjDeg, ranks)
  }
}

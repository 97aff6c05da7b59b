package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over an undirected edge list — the step that turns
  * near-duplicate PAIRS into duplicate CLUSTERS: near-dup similarity is not
  * transitive (a~b, b~c without a~c), so a correct dedup keeps one doc per
  * connected component of the candidate graph, not per pair.
  *
  * Algorithm: iterative min-label propagation. Each round every node takes
  * the minimum of its own label and its neighbors' labels — one
  * shuffle-join + partial-min aggregation per round, converging in
  * graph-diameter rounds. Dedup graphs are the best case for this: tiny
  * components (near-dup clusters of a handful of docs), so diameter — and
  * the round count — is single-digit regardless of corpus size, and each
  * round shuffles only (node, label) longs, never documents. (For
  * adversarial long-chain graphs the O(log n) large-star/small-star
  * contraction is the upgrade path; for dedup it buys nothing.)
  *
  * The per-round driver `.count()` reads a one-row aggregate (the
  * convergence check), not data.
  */
object Components {

  /** Cuts the Catalyst lineage: re-root the frame on its materialized RDD so
    * the next round plans over a LogicalRDD scan. Without this the labels
    * plan references itself twice per round (self-join via nbrMin) and the
    * optimizer's plan tree grows 2^rounds — OOM by diameter ~6. */
  private def planCut(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(df.rdd, df.schema)

  /** Edge-count threshold below which the component computation runs as
    * a driver-side union-find over the collected edge list — the same
    * size-based escape as a broadcast join. Near-dup edge graphs are
    * tiny relative to the corpus (they are the VERIFIED duplicate pairs),
    * so this path usually wins: one collect of (long, long) pairs and a
    * linear union-find replace diameter-many shuffle rounds. 2 M edges ≈
    * 32 MB on the driver. Above the threshold — boilerplate-heavy crawls
    * can produce billions of pairs — the distributed min-label loop runs
    * unchanged. */
  val DriverUnionFindMaxEdges = 2000000L

  /** @return (node, component) where component = min node id reachable.
    *         Only nodes appearing in `edges` are labeled.
    */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 25,
      driverMaxEdges: Long = DriverUnionFindMaxEdges): DataFrame = {
    // One persisted UNDIRECTED edge list; the size gate is a single
    // bounded limit(threshold+1).collect() job — if it comes back within
    // the threshold it IS the complete edge list, so the driver path
    // needs no separate count() pass (the count+collect sequence was
    // latency-bound under host load: 2.9-6.1 s swings on identical code).
    // Symmetrization happens only on the distributed path, where
    // duplicate directed edges are harmless to the min() aggregate.
    val uniq = edges.select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    // The probe is complete only if it came back UNDER its own limit, so
    // the effective driver-path threshold is capped below Int.MaxValue —
    // a larger configured threshold silently falls through to the
    // distributed loop instead of union-finding a truncated edge list.
    val cap = math.min(driverMaxEdges, (Int.MaxValue - 2).toLong)
    val probe = uniq.limit(cap.toInt + 1).collect()
    if (probe.length <= cap) {
      val pairs = probe.map(r => (r.getLong(0), r.getLong(1)))
      uniq.unpersist(blocking = false)
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var root = x
        while (parent.get(root) != root) root = parent.get(root)
        var cur = x // path compression
        while (cur != root) { val nxt = parent.get(cur); parent.put(cur, root); cur = nxt }
        root
      }
      pairs.foreach { case (u, v) =>
        parent.putIfAbsent(u, u); parent.putIfAbsent(v, v)
        val (ru, rv) = (find(u), find(v))
        if (ru != rv) { if (ru < rv) parent.put(rv, ru) else parent.put(ru, rv) }
      }
      // union-by-min keeps roots minimal, so find(x) IS the min label
      val rows = parent.keySet().iterator()
      val out = Array.newBuilder[(Long, Long)]
      while (rows.hasNext) { val n = rows.next(); out += ((n, find(n))) }
      val spark = edges.sparkSession
      import spark.implicits._
      return out.result().toSeq.toDF("node", "component")
    }

    val sym = uniq.union(uniq.select(col("v").as("u"), col("u").as("v")))

    // cached = materialized (node, component, next) of the latest round;
    // labels = projection over it. persist truncates RDD recomputation,
    // planCut truncates the logical plan — both are needed for iteration.
    var cached = planCut(sym.select(col("u").as("node")).distinct()
        .select(col("node"), col("node").as("component"), col("node").as("next")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    cached.count()
    var labels = cached.select(col("node"), col("component"))

    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("node").as("v"), col("component").as("nlabel")), "v")
        .groupBy(col("u"))
        .agg(min(col("nlabel")).as("nmin"))
        .withColumnRenamed("u", "node")
      val stepped = planCut(labels
          .join(nbrMin, Seq("node"), "left")
          .select(col("node"), col("component"),
            least(col("component"), coalesce(col("nmin"), col("component"))).as("next")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      changed = stepped.where(col("next") < col("component")).count()
      val prev = cached
      cached = stepped
      labels = stepped.select(col("node"), col("next").as("component"))
      prev.unpersist(blocking = false)
      iter += 1
    }
    if (changed > 0)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponents stopped at maxIter=$maxIter with $changed labels " +
          "still changing — a component's diameter exceeds the budget and the " +
          "returned clusters are SPLIT. Raise maxIter.")
    uniq.unpersist(blocking = false)
    // hand back a materialized frame and drop the loop's CacheManager
    // entries: localCheckpoint caches at the RDD level, which the
    // ContextCleaner releases when the result is garbage collected —
    // repeated invocations in one session don't accumulate cache blocks.
    val out = labels.localCheckpoint(true)
    cached.unpersist(blocking = false)
    out
  }
}

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

  /** @return (node, component) where component = min node id reachable.
    *         Only nodes appearing in `edges` are labeled.
    */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .union(edges.select(col(dstCol).cast("long").as("u"), col(srcCol).cast("long").as("v")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

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
    sym.unpersist(blocking = false)
    // hand back a materialized frame and drop the loop's CacheManager
    // entries: localCheckpoint caches at the RDD level, which the
    // ContextCleaner releases when the result is garbage collected —
    // repeated invocations in one session don't accumulate cache blocks.
    val out = labels.localCheckpoint(true)
    cached.unpersist(blocking = false)
    out
  }
}

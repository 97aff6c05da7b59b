package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Layout

/** Data-layout / scan-efficiency queries: Z-order clustering quality and
  * Bloom-prefiltered joins. These target the 100 TB cost model directly —
  * bytes NOT read (file skipping) and rows NOT shuffled (runtime join
  * pruning) dominate everything else at that scale.
  */
object LayoutQueriesImpl {

  /** Z-order clustering: bucket orders on (customer, order-day), assign
    * each row to the file covering its z-value range, and emit the
    * per-file min/max stats on BOTH dimensions — the parquet footer
    * ranges a scan prunes with. With 8-bit dims and a 10-bit file extent
    * every file bounds both columns to ~1/8 of their domain, so a
    * predicate on EITHER column skips ~7/8 of the files; a linear sort
    * gets selectivity on its leading column only. The oracle replays the
    * interleave with the SAME generated bit-op expression
    * ([[Layout.zValueSql]]), so Spark and DuckDB cannot drift. */
  val zorderLayout = Q(
    "q_zorder_layout",
    (s, dir) => {
      val buckets = Tables.orders(s, dir).select(
        (col("o_custkey") % 256).cast("long").as("xb"),
        (datediff(col("o_orderdate"), to_date(lit("1995-01-01"))) % 256)
          .cast("long").as("yb"))
      Layout.zorderFileStats(buckets, "xb", "yb", bits = 8, fileShift = 10)
        .orderBy(col("file_id"))
    },
    Some(s"""WITH b AS (SELECT
        CAST(o_custkey % 256 AS BIGINT) AS xb,
        CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) % 256 AS BIGINT) AS yb
        FROM orders)
      SELECT (${Layout.zValueSql("xb", "yb", 8)} >> 10) AS file_id,
        count(*) AS n_rows,
        min(xb) AS min_x, max(xb) AS max_x,
        min(yb) AS min_y, max(yb) AS max_y
      FROM b GROUP BY 1 ORDER BY file_id"""))

  /** Bloom-prefiltered join: the build side (suppliers of one nation,
    * ~4% selective) becomes a Bloom filter that drops probe rows BEFORE
    * the join — the manual form of Spark's runtime row-level filtering.
    * False negatives are impossible, so the exact join after the filter
    * makes the result byte-identical to the plain join the oracle runs;
    * at 100 TB the probe shuffle carries ~selectivity x |lineitem| rows
    * instead of all of them. Nation 8 rather than 7: the chosen nation
    * must have suppliers at EVERY fixture incl. sf0.001 (nationkey is
    * sparse at 10 suppliers), or the empty-build short-circuit makes the
    * PLANS.md dossier render a plain join with no `might_contain` —
    * exactly the evidence the headline exists to show. */
  val bloomPruneJoin = Q(
    "q_bloom_prune_join",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val sup = Tables.supplier(s, dir)
        .where(col("s_nationkey") === 8)
        .select(col("s_suppkey"))
      Layout.bloomPrefilteredJoin(li, sup, "l_suppkey", "s_suppkey",
          expectedKeys = 10000L)
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("s_suppkey")).as("n_suppliers"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(8,2)"))
            .cast("double").as("sum_price"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag, count(*) AS n,
        count(DISTINCT s_suppkey) AS n_suppliers,
        round(sum(l_quantity), 2) AS sum_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      WHERE s_nationkey = 8
      GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Compaction planning ([[Layout.compactionPlan]]): lineitem sharded 64
    * ways by order-key hash-mod stands in for a small-files directory; the
    * planner packs shards into ~4-shard merge groups and the output pins
    * every group's membership count, row total, and key checksum. The
    * oracle replays the identical running-sum cut. */
  val compaction = Q(
    "q_compaction_plan",
    (s, dir) => {
      val shards = Tables.lineitem(s, dir)
        .select((col("l_orderkey") % 64).as("shard"), col("l_orderkey"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("rows"), sum(col("l_orderkey")).as("key_sum"))
      Layout.compactionPlan(shards, "shard", "rows", targetRows = 4000L)
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n_shards"), sum(col("rows")).as("rows"),
          sum(col("key_sum")).as("key_checksum"))
        .orderBy(col("grp"))
    },
    Some("""WITH sh AS (SELECT l_orderkey % 64 AS shard,
          CAST(count(*) AS BIGINT) AS rows,
          CAST(sum(l_orderkey) AS BIGINT) AS key_sum
        FROM lineitem GROUP BY shard),
      pl AS (SELECT shard, rows, key_sum,
          CAST(coalesce(sum(rows) OVER (ORDER BY rows DESC, shard
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            // 4000 AS grp
        FROM sh)
      SELECT grp, CAST(count(*) AS BIGINT) AS n_shards,
        CAST(sum(rows) AS BIGINT) AS rows,
        CAST(sum(key_sum) AS BIGINT) AS key_checksum
      FROM pl GROUP BY grp ORDER BY grp"""))

  def all: Seq[Q] = Seq(zorderLayout, bloomPruneJoin, compaction)
}

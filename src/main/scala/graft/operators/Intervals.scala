package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval coalescing and dominance frontiers — the gaps-and-islands
  * family. Complements [[Joins.intervalOverlapSelfJoin]] (which pairs
  * overlapping intervals) with the UNION view: collapse each key's
  * overlapping intervals into maximal disjoint spans.
  *
  * Both operators are pure window/aggregate compositions: ONE shuffle on
  * the grouping key, then partition-local sorts — no self-joins, so cost
  * is O(n log n/p) per partition and the plan scales with the number of
  * keys, not the square of per-key interval counts. Arithmetic is all
  * integer comparisons/max, so any engine replays the result bit-for-bit.
  */
object Intervals {

  /** Merge a key's overlapping-or-touching intervals `[start, end)` into
    * maximal disjoint spans (the coverage view of a validity table:
    * contract periods, session windows, file byte-ranges). Classic
    * gaps-and-islands: sort a key's intervals by (start, end), a new
    * island begins where `start` exceeds the running max of all PREVIOUS
    * ends (exclusive frame — the current row must not see its own end),
    * island id = running count of starts. Ties on `start` need no
    * tie-break: equal-start intervals always overlap, so their relative
    * order cannot open an island.
    *
    * At 100 TB the single shuffle partitions by `keyCol`; per-key state
    * is one sort — no join, no explode, skew bounded by the largest
    * single key's interval count.
    *
    * @param startCol,endCol integral columns (epoch days/seconds/micros)
    * @return one row per merged span: key, span_start, span_end, n_merged
    */
  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val byStart = Window.partitionBy(col(keyCol)).orderBy(col(startCol), col(endCol))
    val prevMax = byStart.rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(keyCol), col(startCol).as("s"), col(endCol).as("e"))
      .withColumn("new_island",
        when(col("s") > coalesce(max(col("e")).over(prevMax), col("s") - 1), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(
        byStart.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("island"))
      .agg(min(col("s")).as("span_start"), max(col("e")).as("span_end"),
        count(lit(1)).as("n_merged"))
      .drop("island")
  }

  /** 2-D skyline (Pareto frontier), maximizing BOTH `xCol` and `yCol`
    * per group: the points no other point dominates (≥ in both
    * dimensions, > in at least one). The classic "best trade-off"
    * query — price vs recency, quality vs length — from the skyline
    * operator literature, expressed as two window passes instead of the
    * naive O(n²) anti-join:
    *
    *  1. per distinct x keep only max y (same x, lower y is dominated);
    *  2. sort x DESC; a survivor is on the frontier iff its y strictly
    *     exceeds the running max y of all strictly-greater x (exclusive
    *     frame; step 1 made x unique, so "previous rows" = "greater x").
    *
    * ONE shuffle on the group key; each group's frontier falls out of a
    * partition-local sort. Comparisons only — no arithmetic on the
    * values — so doubles survive bit-exactly.
    *
    * @return frontier points: group, x, y (x descending within group)
    */
  def skylineMax2d(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val perX = df.groupBy(col(groupCol), col(xCol).as("x"))
      .agg(max(col(yCol)).as("y"))
    val xDesc = Window.partitionBy(col(groupCol)).orderBy(col("x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    perX
      .withColumn("best_prev_y", max(col("y")).over(xDesc))
      .where(col("best_prev_y").isNull || col("y") > col("best_prev_y"))
      .drop("best_prev_y")
  }
}

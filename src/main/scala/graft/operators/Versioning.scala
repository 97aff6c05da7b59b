package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-versioning operators beyond SCD-1 upsert (that one lives in
  * the upsert/merge query): SCD-2 history construction — turn a stack of
  * versioned snapshots into validity intervals per key.
  *
  * A training-data pipeline needs this shape whenever labels/attributes
  * get re-annotated between dataset releases and experiments must be
  * reproducible against "the data as of version N".
  */
object Versioning {

  /** Build SCD-2 history from versioned snapshots: input is the UNION of
    * full snapshots `(key, value, version)`; output keeps one row per
    * (key, change) with `valid_from` = the version that introduced the
    * value and `valid_to` = the version that replaced it (NULL = still
    * current).
    *
    * Plan shape: ONE shuffle on the key (both windows share the same
    * partitioning, so Catalyst plans a single Exchange and two Window
    * operators back to back — no second shuffle). Per-key state is the
    * number of versions, a small constant, so no skew concern at any
    * table size.
    */
  def scd2(snapshots: DataFrame, keyCol: String, valueCol: String,
      versionCol: String): DataFrame = {
    val byVersion = Window.partitionBy(col(keyCol)).orderBy(col(versionCol))
    snapshots
      // __prevV flags the key's first snapshot; the value comparison is
      // null-safe so NULL-valued attributes version correctly too.
      .withColumn("__prev", lag(col(valueCol), 1).over(byVersion))
      .withColumn("__prevV", lag(col(versionCol), 1).over(byVersion))
      .where(col("__prevV").isNull || !(col(valueCol) <=> col("__prev")))
      .withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", lead(col(versionCol), 1).over(byVersion))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__prev", "__prevV", versionCol)
  }

  /** Snapshot diff (CDC between dataset releases): full-outer join two
    * snapshots on the key and classify every key as `inserted` (new side
    * only), `deleted` (old side only), `updated` (both sides, any compare
    * column differs — NULL-safely, so NULL→value and value→NULL count as
    * changes) or `unchanged`. Output: the key, the status, and both
    * sides' compare columns as `old_<c>` / `new_<c>`.
    *
    * This is the release-audit primitive: "what changed between v12 and
    * v13" as a dataset, feeding either a human diff report or a
    * downstream incremental job that processes only `status != unchanged`
    * keys. Plan shape: ONE shuffle on the key for the full-outer
    * SortMergeJoin; the classification is a projection. Keys must be
    * unique per snapshot (it is a keyed diff, not a multiset diff).
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      keyCol: String, compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "snapshotDiff needs at least one compare column")
    val o = oldSnap.select(col(keyCol).as("key") +:
      compareCols.map(c => col(c).as(s"old_$c")): _*)
    val n = newSnap.select(col(keyCol).as("key") +:
      compareCols.map(c => col(c).as(s"new_$c")): _*)
    // presence flags survive the outer join even when every payload
    // column of a side is NULL (a NULL-valued row is still present)
    val j = o.withColumn("__in_old", lit(true))
      .join(n.withColumn("__in_new", lit(true)), Seq("key"), "full_outer")
    val differs = compareCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    j.withColumn("status",
        when(col("__in_old").isNull, "inserted")
          .when(col("__in_new").isNull, "deleted")
          .when(differs, "updated")
          .otherwise("unchanged"))
      .drop("__in_old", "__in_new")
  }
}

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
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation recipes. At 100 TB a zipf-skewed key (one user, one
  * hot document cluster) puts an entire key's rows on ONE reduce task;
  * AQE's skew-join split handles sort-merge joins after the fact, but
  * these rewrites make the plan skew-proof by construction, and — since
  * each rewrite computes exactly the same result as its naive form —
  * they stay inside the driver's DuckDB hash gate.
  */
object Skew {

  /** Salted equi-join: `big ⋈ small` on `key`, with the big side's rows
    * spread over `salts` sub-keys and the small side replicated once per
    * salt. The join key becomes (key, salt), so a hot key's rows land on
    * up to `salts` reducers instead of one. Cost: `salts`× the small side
    * (which is small — that's why it was the broadcast candidate) and one
    * extra tiny column on the big side; benefit: no reducer ever sees more
    * than ~1/salts of a hot key.
    *
    * The salt is a deterministic hash of the big row's full content, so
    * retried tasks re-derive identical salts (no rand() in the lineage).
    * Result is row-identical to the plain join.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int = 16): DataFrame = {
    require(salts > 0, s"salts must be positive: $salts")
    val bigSalted = big.withColumn(
      "__salt", pmod(abs(hash(struct(big.columns.map(col): _*))), lit(salts)))
    val smallRep = small.withColumn(
      "__salt", explode(array((0 until salts).map(lit): _*)))
    bigSalted.join(smallRep, Seq(key, "__salt")).drop("__salt")
  }

  /** Skew-safe exact distinct count: `groupBy(key).agg(countDistinct(v))`
    * materializes every (key, v) pair on the key's single reducer; the
    * two-stage form shuffles on (key, v) — spreading a hot key over as
    * many reducers as it has distinct values — then counts tiny
    * one-row-per-pair partials. Identical result, bounded reducer state.
    */
  def distinctCountTwoStage(
      df: DataFrame,
      key: String,
      valCol: String,
      alias: String): DataFrame =
    // drop NULL values first: COUNT(DISTINCT v) excludes NULLs, and the
    // (key, v) grouping would otherwise count the NULL group as a value
    df.where(col(valCol).isNotNull)
      .groupBy(col(key), col(valCol)).agg(lit(1).as("__one"))
      .groupBy(col(key)).agg(count(lit(1)).as(alias))

  /** Salted two-stage aggregate for algebraic aggregates whose per-key
    * state is NOT reduced map-side (e.g. after an upstream shuffle or
    * inside a distinct-expand): stage 1 groups on (key, salt) so hot-key
    * combining spreads over `salts` reducers; stage 2 merges the ≤ salts
    * partials per key. sum/count merge by sum — callers derive avg as
    * sum/count at the end. Identical result to the one-stage aggregate.
    */
  def saltedSumCount(
      df: DataFrame,
      key: String,
      valCol: Column,
      salts: Int = 16): DataFrame = {
    val salted = df.withColumn(
      "__salt", pmod(abs(hash(struct(df.columns.map(col): _*))), lit(salts)))
    salted.groupBy(col(key), col("__salt"))
      .agg(sum(valCol).as("__psum"), count(valCol).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as("__sum"), sum(col("__pcnt")).as("__cnt"))
  }
}

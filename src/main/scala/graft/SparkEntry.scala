package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Q

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All queries are registered in per-area modules under [[graft.queries]]
  * and assembled here; each carries its own DuckDB oracle SQL when the
  * semantics are ANSI-SQL-expressible (non-expressible ops get the
  * driver's rows-only check).
  */
object SparkEntry {

  private def registered: Seq[Q] =
    graft.queries.Relational.all ++
    graft.queries.MlQueriesImpl.all ++
    graft.queries.TextQueriesImpl.all ++
    graft.queries.DedupQueriesImpl.all ++
    graft.queries.SimilarityQueriesImpl.all ++
    graft.queries.MiscQueriesImpl.all ++
    graft.queries.CurationQueriesImpl.all ++
    graft.queries.JoinQueriesImpl.all ++
    graft.queries.SkewQueriesImpl.all ++
    graft.queries.AnalyticsQueriesImpl.all ++
    graft.queries.SourceQueriesImpl.all ++
    graft.queries.LayoutQueriesImpl.all ++
    graft.queries.RetrievalQueriesImpl.all ++
    graft.queries.GraphQueriesImpl.all ++
    graft.queries.TpchQueriesImpl.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registered.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registered.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}

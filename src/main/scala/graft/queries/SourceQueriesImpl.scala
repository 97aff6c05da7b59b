package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Source/sink coverage beyond parquet: CSV, JSON-lines and ORC, each as
  * a write → read-back → aggregate round-trip whose oracle runs on the
  * ORIGINAL parquet table — a hash-pass proves the format round-trip is
  * lossless for the exercised types (ints, doubles, strings, dates).
  *
  * Reads use explicit schemas (never inferSchema: at 100 TB schema
  * inference is an extra full scan of the data before the real one).
  */
object SourceQueriesImpl {

  private val sinkRoot = "/tmp/graft_sink"

  /** CSV sink+source (header, explicit schema on read). */
  val csvRoundtrip = Q(
    "q_source_csv_roundtrip",
    (s, dir) => {
      val sup = Tables.supplier(s, dir)
      val out = s"$sinkRoot/csv_supplier"
      sup.write.mode("overwrite").option("header", "true").csv(out)
      s.read.option("header", "true").schema(sup.schema).csv(out)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"), round(sum(col("s_acctbal")), 2).as("sum_bal"))
        .orderBy(col("s_nationkey"))
    },
    Some("""SELECT s_nationkey, count(*) AS n, round(sum(s_acctbal), 2) AS sum_bal
      FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey"""))

  /** JSON-lines sink+source (explicit schema — and dates survive). */
  val jsonRoundtrip = Q(
    "q_source_json_roundtrip",
    (s, dir) => {
      val nat = Tables.nation(s, dir)
      val out = s"$sinkRoot/json_nation"
      nat.write.mode("overwrite").json(out)
      s.read.schema(nat.schema).json(out)
        .groupBy(col("n_regionkey"))
        .agg(count(lit(1)).as("n"), min(col("n_name")).as("first_name"))
        .orderBy(col("n_regionkey"))
    },
    Some("""SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""))

  /** ORC sink+source (columnar alternative; predicate pushdown works the
    * same way as parquet). */
  val orcRoundtrip = Q(
    "q_source_orc_roundtrip",
    (s, dir) => {
      val ord = Tables.orders(s, dir)
      val out = s"$sinkRoot/orc_orders"
      ord.write.mode("overwrite").orc(out)
      s.read.orc(out)
        .where(col("o_orderpriority") === "1-URGENT")
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("sum_price"))
        .orderBy(col("o_year"))
    },
    Some("""SELECT year(o_orderdate) AS o_year, count(*) AS n,
      round(sum(o_totalprice), 2) AS sum_price
      FROM orders WHERE o_orderpriority = '1-URGENT'
      GROUP BY 1 ORDER BY o_year"""))

  def all: Seq[Q] = Seq(csvRoundtrip, jsonRoundtrip, orcRoundtrip)
}

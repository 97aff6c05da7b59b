package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Graph

/** Graph-analytics queries over relationship structures DERIVED from the
  * relational tables — the motif/connectivity diagnostics a curation
  * pipeline runs on citation, co-purchase, or hyperlink graphs.
  */
object GraphQueriesImpl {

  /** Per-part triangle participation in the co-purchase graph (parts
    * appearing in the same order are linked): the "frequently bought
    * together" triad strength. Degree-oriented wedge join — see
    * [[graft.operators.Graph.triangleCorners]]; counts are exact
    * integers, so the oracle's direct 3-way join reproduces them
    * bit-for-bit. Top 20 parts by (count, key). */
  val graphTriangles = Q(
    "q_graph_triangles",
    (s, dir) => {
      val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_partkey"))
      val edges = li.alias("x")
        .join(li.alias("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
      Graph.triangleCorners(edges)
        .select(col("node").as("part"), col("n_triangles"))
        .orderBy(col("n_triangles").desc, col("part"))
        .limit(20)
    },
    Some("""WITH e AS (SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
        FROM lineitem l1 JOIN lineitem l2
          ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey),
      t AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM e e1 JOIN e e2 ON e2.a = e1.b
          JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
      n AS (SELECT x AS part FROM t
        UNION ALL SELECT y FROM t UNION ALL SELECT z FROM t)
      SELECT part, count(*) AS n_triangles FROM n
      GROUP BY part ORDER BY n_triangles DESC, part LIMIT 20"""))

  def all: Seq[Q] = Seq(graphTriangles)
}

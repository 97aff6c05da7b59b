package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The remaining TPC-H queries expressible over the driver's fixture schema,
  * run verbatim through `spark.sql()` so the ONE SQL text is also the DuckDB
  * oracle (the check then covers Spark's parser/analyzer/optimizer face, not
  * just the DataFrame API face). Q3/Q5/Q6/Q7/Q10/Q13/Q18 live in
  * [[Relational]]; this module completes the suite with the queries whose
  * plan shapes are not yet exercised there:
  *
  *   - Q1  full pricing summary (the flagship's complete column list)
  *   - Q4  EXISTS -> left-semi rewrite
  *   - Q8  8-table join tower with two aliases of nation + CASE market share
  *   - Q9  LIKE-filtered profit rollup by nation x year
  *   - Q12 CASE-inside-sum two-way priority counts
  *   - Q14 conditional-revenue ratio
  *   - Q15 CTE + scalar-max subquery (the revenue view)
  *   - Q17 correlated scalar-avg subquery per part
  *   - Q19 OR-of-ANDs disjunctive join predicate
  *   - Q21 EXISTS + NOT EXISTS double correlation on one fact table
  *   - Q22 NOT-EXISTS anti join + uncorrelated scalar-avg threshold
  *
  * Schema adaptations (the fixture has no partsupp table and no
  * comment/shipmode/commitdate/receiptdate/phone/container columns; SURVEY
  * §2 notes the driver's tables): Q2/Q11/Q16/Q20 need partsupp, which this
  * module DERIVES from lineitem — `partsupp(ps_partkey, ps_suppkey,
  * ps_availqty=count(*), ps_supplycost=min(price))` over the observed
  * (part, supplier) pairs — so all four plan shapes run (correlated MIN,
  * HAVING vs scalar subquery, NOT IN + count distinct, nested IN with a
  * two-key correlated scalar);
  * Q4/Q21 replace the commit-vs-receipt lateness predicate with
  * l_returnflag = 'R' (same EXISTS shapes, "returned" instead of "late");
  * Q9 drops the ps_supplycost term from profit; Q12 groups by l_linestatus
  * instead of the missing l_shipmode; Q17 substitutes p_size for the missing
  * p_container; Q19 likewise; Q22 derives cntrycode from c_nationkey instead
  * of substring(c_phone) and anti-joins on URGENT orders only (every
  * customer has SOME order in the fixture — the all-orders anti set would be
  * empty, the vacuity flagged on q_anti_join in round-7 ADVICE).
  *
  * Cross-engine float discipline (the 17-sig-digit hash gate): money math in
  * DECIMAL (exact, associative — partial-agg order cannot change the sum),
  * ratios/averages as ONE double division of exact operands (both engines
  * divide the same two bit-identical doubles; a DECIMAL cast-to-double is
  * exact below 2^53), l_quantity is integer-valued so even its double sums
  * are order-independent. Integer CASE sums get CAST(... AS BIGINT) — DuckDB
  * sums INTEGER into HUGEINT, which the driver's type canon rejects.
  *
  * Scale notes (local[32] now, 1000 executors later): every query here is
  * pure Catalyst — dimension sides (part/supplier/customer/nation/region)
  * broadcast below the lineitem probe, date/brand/type predicates reach the
  * parquet scan as PushedFilters, the EXISTS/NOT-EXISTS pairs plan as
  * semi/anti hash joins keyed on l_orderkey (one shuffle of the fact table,
  * shared by Q21's two subqueries under AQE exchange reuse), and every
  * aggregate is partial-aggregable. Nothing in this file collects, loops, or
  * hand-schedules.
  */
object TpchQueriesImpl {
  import graft.Tables

  private def sqlOver(tables: String*)(text: String): (SparkSession, String) => DataFrame =
    (s, dir) => {
      tables.foreach(t => Tables.load(s, dir, t).createOrReplaceTempView(t))
      s.sql(text)
    }

  /** Q1 with the full column list (q1_agg keeps the reference-cited short
    * form). Averages are sum/count with the division done in double on BOTH
    * sides — round(avg) would put a half-cent boundary through two different
    * rounding paths (Spark's exact-DECIMAL HALF_UP vs DuckDB's
    * double-nearest).
    *
    * DECIMAL(8,2), not (18,2) — minimal-precision exactness (r18): every
    * lineitem money/ratio column is < 10⁶ with 2 decimals, so the (8,2)
    * cast is value-identical to (18,2) (both exact; ANSI errors loudly on
    * overflow) while Spark's sum over it stays within MAX_LONG_DIGITS and
    * keeps the compact long-backed aggregation buffer. The (18,2) sums
    * (result precision 28) allocate BigDecimal per update — q1_agg
    * measured 10–40 s (GC-bound, unstable) vs 3.1 s stable at the 100×
    * fixture for the same bit-identical output. The SQL text runs in
    * BOTH engines, so the precision change cannot drift between them. */
  private val q1Sql = """SELECT l_returnflag, l_linestatus,
      CAST(sum(CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) AS sum_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(8,2))) AS DOUBLE) AS sum_base_price,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(8,2))
        * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(8,2))
        * (1 - CAST(l_discount AS DECIMAL(8,2)))
        * (1 + CAST(l_tax AS DECIMAL(8,2)))) AS DOUBLE) AS sum_charge,
      CAST(CAST(sum(CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE)
        / count(*) AS DOUBLE) AS avg_qty,
      CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(8,2))) AS DOUBLE)
        / count(*) AS DOUBLE) AS avg_price,
      CAST(CAST(sum(CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE)
        / count(*) AS DOUBLE) AS avg_disc,
      count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-08-06'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  val sqlQ1 = Q("q_sql_q1", sqlOver("lineitem")(q1Sql), Some(q1Sql))

  /** Q4 (order priority checking): the correlated EXISTS — Catalyst rewrites
    * it to a left-semi hash join on l_orderkey, so the lineitem side reduces
    * to distinct returned orderkeys before touching orders. */
  private val q4Sql = """SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT * FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority"""

  val sqlQ4 = Q("q_sql_q4", sqlOver("orders", "lineitem")(q4Sql), Some(q4Sql))

  /** Q8 (national market share): the deepest join tower in the suite —
    * part, supplier, customer, orders, region and TWO aliases of nation
    * around the lineitem fact. Market share is a ratio of two exact DECIMAL
    * sums, divided once in double. */
  private val q8Sql = """SELECT o_year,
      CAST(CAST(sum(CASE WHEN nation = 'NATION_7' THEN volume ELSE 0 END) AS DOUBLE)
        / CAST(sum(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM (
      SELECT extract(year FROM o_orderdate) AS o_year,
        CAST(l_extendedprice AS DECIMAL(8,2))
          * (1 - CAST(l_discount AS DECIMAL(8,2))) AS volume,
        n2.n_name AS nation
      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
        AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year"""

  val sqlQ8 = Q(
    "q_sql_q8",
    sqlOver("part", "supplier", "lineitem", "orders", "customer", "nation", "region")(q8Sql),
    Some(q8Sql))

  /** Q9 (product-type profit), minus the ps_supplycost term (no partsupp
    * table): revenue by supplier nation x order year for color-matched
    * parts. The LIKE predicate pushes to the part scan; part broadcasts. */
  private val q9Sql = """SELECT nation, o_year,
      CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation, extract(year FROM o_orderdate) AS o_year,
        CAST(l_extendedprice AS DECIMAL(8,2))
          * (1 - CAST(l_discount AS DECIMAL(8,2))) AS amount
      FROM part, supplier, lineitem, orders, nation
      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        AND p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC"""

  val sqlQ9 = Q(
    "q_sql_q9",
    sqlOver("part", "supplier", "lineitem", "orders", "nation")(q9Sql),
    Some(q9Sql))

  /** Q12 (priority classes per line status; the fixture has no l_shipmode).
    * The CASE-inside-sum pair is ONE pass — adding a priority class costs a
    * column, not a scan. BIGINT casts: DuckDB sums INTEGER into HUGEINT. */
  private val q12Sql = """SELECT l_linestatus,
      CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH'
        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT' AND o_orderpriority <> '2-HIGH'
        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    ORDER BY l_linestatus"""

  val sqlQ12 = Q("q_sql_q12", sqlOver("orders", "lineitem")(q12Sql), Some(q12Sql))

  /** Q14 (promo revenue ratio): conditional revenue over total revenue in a
    * one-month ship window. Both sums exact DECIMAL; the 100.0 scaling and
    * the division happen in double on identical operands. */
  private val q14Sql = """SELECT
      CAST(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
          THEN CAST(l_extendedprice AS DECIMAL(8,2))
            * (1 - CAST(l_discount AS DECIMAL(8,2))) ELSE 0 END) AS DOUBLE)
        / CAST(sum(CAST(l_extendedprice AS DECIMAL(8,2))
            * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS DOUBLE)
        AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate < TIMESTAMP '1996-10-01'
    ORDER BY promo_revenue"""

  val sqlQ14 = Q("q_sql_q14", sqlOver("lineitem", "part")(q14Sql), Some(q14Sql))

  /** Q15 (top supplier): the revenue view as a CTE, referenced twice — once
    * as the join input and once under max(). The equality against the max is
    * DECIMAL-exact, so ties (if any) surface identically in both engines;
    * ORDER BY s_suppkey makes multi-row ties deterministic anyway. */
  private val q15Sql = """WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
        sum(CAST(l_extendedprice AS DECIMAL(8,2))
          * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey"""

  val sqlQ15 = Q("q_sql_q15", sqlOver("supplier", "lineitem")(q15Sql), Some(q15Sql))

  /** Q17 (small-quantity-order revenue; p_size stands in for the missing
    * p_container): the correlated scalar-avg subquery — Catalyst
    * de-correlates it into an aggregate-then-join on l_partkey. The
    * threshold is safe cross-engine because l_quantity is integer-valued:
    * its double sum is exact in any order, so avg and 0.2*avg are
    * bit-identical in both engines. */
  private val q17Sql = """SELECT
      CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(8,2))) AS DOUBLE)
        / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND p_brand = 'Brand#23' AND p_size < 15
      AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
    ORDER BY avg_yearly"""

  val sqlQ17 = Q("q_sql_q17", sqlOver("lineitem", "part")(q17Sql), Some(q17Sql))

  /** Q19 (discounted revenue, disjunctive predicate): three brand/size/
    * quantity conjunctions OR'd together. Catalyst factors the common
    * p_partkey = l_partkey out of the disjunction, so this still plans as
    * ONE equi-join with the residual OR as a post-join filter — not a
    * nested-loop. */
  private val q19Sql = """SELECT
      CAST(round(sum(CAST(l_extendedprice AS DECIMAL(8,2))
        * (1 - CAST(l_discount AS DECIMAL(8,2)))), 2) AS DOUBLE) AS revenue
    FROM lineitem, part
    WHERE (p_partkey = l_partkey AND p_brand = 'Brand#12'
        AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_partkey = l_partkey AND p_brand = 'Brand#23'
        AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_partkey = l_partkey AND p_brand = 'Brand#34'
        AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20 AND l_quantity <= 30)
    ORDER BY revenue"""

  val sqlQ19 = Q("q_sql_q19", sqlOver("lineitem", "part")(q19Sql), Some(q19Sql))

  /** Q21 (the waiting-supplier shape, on returns instead of the missing
    * commit/receipt dates): a supplier counted per multi-supplier 'F' order
    * where ITS lineitem was returned and NO other supplier's was — one
    * correlated EXISTS plus one correlated NOT EXISTS against the same fact
    * table, both keyed on l_orderkey (semi + anti hash join over one
    * exchange under AQE reuse). 20× probe: 7.4 s at 12 M lineitem rows,
    * sublinear but three passes over the fact. The petabyte-tier form
    * folds both correlations into ONE grouped pass — per order compute
    * (count_distinct(supplier), count_distinct(supplier) FILTER
    * returned), then a single join back — at the cost of no longer
    * exercising the EXISTS rewrite path this query exists to pin. */
  private val q21Sql = """SELECT s_name, count(*) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT * FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT * FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
      AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100"""

  val sqlQ21 = Q(
    "q_sql_q21",
    sqlOver("supplier", "lineitem", "orders", "nation")(q21Sql),
    Some(q21Sql))

  /** Q22 (global sales opportunity): cntrycode from c_nationkey (no c_phone
    * in the fixture), positive-balance average as an uncorrelated scalar
    * subquery (exact DECIMAL sum, one double division), and NOT EXISTS
    * against URGENT orders — the all-orders anti set is empty in this
    * fixture (round-7 ADVICE's q_anti_join vacuity), so the urgency filter
    * keeps the anti join doing real work. */
  private val q22Sql = """SELECT cntrycode, count(*) AS numcust,
      CAST(round(sum(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS totacctbal
    FROM (
      SELECT c_nationkey AS cntrycode, c_acctbal
      FROM customer
      WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
        AND c_acctbal > (SELECT CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                           / count(*) AS DOUBLE)
                         FROM customer
                         WHERE c_acctbal > 0.00
                           AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
        AND NOT EXISTS (SELECT * FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderpriority = '1-URGENT')
    ) custsale
    GROUP BY cntrycode
    ORDER BY cntrycode"""

  val sqlQ22 = Q("q_sql_q22", sqlOver("customer", "orders")(q22Sql), Some(q22Sql))

  /** The derived supply bridge standing in for the missing partsupp table:
    * one row per OBSERVED (part, supplier) pair in lineitem, with
    * ps_availqty = line count and ps_supplycost = the pair's minimum
    * extended price as exact DECIMAL (min is order-independent, so the
    * derivation is bit-stable under any partial-agg schedule). Queries that
    * reference the CTE twice (Q2's correlated MIN, Q11's HAVING threshold)
    * recompute it — Catalyst inlines CTEs — which is fine here because the
    * bridge is ONE partial-aggregable pass over lineitem; at 100 TB you'd
    * materialize it once as a bucketed table (it is a slowly-changing
    * derived dimension, ~|part|×avg-suppliers rows, far smaller than the
    * fact) and every query below joins it by key without re-scanning the
    * fact. */
  private val psCte = """partsupp AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        count(*) AS ps_availqty,
        min(CAST(l_extendedprice AS DECIMAL(8,2))) AS ps_supplycost
      FROM lineitem GROUP BY l_partkey, l_suppkey)"""

  /** Q2 (minimum-cost supplier): the correlated scalar-MIN subquery over a
    * four-table join, re-correlated on p_partkey — Catalyst de-correlates
    * it into an aggregate of the EUROPE bridge joined back on partkey, so
    * the "min per part" side is one grouped pass, not a per-row loop. The
    * supplycost equality is DECIMAL-exact; the ORDER BY chain ends in
    * (p_partkey, s_name), unique per bridge row, so LIMIT 100 is
    * deterministic cross-engine. p_brand stands in for the missing p_mfgr.
    */
  private val q2Sql = s"""WITH $psCte
    SELECT CAST(s_acctbal AS DOUBLE) AS s_acctbal, s_name, n_name, p_partkey, p_brand
    FROM part, supplier, partsupp, nation, region
    WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
      AND p_size < 15 AND p_type = 'STANDARD'
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
      AND ps_supplycost = (
        SELECT min(ps_supplycost) FROM partsupp, supplier, nation, region
        WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100"""

  val sqlQ2 = Q(
    "q_sql_q2",
    sqlOver("part", "supplier", "lineitem", "nation", "region")(q2Sql),
    Some(q2Sql))

  /** Q11 (important stock identification): GROUP BY + HAVING against an
    * uncorrelated scalar subquery computing the same aggregate over the
    * same input — under AQE the nation-filtered bridge join's exchange is
    * reusable between the two sides. Both sides of the threshold compare
    * as ONE double cast of exact DECIMAL sums times a double literal, so
    * the cut is bit-identical cross-engine (a DECIMAL*DECIMAL(4,4) form
    * would overflow precision 38 and round differently per engine). */
  private val q11Sql = s"""WITH $psCte
    SELECT ps_partkey, CAST(sum(ps_supplycost * ps_availqty) AS DOUBLE) AS stock_value
    FROM partsupp, supplier, nation
    WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
    GROUP BY ps_partkey
    HAVING CAST(sum(ps_supplycost * ps_availqty) AS DOUBLE) > (
      SELECT CAST(sum(ps_supplycost * ps_availqty) AS DOUBLE) * CAST(0.0001 AS DOUBLE)
      FROM partsupp, supplier, nation
      WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_3')
    ORDER BY stock_value DESC, ps_partkey"""

  val sqlQ11 = Q(
    "q_sql_q11",
    sqlOver("supplier", "lineitem", "nation")(q11Sql),
    Some(q11Sql))

  /** Q16 (parts/supplier relationship): count(DISTINCT) per three-column
    * group plus a NOT IN subquery — s_suppkey is non-nullable, so the
    * null-aware anti join degenerates to a plain anti hash join (the
    * excluded-supplier side broadcasts). Negative balance stands in for
    * the missing s_comment complaint filter. */
  private val q16Sql = s"""WITH $psCte
    SELECT p_brand, p_type, p_size, CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp, part
    WHERE p_partkey = ps_partkey
      AND p_brand <> 'Brand#5' AND p_type NOT LIKE 'MEDIUM%'
      AND p_size IN (1, 4, 7, 10, 14, 19, 23, 36, 45, 49)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""

  val sqlQ16 = Q(
    "q_sql_q16",
    sqlOver("supplier", "lineitem", "part")(q16Sql),
    Some(q16Sql))

  /** Q20 (potential part promotion): the nested-IN tower — suppliers IN
    * (bridge rows whose part is IN the name-filtered part set AND whose
    * availqty beats a TWO-key correlated scalar count over lineitem).
    * Catalyst de-correlates the inner scalar into a grouped count joined
    * on (partkey, suppkey); both IN subqueries become left-semi hash
    * joins. 0.5 * count is exact (DECIMAL(1,1) × BIGINT), so the
    * threshold comparison is exact on both engines. */
  private val q20Sql = s"""WITH $psCte
    SELECT s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
    FROM supplier, nation
    WHERE s_suppkey IN (
        SELECT ps_suppkey FROM partsupp
        WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
          AND ps_availqty > (
            SELECT 0.5 * count(*) FROM lineitem
            WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'))
      AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
    ORDER BY s_name"""

  val sqlQ20 = Q(
    "q_sql_q20",
    sqlOver("supplier", "lineitem", "part", "nation")(q20Sql),
    Some(q20Sql))

  def all: Seq[Q] = Seq(sqlQ1, sqlQ2, sqlQ4, sqlQ8, sqlQ9, sqlQ11, sqlQ12,
    sqlQ14, sqlQ15, sqlQ16, sqlQ17, sqlQ19, sqlQ20, sqlQ21, sqlQ22)
}

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

  // per-JVM: every sink query clears-then-rewrites its output dir, so a
  // shared fixed path let two concurrent bench JVMs race delete-vs-read
  // (the round-10 100× run died resolving an emptied part-*.jsonl glob)
  private lazy val sinkRoot = graft.Staging.jvmDir("sink")

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

  /** Schema evolution: two dataset versions land under one root — v1
    * without `o_orderpriority`, v2 with it — and a single
    * `mergeSchema=true` read reconciles them (v1 rows surface NULL for
    * the added column). The shape every long-lived 100 TB dataset hits
    * when a column is added mid-history; the merged read stays one scan,
    * schema reconciliation is footer-only work. The aggregate uses
    * count + an integral sum so the oracle compare is exact. */
  val schemaMerge = Q(
    "q_source_schema_merge",
    (s, dir) => {
      val ord = Tables.orders(s, dir)
      val out = s"$sinkRoot/schema_merge_orders"
      ord.where(year(col("o_orderdate")) < 1996)
        .select(col("o_orderkey"), col("o_orderdate"))
        .write.mode("overwrite").parquet(s"$out/v=1")
      ord.where(year(col("o_orderdate")) >= 1996)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .write.mode("overwrite").parquet(s"$out/v=2")
      s.read.option("mergeSchema", "true").parquet(out)
        .groupBy(col("o_orderpriority").as("prio"))
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("sum_keys"))
        .orderBy(col("prio").asc_nulls_first)
    },
    Some("""SELECT CASE WHEN year(o_orderdate) >= 1996 THEN o_orderpriority END AS prio,
        count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS sum_keys
      FROM orders GROUP BY 1 ORDER BY prio NULLS FIRST"""))

  /** Hive-style partitioned layout: write orders partitioned by year,
    * read back with a year predicate — the scan lists ONLY the matching
    * partition directories (partition pruning, visible as
    * PartitionFilters in the plan; PlanSpec asserts it). At 100 TB,
    * partitioning on the dominant filter column is the first lever:
    * pruning happens at file-listing time, before any I/O. */
  val partitionedPrune = Q(
    "q_partitioned_prune",
    (s, dir) => {
      val out = s"$sinkRoot/orders_by_year"
      val ord = Tables.orders(s, dir).withColumn("o_year", year(col("o_orderdate")))
      ord.write.mode("overwrite").partitionBy("o_year").parquet(out)
      // explicit schema (incl. the partition column): an empty write
      // commits no partition dirs, which breaks schema/partition inference
      s.read.schema(ord.schema).parquet(out)
        .where(col("o_year") === 1997)
        .groupBy(month(col("o_orderdate")).as("o_month"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("sum_price"))
        .orderBy(col("o_month"))
    },
    Some("""SELECT month(o_orderdate) AS o_month, count(*) AS n,
      round(sum(o_totalprice), 2) AS sum_price
      FROM orders WHERE year(o_orderdate) = 1997
      GROUP BY 1 ORDER BY o_month"""))

  /** Upsert/merge: apply an updates table onto a base snapshot —
    * update-wins on the key, inserts appended. The dataset-versioning
    * primitive (SCD-1) done as one full-outer join + coalesce: one
    * shuffle on the key, no driver involvement. Updates here are a
    * deterministic derivation (1996+ orders re-priced +10%) so the
    * oracle can rebuild both sides. Money math is exact DECIMAL on
    * BOTH sides with NO rounding step and NO decimal output column:
    * `round(double * 1.1, 2)` sits on half-cent boundaries for ~6% of
    * rows and engines diverge there; even `round(DECIMAL, 2)` ties
    * (~10% of rows after *1.1) are rounding-mode-sensitive across
    * DuckDB versions. So the re-price stays at exact scale 3
    * (DECIMAL(18,2) * DECIMAL(2,1), no round), the sum is exact, and
    * only the FINAL scalar is cast to DOUBLE — a single
    * correctly-rounded conversion of the identical exact value, hence
    * bit-identical in both engines. The output schema carries no
    * decimal128 column (the driver's canon hashed decimal columns
    * asymmetrically in rounds 4-5). */
  val upsertMerge = Q(
    "q_upsert_merge",
    (s, dir) => {
      val ord = Tables.orders(s, dir)
      val base = ord.where(year(col("o_orderdate")) < 1997)
        .select(col("o_orderkey"),
          col("o_totalprice").cast("decimal(18,2)").as("o_totalprice"))
      val updates = ord.where(year(col("o_orderdate")) >= 1996)
        .select(col("o_orderkey"),
          (col("o_totalprice").cast("decimal(18,2)")
            * lit(new java.math.BigDecimal("1.1"))).as("u_price"))
      base.join(updates, Seq("o_orderkey"), "full_outer")
        .select(col("o_orderkey"),
          coalesce(col("u_price"), col("o_totalprice")).as("price"),
          when(col("u_price").isNotNull && col("o_totalprice").isNotNull, "updated")
            .when(col("u_price").isNotNull, "inserted")
            .otherwise("kept").as("action"))
        .groupBy(col("action"))
        .agg(count(lit(1)).as("n"),
          sum(col("price")).cast("double").as("sum_price"))
        .orderBy(col("action"))
    },
    Some("""WITH base AS (
        SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice
        FROM orders WHERE year(o_orderdate) < 1997),
      updates AS (
        SELECT o_orderkey,
          CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(2,1)) AS u_price
        FROM orders WHERE year(o_orderdate) >= 1996),
      merged AS (
        SELECT coalesce(b.o_orderkey, u.o_orderkey) AS o_orderkey,
          coalesce(u.u_price, b.o_totalprice) AS price,
          CASE WHEN u.u_price IS NOT NULL AND b.o_totalprice IS NOT NULL THEN 'updated'
               WHEN u.u_price IS NOT NULL THEN 'inserted'
               ELSE 'kept' END AS action
        FROM base b FULL OUTER JOIN updates u USING (o_orderkey))
      SELECT action, count(*) AS n, CAST(sum(price) AS DOUBLE) AS sum_price
      FROM merged GROUP BY action ORDER BY action"""))

  /** Custom DataSource V2 source ([[graft.sources.SynthSource]]):
    * deterministic generated corpus, planned as parallel range
    * partitions with column pruning in the connector. The generation
    * rule is integer arithmetic on the row id, so DuckDB replays it from
    * `range(n)` — the source is correctness-gated like any operator. */
  val customSource = Q(
    "q_source_custom",
    (s, dir) => {
      s.read.format("graft-synth")
        .option("rows", 60000).option("partitions", 8).load()
        // the id-range predicate PUSHES into the source (the clamped
        // generation range shows in the scan's explain description);
        // SynthSourceSpec pins that pushed rows are never generated
        .where(col("id") >= 10000 && col("id") < 50000)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          // sum the exact integer numerators (val = k/1e6), divide once:
          // summing 3750 doubles drifts a ulp and flips round(.,4)
          round(sum(expr("(id * 2654435761) % 1000000")) / 1e6, 4).as("sum_val"),
          min(col("text")).as("first_text"))
        .orderBy(col("bucket"))
    },
    Some("""SELECT CAST(id % 16 AS INT) AS bucket, count(*) AS n,
      round(sum((id * 2654435761) % 1000000) / 1e6, 4) AS sum_val,
      min('tok' || CAST(id % 101 AS VARCHAR) || ' tok' || CAST(id % 97 AS VARCHAR)
          || ' tok' || CAST(id % 89 AS VARCHAR)) AS first_text
      FROM range(10000, 50000) t(id) GROUP BY 1 ORDER BY bucket"""))

  /** LIBSVM sink+source — the reference's external-storage interchange
    * format (C5) through Spark's built-in `format("libsvm")`. Sparse
    * round-trip is lossless here: labels are always written and the two
    * features are strictly positive, so nothing is dropped as a sparse
    * zero. */
  val libsvmRoundtrip = Q(
    "q_source_libsvm_roundtrip",
    (s, dir) => {
      import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
      val out = s"$sinkRoot/libsvm_lineitem"
      Tables.lineitem(s, dir)
        .select(col("l_discount").as("label"),
          array_to_vector(array(col("l_extendedprice"), col("l_quantity")))
            .as("features"))
        .write.mode("overwrite").format("libsvm").save(out)
      s.read.format("libsvm").option("numFeatures", "2").load(out)
        .select(col("label"), vector_to_array(col("features")).as("f"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("label")), 2).as("sum_label"),
          round(sum(element_at(col("f"), 1)), 2).as("sum_price"),
          round(sum(element_at(col("f"), 2)), 2).as("sum_qty"))
    },
    Some("""SELECT count(*) AS n,
      round(sum(l_discount), 2) AS sum_label,
      round(sum(l_extendedprice), 2) AS sum_price,
      round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem"""))

  /** SCD-2 history build ([[graft.operators.Versioning.scd2]]): two
    * dataset versions of order priority (v2 re-prioritizes 1996+ orders)
    * become validity intervals per key — `valid_from`/`valid_to`/
    * `is_current`. The complement of upsert/merge (SCD-1): instead of
    * update-wins, every historical value stays queryable "as of" its
    * version. One shuffle on the key; the oracle replays the lag/lead
    * construction in SQL. */
  val scd2History = Q(
    "q_scd2_history",
    (s, dir) => {
      val ord = Tables.orders(s, dir)
      val v1 = ord.select(col("o_orderkey"),
        col("o_orderpriority").as("prio"), lit(1).as("version"))
      val v2 = ord.select(col("o_orderkey"),
        when(year(col("o_orderdate")) >= 1996, lit("1-URGENT"))
          .otherwise(col("o_orderpriority")).as("prio"),
        lit(2).as("version"))
      graft.operators.Versioning.scd2(
          v1.unionByName(v2), "o_orderkey", "prio", "version")
        .groupBy(col("prio"), col("valid_from"), col("valid_to"), col("is_current"))
        .agg(count(lit(1)).as("n"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy(col("prio"), col("valid_from"),
          col("valid_to").asc_nulls_first)
    },
    Some("""WITH v1 AS (SELECT o_orderkey, o_orderpriority AS prio, 1 AS version FROM orders),
      v2 AS (SELECT o_orderkey,
          CASE WHEN year(o_orderdate) >= 1996 THEN '1-URGENT' ELSE o_orderpriority END AS prio,
          2 AS version FROM orders),
      u AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2),
      ch AS (SELECT *, lag(prio) OVER w AS prev, lag(version) OVER w AS prev_v
             FROM u WINDOW w AS (PARTITION BY o_orderkey ORDER BY version)),
      f AS (SELECT o_orderkey, prio, version AS valid_from FROM ch
            WHERE prev_v IS NULL OR prio IS DISTINCT FROM prev),
      h AS (SELECT *, lead(valid_from) OVER (PARTITION BY o_orderkey
              ORDER BY valid_from) AS valid_to FROM f)
      SELECT prio, valid_from, valid_to, valid_to IS NULL AS is_current,
        count(*) AS n, min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      FROM h GROUP BY 1, 2, 3, 4
      ORDER BY prio, valid_from, valid_to NULLS FIRST"""))

  /** Snapshot diff ([[graft.operators.Versioning.snapshotDiff]]) between
    * two derived releases of orders: keys `% 97 = 0` deleted, `% 13 = 0`
    * price-bumped (+5.00 DECIMAL — exact addition, no rounding anywhere),
    * `% 17 = 0` re-prioritized, `% 89 = 0` re-keyed negative as inserts.
    * The release-audit primitive: per-status counts, key bounds, and
    * both sides' exact DECIMAL price totals (doubles only in the final
    * rounded columns; `deleted`'s new-side sum is NULL on both engines).
    * One full-outer SortMergeJoin on the key — the 100 TB diff costs one
    * shuffle of each snapshot. */
  val snapshotDiff = Q(
    "q_snapshot_diff",
    (s, dir) => {
      val base = Tables.orders(s, dir).select(col("o_orderkey").as("key"),
        col("o_totalprice").cast("decimal(18,2)").as("price"),
        col("o_orderpriority").as("prio"))
      val vNew = base.where(pmod(col("key"), lit(97)) =!= 0)
        .select(col("key"),
          when(pmod(col("key"), lit(13)) === 0,
            col("price") + lit(5).cast("decimal(18,2)"))
            .otherwise(col("price")).as("price"),
          when(pmod(col("key"), lit(17)) === 0, lit("5-LOW"))
            .otherwise(col("prio")).as("prio"))
        .unionByName(base.where(pmod(col("key"), lit(89)) === 0)
          .select((-col("key")).as("key"), col("price"), col("prio")))
      graft.operators.Versioning.snapshotDiff(base, vNew, "key",
          Seq("price", "prio"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n"),
          min(col("key")).as("min_key"), max(col("key")).as("max_key"),
          round(sum(col("old_price")).cast("double"), 2).as("sum_old"),
          round(sum(col("new_price")).cast("double"), 2).as("sum_new"))
        .orderBy(col("status"))
    },
    Some("""WITH o AS (SELECT o_orderkey AS key,
          CAST(o_totalprice AS DECIMAL(18,2)) AS price,
          o_orderpriority AS prio FROM orders),
      nw AS (SELECT key,
            CASE WHEN key % 13 = 0 THEN price + 5 ELSE price END AS price,
            CASE WHEN key % 17 = 0 THEN '5-LOW' ELSE prio END AS prio
          FROM o WHERE key % 97 <> 0
          UNION ALL
          SELECT -key, price, prio FROM o WHERE key % 89 = 0),
      j AS (SELECT coalesce(o.key, nw.key) AS key,
            o.price AS old_price, nw.price AS new_price,
            o.prio AS old_prio, nw.prio AS new_prio,
            o.key IS NOT NULL AS in_old, nw.key IS NOT NULL AS in_new
          FROM o FULL OUTER JOIN nw ON o.key = nw.key),
      c AS (SELECT key, old_price, new_price,
            CASE WHEN NOT in_old THEN 'inserted'
                 WHEN NOT in_new THEN 'deleted'
                 WHEN old_price IS DISTINCT FROM new_price
                   OR old_prio IS DISTINCT FROM new_prio THEN 'updated'
                 ELSE 'unchanged' END AS status
          FROM j)
      SELECT status, CAST(count(*) AS BIGINT) AS n,
        min(key) AS min_key, max(key) AS max_key,
        round(CAST(sum(old_price) AS DOUBLE), 2) AS sum_old,
        round(CAST(sum(new_price) AS DOUBLE), 2) AS sum_new
      FROM c GROUP BY status ORDER BY status"""))

  /** Data-quality constraint checks ([[graft.operators.Constraints]]):
    * the Deequ-style validation pass before a dataset drop is trusted.
    * All conditional-count checks over orders compile into ONE scan; the
    * uniqueness check is one grouped pass; referential integrity is a
    * left-anti join against customer. The oracle replays every check as
    * SQL counts. */
  val qualityConstraints = Q(
    "q_quality_constraints",
    (s, dir) => {
      import graft.operators.Constraints
      val ord = Tables.orders(s, dir)
      val checks = Seq(
        Constraints.notNull("o_orderkey"),
        Constraints.atLeast("o_totalprice", 0.0),
        Constraints.isIn("o_orderpriority", Seq(
          "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")))
      Constraints.evaluate(ord, checks, uniqueKey = Some("o_orderkey"))
        .unionByName(Constraints.referential(
          ord, "o_custkey", Tables.customer(s, dir), "c_custkey"))
        .orderBy(col("constraint"))
    },
    Some("""WITH v AS (
        SELECT 'not_null(o_orderkey)' AS "constraint",
          count(*) FILTER (WHERE o_orderkey IS NULL) AS violations FROM orders
        UNION ALL
        SELECT 'min(o_totalprice)>=0.0',
          count(*) FILTER (WHERE o_totalprice < 0.0) FROM orders
        UNION ALL
        SELECT 'in_set(o_orderpriority)',
          count(*) FILTER (WHERE o_orderpriority NOT IN
            ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')) FROM orders
        UNION ALL
        SELECT 'unique(o_orderkey)',
          (SELECT count(*) FROM
            (SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1))
        UNION ALL
        SELECT 'ref(o_custkey->c_custkey)',
          (SELECT count(*) FROM orders o WHERE NOT EXISTS
            (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)))
      SELECT "constraint", CAST(violations AS BIGINT) AS violations,
        violations = 0 AS passed
      FROM v ORDER BY "constraint""""))

  /** Distribution-drift detection ([[graft.operators.Constraints
    * .histogramDrift]]) between two dataset versions (pre-1997 vs 1997+
    * orders stand in for release N and N+1): per-price-bin chi-square
    * contributions against the pooled expectation. Chi-square, not PSI:
    * rational arithmetic only, so the oracle replay is bit-exact (PSI's
    * ln is math-library-dependent). */
  /** Exact two-sample KS statistic between the pre-1997 and 1997+ order
    * price distributions ([[graft.operators.Constraints.ksStatistic]]) —
    * the binning-free companion to the chi-square screen below: no bin
    * width to defend, integer cumsums with one division pair per
    * distinct price level, windows over LEVELS only. */
  val ksDrift = Q(
    "q_ks_drift",
    (s, dir) => {
      val ord = Tables.orders(s, dir).where(col("o_totalprice").isNotNull)
      graft.operators.Constraints.ksStatistic(ord,
        col("o_totalprice"), year(col("o_orderdate")) < 1997)
    },
    Some("""WITH b AS (SELECT o_totalprice AS v,
          CASE WHEN year(o_orderdate) < 1997 THEN 1 ELSE 0 END AS a
        FROM orders WHERE o_totalprice IS NOT NULL),
      lv AS (SELECT v, CAST(sum(a) AS BIGINT) AS ca,
          CAST(sum(1 - a) AS BIGINT) AS cb FROM b GROUP BY v),
      c AS (SELECT v,
          CAST(sum(ca) OVER (ORDER BY v) AS BIGINT) AS cuma,
          CAST(sum(cb) OVER (ORDER BY v) AS BIGINT) AS cumb,
          CAST(sum(ca) OVER () AS BIGINT) AS ta,
          CAST(sum(cb) OVER () AS BIGINT) AS tb
        FROM lv)
      SELECT max(ta) AS n_a, max(tb) AS n_b,
        round(max(abs(CAST(cuma AS DOUBLE) / ta - CAST(cumb AS DOUBLE) / tb)), 6) AS ks
      FROM c"""))

  val driftDetect = Q(
    "q_drift_detect",
    (s, dir) => {
      val ord = Tables.orders(s, dir)
      graft.operators.Constraints.histogramDrift(
          ord.where(year(col("o_orderdate")) < 1997),
          ord.where(year(col("o_orderdate")) >= 1997),
          "o_totalprice", binWidth = 50000.0, nBins = 10)
        .select(col("bin"), col("n_ref"), col("n_cur"),
          round(col("chi2"), 4).as("chi2"))
        .orderBy(col("bin"))
    },
    Some("""WITH r AS (SELECT greatest(least(CAST(floor(o_totalprice / 50000.0) AS BIGINT), 9), 0) AS bin,
          count(*) AS n_ref FROM orders
          WHERE year(o_orderdate) < 1997 AND o_totalprice IS NOT NULL GROUP BY 1),
      c AS (SELECT greatest(least(CAST(floor(o_totalprice / 50000.0) AS BIGINT), 9), 0) AS bin,
          count(*) AS n_cur FROM orders
          WHERE year(o_orderdate) >= 1997 AND o_totalprice IS NOT NULL GROUP BY 1),
      j AS (SELECT COALESCE(r.bin, c.bin) AS bin,
          COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur
        FROM r FULL OUTER JOIN c ON r.bin = c.bin),
      t AS (SELECT CAST(sum(n_ref) AS BIGINT) AS t_ref,
          CAST(sum(n_cur) AS BIGINT) AS t_cur FROM j)
      SELECT bin, n_ref, n_cur,
        round(((n_ref - (n_ref + n_cur) * t_ref / (t_ref + t_cur))
             * (n_ref - (n_ref + n_cur) * t_ref / (t_ref + t_cur)))
             / ((n_ref + n_cur) * t_ref / (t_ref + t_cur))
            + ((n_cur - (n_ref + n_cur) * t_cur / (t_ref + t_cur))
             * (n_cur - (n_ref + n_cur) * t_cur / (t_ref + t_cur)))
             / ((n_ref + n_cur) * t_cur / (t_ref + t_cur)), 4) AS chi2
      FROM j, t ORDER BY bin"""))

  /** Custom DSv2 WRITE connector round-trip
    * ([[graft.sources.GraftSink]]): supplier flows through the two-phase
    * commit sink (per-task temp files → driver rename-on-commit +
    * manifest), reads back via the JSON source with an explicit schema,
    * and must aggregate identically to the original parquet. */
  val sinkCustomWrite = Q(
    "q_sink_custom_write",
    (s, dir) => {
      val sup = Tables.supplier(s, dir)
        .select(col("s_suppkey"), col("s_nationkey"), col("s_name"),
          col("s_acctbal"))
      val out = s"$sinkRoot/graft_sink_supplier"
      // the connector is append-only by design; overwrite = clear first
      def del(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(del)
        f.delete()
      }
      del(new java.io.File(out))
      new java.io.File(out).mkdirs()
      sup.write.format("graft-sink").option("path", out).mode("append").save()
      s.read.schema(sup.schema).json(s"$out/part-*.jsonl")
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("s_acctbal")), 2).as("sum_bal"),
          min(col("s_name")).as("first_name"))
        .orderBy(col("s_nationkey"))
    },
    Some("""SELECT s_nationkey, count(*) AS n,
        round(sum(s_acctbal), 2) AS sum_bal, min(s_name) AS first_name
      FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey"""))

  def all: Seq[Q] = Seq(csvRoundtrip, jsonRoundtrip, orcRoundtrip,
    partitionedPrune, upsertMerge, customSource, libsvmRoundtrip, schemaMerge,
    scd2History, snapshotDiff, qualityConstraints, driftDetect, ksDrift,
    sinkCustomWrite)
}

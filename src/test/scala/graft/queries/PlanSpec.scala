package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkEntry

/** Plan-shape regression tests: the properties that make these queries
  * viable at 100 TB must be visible in the physical plan, not assumed —
  * a filter that silently stops pushing or a projection that stops
  * pruning is a 100× regression the row counts won't catch.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q_s13_filter: both predicates reach the parquet scan") {
    val p = plan("q_s13_filter")
    assert(p.contains("PushedFilters:"), p.take(500))
    assert(p.contains("LessThan(l_shipdate") && p.contains("EqualTo(l_returnflag,R)"),
      "filter must push to the scan:\n" + p.take(800))
  }

  test("q_s13_filter: scan reads only the referenced columns") {
    val p = plan("q_s13_filter")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("l_extendedprice") && !read.contains("l_comment"),
      s"scan must prune unused columns: $read")
  }

  test("q_partitioned_prune: the year predicate prunes partitions at the scan") {
    val p = plan("q_partitioned_prune")
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("o_year"), s"scan must carry a PartitionFilter on o_year: $pf\n${p.take(800)}")
    assert(!pf.trim.endsWith("[]"), s"PartitionFilters must be non-empty: $pf")
  }

  test("q_s6_repartition: column pruning pushes through the repartition") {
    val p = plan("q_s6_repartition")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_returnflag") && !read.contains("l_orderkey"),
      s"only the grouping column should be scanned: $read")
  }

  test("q_s16_create_df: the local side broadcasts (no shuffle join)") {
    val p = plan("q_s16_create_df")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"), "tiny dim must not sort-merge")
  }

  test("q1_agg: partial (map-side) aggregation before the exchange") {
    val p = plan("q1_agg")
    val firstAgg = p.linesIterator.toSeq.reverse.find(_.contains("HashAggregate")).getOrElse("")
    assert(firstAgg.contains("partial_") || p.contains("partial_sum"),
      "expected map-side partial aggregation:\n" + p.take(800))
  }

  test("q_dedup_exact: shuffle key is the digest, not the text") {
    // q_dedup_exact OUTPUTS fp = md5(text) (the oracle hashes the hex
    // string), so its shuffle key is the 32-char hex digest by contract.
    // The INTERNAL class key — what ExactDeduper/textClasses shuffle —
    // is the 16-byte BinaryType classDigest; CollapsePlanSpec pins that
    // key's type and width. Here: digests below the exchange, never text.
    val p = plan("q_dedup_exact")
    val hashArgs = p.linesIterator
      .filter(l => l.contains("Arguments: hashpartitioning")).toSeq
    assert(hashArgs.nonEmpty, p.take(800))
    // the shuffle key is the map-side-computed digest (Catalyst names it
    // _groupingexpression); the raw text column must not be a shuffle key
    assert(hashArgs.forall(e => !e.contains("text#")),
      s"dedup must shuffle digests, not documents: $hashArgs")
    assert(p.contains("md5("), "digest must be computed below the exchange")
  }

  test("q_bucketed_join: the co-located join reads bucketed scans and runs with " +
      "NO exchange below the join") {
    val df = SparkEntry.queries("q_bucketed_join")(spark, sf)
    df.collect() // materializes the bucketed tables + finalizes AQE
    val planStr = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val joinIdx = planStr.linesIterator.indexWhere(_.contains("SortMergeJoin"))
    assert(joinIdx >= 0, "expected a SortMergeJoin over bucketed tables:\n" + planStr.take(1200))
    val belowJoin = planStr.linesIterator.toSeq.drop(joinIdx)
    assert(!belowJoin.exists(_.contains("Exchange hashpartitioning")),
      "bucketed join must not re-shuffle its inputs:\n" + belowJoin.take(12).mkString("\n"))
    assert(belowJoin.count(_.contains("Bucketed: true")) == 2,
      "both join inputs must be bucketed scans:\n" + belowJoin.take(12).mkString("\n"))
    // NB: Spark 3.1+ always re-sorts bucketed inputs before SMJ (scan
    // ordering is behind spark.sql.legacy.bucketedTableScanOutputOrdering);
    // sortBy still makes that a cheap sorted-run sort. The eliminated
    // EXCHANGE is the claim that matters at scale.
  }

  test("q_window_rolling: the partition-key filter pushes to the parquet scan") {
    val p = plan("q_window_rolling")
    // formatted explain numbers nodes bottom-up: the Filter's id must be
    // below the first Exchange's — i.e. the filter runs scan-side, so the
    // window shuffle carries only the 1% of customers that survive
    def minId(node: String): Int =
      (node + """ \((\d+)\)""").r.findAllMatchIn(p).map(_.group(1).toInt).minOption.getOrElse(Int.MaxValue)
    assert(minId("Filter") < minId("Exchange"),
      "custkey filter must precede the shuffle:\n" + p.take(1200))
  }

  test("q_zorder_layout: the interleave is pure codegen (no UDF) and one aggregation shuffle") {
    val df = SparkEntry.queries("q_zorder_layout")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("ScalaUDF"), "z-value must be expression-only:\n" + p.take(1000))
    val exchanges = "(?m)Exchange ".r.findAllIn(p).length
    // one partial->final agg exchange + the orderBy's range exchange
    assert(exchanges <= 2, s"expected <=2 exchanges, got $exchanges:\n$p")
    assert(p.contains("partial"), "aggregation must have a map-side partial phase")
  }

  test("q_cube: grouping sets expand before ONE aggregation shuffle") {
    val df = SparkEntry.queries("q_cube")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Expand"), "cube must plan an Expand operator:\n" + p.take(800))
    val aggExchanges = "(?m)Exchange hashpartitioning".r.findAllIn(p).length
    assert(aggExchanges == 1, s"expected 1 hash exchange, got $aggExchanges:\n$p")
  }

  test("q_sim_topk_lsh: the bucket projection runs inside whole-stage codegen " +
      "(native HyperplaneBucket expression, not a boxing UDF)") {
    val df = SparkEntry.queries("q_sim_topk_lsh")(spark, sf)
    df.collect() // finalize the adaptive plan so codegen stages materialize
    // AQE prints "== Final Plan ==" then "== Initial Plan ==" — only the
    // final section reflects what actually ran
    val planStr = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val bucketLines = planStr.linesIterator.filter(_.contains("hyperplanebucket")).toSeq
    assert(bucketLines.nonEmpty, "bucket expression missing from plan:\n" + planStr.take(1500))
    // operators inside a WholeStageCodegen stage print with a *(id) prefix
    assert(bucketLines.forall(_.contains("*(")),
      "bucket computation must sit inside a WholeStageCodegen stage:\n" +
        bucketLines.mkString("\n"))
    assert(!planStr.contains("ScalaUDF"), "no Scala UDF in the LSH path")
  }

  test("q_vocab_oov: the parameter-bounded vocabulary broadcasts; the cut is " +
      "TakeOrderedAndProject, not a global sort") {
    val p = plan("q_vocab_oov")
    assert(p.contains("TakeOrderedAndProject"),
      "vocab cut must be TakeOrderedAndProject:\n" + p.take(1200))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "vocabulary must broadcast to the occurrence side:\n" + p.take(1200))
  }

  test("q_event_funnel: no joins, no window — one grouped pass over events") {
    val p = plan("q_event_funnel")
    assert(!p.contains("Join"), "funnel must not plan any join:\n" + p.take(1200))
    assert(!p.contains("Window"), "funnel must not plan a window:\n" + p.take(1200))
  }

  test("q_feature_binning: the 1-row edge table broadcasts; the fact scan " +
      "shuffles only for the 10-group bin aggregate") {
    val p = plan("q_feature_binning")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "edges must broadcast:\n" + p.take(1200))
    assert(!p.contains("SortMergeJoin"),
      "no shuffle join of the fact table:\n" + p.take(1200))
  }

  test("q_embed_quantize: shuffle-free per-row scan (no exchange except the sort)") {
    val p = plan("q_embed_quantize")
    assert(!p.contains("Exchange hashpartitioning"),
      "quantization must not hash-shuffle:\n" + p.take(1200))
  }

  test("sort-first scan queries keep the heavy projection ABOVE the range " +
      "exchange (one kernel pass, not two)") {
    // With the sort LAST, RangePartitioner's sampling pass executes the
    // entire projection a second time just to read the sort keys —
    // measured 12.7 s vs 1.1 s on q_embed_quantize at the 100× fixture.
    // Pin: the Sort's exchange must sit DIRECTLY over the parquet scan
    // (narrow columns), with every kernel projection above it.
    for (q <- Seq("q_text_tokens", "q_text_quality", "q_text_repetition",
        "q_text_langid", "q_pii_redact", "q_text_fingerprint",
        "q_text_fingerprint_fnv", "q_embed_quantize", "q_embed_project")) {
      val df = SparkEntry.queries(q)(spark, sf)
      val physical = df.queryExecution.executedPlan.toString
      // textual structure: rangepartitioning exchange must appear BELOW
      // (after, in tree print order) every Project node
      val lines = physical.split("\n")
      val exchangeIdx = lines.indexWhere(_.contains("rangepartitioning"))
      val lastProjectIdx = lines.lastIndexWhere(l =>
        l.contains("Project") && !l.contains("ProjectExec"))
      assert(exchangeIdx >= 0, s"$q lost its range sort:\n${physical.take(800)}")
      assert(lastProjectIdx >= 0 && lastProjectIdx < exchangeIdx,
        s"$q has a projection BELOW the range exchange — the sampling " +
          s"pass will execute the kernel twice:\n${physical.take(1200)}")
    }
  }

  test("q_snapshot_diff: keyed full-outer join, never a nested loop") {
    val p = plan("q_snapshot_diff")
    assert(p.contains("FullOuter"), "diff must be a full-outer join:\n" + p.take(1200))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "keyed diff must not plan a nested loop:\n" + p.take(1200))
  }

  test("q_dedup_containment: candidate generation is equi-join only (no cartesian)") {
    val p = plan("q_dedup_containment")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "containment join must stay equi-join shaped:\n" + p.take(1200))
  }

  test("q_graph_pagerank: iterations read the persisted adjacency, not the edge build") {
    val p = plan("q_graph_pagerank")
    val cacheScans = "InMemoryTableScan".r.findAllIn(p).length
    // 3 iterations × adjacency + the degree-seeded rank vector
    assert(cacheScans >= 4, s"expected >= 4 cache scans, got $cacheScans:\n" + p.take(1200))
  }

  test("q_event_transitions: the lag window and the pair aggregation share " +
      "the user-key shuffle (one exchange below the window)") {
    val p = plan("q_event_transitions")
    // the tree section lists operators top-down; the LAG window is the
    // deepest Window, so anchor on the LAST Window line
    val lines = p.linesIterator.takeWhile(!_.startsWith("(")).toSeq
    val winIdx = lines.lastIndexWhere(_.contains("Window"))
    assert(winIdx >= 0, p.take(800))
    val below = lines.drop(winIdx)
    assert(below.count(_.contains("Exchange")) == 1,
      "exactly the user-key exchange may sit below the lag window:\n" + p.take(1500))
  }

  test("q_ntile_spend_scale: no window at all — the 1-row edge table " +
      "broadcasts onto the per-customer side (the ntile API tier's " +
      "single-partition sort never appears in the scale tier)") {
    val p = plan("q_ntile_spend_scale")
    assert(!p.contains("Window"),
      "scale tier must not plan a window:\n" + p.take(1200))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "edges must broadcast:\n" + p.take(1200))
  }

  test("q_winsorize: the percentile bounds broadcast back onto the fact side") {
    val p = plan("q_winsorize")
    assert(p.contains("BroadcastHashJoin"), "bounds must broadcast:\n" + p.take(1200))
    assert(!p.contains("SortMergeJoin"),
      "the tiny bounds table must not sort-merge:\n" + p.take(1200))
  }

  test("q_rolling_active_users: no nested-loop range join — the 7-day fan-out " +
      "is an explode over the reduced (user, day) table") {
    val p = plan("q_rolling_active_users")
    assert(p.contains("Generate explode") || p.contains("Generate"),
      "expected the sequence explode:\n" + p.take(1200))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "rolling distinct must not range-join:\n" + p.take(1200))
  }

  test("q_sql_q21: EXISTS/NOT EXISTS plan as semi + anti hash joins, " +
      "never a nested loop") {
    val p = plan("q_sql_q21")
    assert(p.contains("LeftSemi"), "EXISTS must rewrite to a semi join:\n" + p.take(1200))
    assert(p.contains("LeftAnti"), "NOT EXISTS must rewrite to an anti join:\n" + p.take(1200))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "correlated subqueries must stay hash-join shaped:\n" + p.take(1500))
  }

  test("q_sql_q19: the OR-of-ANDs factors into ONE equi-join with a " +
      "residual filter — no nested loop") {
    val p = plan("q_sql_q19")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      "expected the factored p_partkey equi-join:\n" + p.take(1200))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "the disjunction must not degrade to a nested loop:\n" + p.take(1500))
  }

  test("q_sql_q17: the correlated scalar-avg subquery decorrelates into an " +
      "aggregate-then-join, not a per-row loop") {
    val p = plan("q_sql_q17")
    assert(p.contains("partial_avg") || p.contains("avg("),
      "expected the decorrelated per-part aggregate:\n" + p.take(1200))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "decorrelation must keep hash-join shape:\n" + p.take(1500))
  }

  test("q_sql_q6: all three predicates push to the lineitem scan") {
    val p = plan("q_sql_q6")
    val pushed = p.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("l_shipdate") && pushed.contains("l_discount")
      && pushed.contains("l_quantity"),
      s"Q6 is pure scan bandwidth only if every predicate pushes: $pushed")
  }

  test("q_graph_triangles: candidates come from array_intersect, not a " +
      "materialized wedge join") {
    val p = plan("q_graph_triangles")
    assert(p.contains("array_intersect"),
      "expected the adjacency-intersection form:\n" + p.take(1200))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "triangle counting must stay equi-join shaped:\n" + p.take(1200))
  }

  test("q_mad_outliers: both per-group joins broadcast — the fact table is " +
      "never row-shuffled") {
    val p = plan("q_mad_outliers")
    assert(p.contains("BroadcastHashJoin"), "expected broadcast joins:\n" + p.take(1200))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "the medians/MADs must broadcast back, not shuffle the fact:\n" + p.take(1200))
  }

  test("q_dedup_semantic: in-cell pairs come from an equi-join on the cell id " +
      "— never a cartesian or nested loop") {
    val p = plan("q_dedup_semantic")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "SemDeDup's whole point is the cell-bounded equi-join:\n" + p.take(1500))
  }

  test("q_priority_sample: the top-k cut is TakeOrderedAndProject, not a " +
      "global sort") {
    val p = plan("q_priority_sample")
    assert(p.contains("TakeOrderedAndProject"),
      "expected per-partition top-k heaps:\n" + p.take(1200))
    assert(!p.linesIterator.exists(l => l.contains("Sort ") && !l.contains("TakeOrdered")),
      "a full Sort node means the limit stopped fusing:\n" + p.take(1200))
  }

  test("q_dedup_semantic_incremental: batch-vs-corpus pairs are cell equi-joins; " +
      "verdicts broadcast back") {
    val p = plan("q_dedup_semantic_incremental")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the corpus must never cross-join the batch:\n" + p.take(1500))
  }

  test("q_sim_topk_ivf: the serve plan probes the STAGED index under dynamic " +
      "partition pruning, with no assignment pass over raw corpus vectors") {
    val p = plan("q_sim_topk_ivf")
    assert(p.contains("dynamicpruningexpression"),
      "the cell-partitioned index scan lost its DPP filter — a probe would " +
        "read every cell's files:\n" + p.take(2000))
    // exactly two parquet scans in the MAIN plan: the staged index + the
    // query slice. A third would be a re-assignment pass over raw corpus
    // vectors — the build/serve split's whole point is that serve never
    // pays it. (The DPP subquery section re-lists the query-side scan;
    // that's the pruning filter build, not a corpus pass.)
    val mainPlan = p.split("Subquery:", 2)(0)
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(mainPlan).size
    assert(scans == 2,
      s"expected 2 parquet scans (index + queries), got $scans:\n" + p.take(2000))
  }

  test("q_approx_sketch: distinct aggregate and percentile buffers stay in " +
      "SEPARATE aggregates joined by broadcast") {
    // Mixing countDistinct with TypedImperativeAggregate buffers forces
    // Catalyst's four-phase distinct rewrite, which re-serializes the
    // O(NDV) percentile state at every extra phase boundary (measured
    // 2.6 s combined vs 1.1 s split at sf0.1). The split shape: the
    // Expand (distinct rewrite) side must NOT evaluate percentile, and
    // the two 5-row sides join by broadcast.
    val p = plan("q_approx_sketch")
    assert(p.contains("BroadcastHashJoin"),
      "the two aggregate sides must broadcast-join:\n" + p.take(1500))
    // no aggregate node may carry BOTH the distinct rewrite and a
    // percentile buffer (a single distinct column plans without Expand,
    // but the rewrite's extra phases still reserialize typed buffers)
    val mixed = p.linesIterator.filter(l =>
      l.contains("distinct") && l.contains("percentile"))
    assert(mixed.isEmpty,
      "percentile buffers must not share the distinct aggregate:\n" + mixed.mkString("\n"))
  }

  test("q_table_stats: min/max/count do not ride the 4-NDV Expand") {
    val p = plan("q_table_stats")
    // the Expand (from 4 countDistincts) and the plain-stats aggregate
    // must be separate subtrees — the Expand's aggregate carries no min/max
    val lines = p.linesIterator.toSeq
    val expandArg = lines.find(_.contains("Arguments: [[")) // Expand projections detail
    assert(p.contains("Expand"), "exact 4-column NDV should plan one Expand")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("CartesianProduct"),
      "the NDV row and the plain-stats row must join as two 1-row sides:\n" + p.take(1500))
    val aggWithMin = lines.filter(l => l.contains("HashAggregate") && l.contains("min("))
    assert(aggWithMin.forall(l => !l.contains("distinct")),
      "min/max must aggregate outside the distinct rewrite:\n" + aggWithMin.mkString("\n"))
  }

  test("q_split_leakage_free: the component table broadcasts onto the doc scan") {
    val p = plan("q_split_leakage_free")
    assert(p.contains("BroadcastHashJoin"),
      "the dup-member table must broadcast:\n" + p.take(1200))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "the doc table must never row-shuffle for the split:\n" + p.take(1200))
  }
}

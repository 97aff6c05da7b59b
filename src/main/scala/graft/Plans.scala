package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Writes PLANS.md: the formatted physical plan of each headline query,
  * so the scan-pruning / pushdown / broadcast / partial-agg evidence is
  * reviewable as text (PlanSpec asserts the invariants; this shows them).
  *
  * Usage: sbt "runMain graft.Plans [sfDir] [outFile]"
  */
object Plans {
  private val Headline = Seq(
    "q1_agg"             -> "map-side partial agg, 6-group shuffle",
    "q_s13_filter"       -> "predicate + projection pushdown to parquet",
    "q_partitioned_prune" -> "partition pruning at file listing",
    "q_bucketed_join"    -> "co-located join, no exchange below the join",
    "q_window_rolling"   -> "partition-key filter below the window shuffle",
    "q_cube"             -> "grouping-set Expand before ONE shuffle",
    "q_zorder_layout"    -> "codegen'd Morton interleave, map-side file assignment",
    "q_bloom_prune_join" -> "bloom prefilter on the probe side, then exact join",
    "q_dedup_exact"      -> "digest shuffle (text never moves)",
    "q_decontaminate"    -> "broadcast eval-gram semi-join",
    "q_sim_topk_brute"   -> "broadcast queries, corpus streams",
    "q_embed_project"    -> "shuffle-free per-row projection",
    "q_skew_join"        -> "salted join",
    "q_topk_agg"         -> "bounded-buffer aggregate with map-side partials",
    "q_bm25_topk"        -> "one kernel scan + 1-row totals broadcast + TakeOrderedAndProject (no global sort)",
    "q_dup_gram_coverage" -> "gram df via count window — one gram shuffle, no join-back",
    "q_sessionize_batch" -> "lag + running-sum windows share ONE user-key shuffle",
    "q_dedup_prefix_join" -> "exact-collapse then prefix-filter pair join over representatives",
    "q_vocab_oov"        -> "TakeOrderedAndProject vocab cut, broadcast to the occurrence scan",
    "q_event_funnel"     -> "ONE user-key shuffle, step chaining as array expressions (no joins/windows)",
    "q_embed_quantize"   -> "per-row codes, shuffle-free scan",
    "q_snapshot_diff"    -> "keyed full-outer diff — one shuffle per snapshot, never a nested loop",
    "q_graph_pagerank"   -> "persisted adjacency reused by every bulk-synchronous iteration",
    "q_event_transitions" -> "lag window and pair aggregation share the user-key shuffle",
    "q_winsorize"        -> "percentile bounds broadcast back onto the fact scan",
    "q_rolling_active_users" -> "7-day fan-out as explode over the reduced (user, day) table — no range join",
    "q_sql_q8"           -> "8-table tower: every dimension broadcasts below the lineitem probe",
    "q_sql_q21"          -> "EXISTS/NOT EXISTS as semi + anti hash joins on l_orderkey",
    "q_graph_triangles"  -> "sorted-adjacency array_intersect — the wedge space never materializes",
    "q_dedup_semantic"   -> "pinned-centroid cell assignment per row, in-cell equi-join (never cartesian)",
    "q_priority_sample"  -> "per-row priority arithmetic, TakeOrderedAndProject top-k (no global sort)",
    "q_split_leakage_free" -> "staged component table broadcast onto the doc scan — map-side split",
    "q_chunk_cdc"        -> "one codegen'd kernel pass to chunk; only (doc, fp) rows shuffle",
    "q_rag_context_budget" -> "one kernel scan scores all queries; one window shuffle on qid",
    "q_distinct_ngrams"  -> "(n, gram) shuffle with map-side partials; 3-row output",
    "q_dedup_semantic_incremental" -> "batch-vs-corpus cell equi-join; corpus never self-joins",
    "q_score_auc"        -> "level-based exact AUC — windows over score levels, never rows",
    "q_ks_drift"         -> "level-based exact KS — integer cumsums over value levels",
    "q_label_consistency" -> "index-bounded neighbor screen — candidates are nProbe/nCells of the corpus, ranked by the bounded top-k aggregate (map-side partials, no candidate sort)",
    "q_range_join"       -> "intervals collapse to distinct starts, broadcast onto the point scan — points never shuffle for the join",
    "q_interval_overlap" -> "collapse-first overlap counts: distinct (key,start,multiplicity) rows into the bucket join, C(n,2) within-group — the R² pair relation never materializes",
    "q_approx_sketch"    -> "distinct and typed-buffer aggregates split into two scans + broadcast join — sketch buffers never re-serialize through a distinct-rewrite",
    "q_table_stats"      -> "same split-aggregate shape: exact distincts and typed sketches on separate scans, joined at 1-row granularity",
    "q_pii_redact"       -> "single pii_stats kernel scan — counts and chained redaction in one pass, one String per row",
    "q_multimodal_decode" -> "direct RIFF/ISO-BMFF/imageio decode per partition — binary column streams, zero shuffle before the final sort",
    "q_numeric_corr"     -> "every pairwise moment in ONE map-side-combinable aggregate row",
    "q_ab_welch"         -> "deterministic hash arm split; one grouped moment pass",
    "q_sim_topk_ivf"     -> "staged cell-partitioned index scan under DYNAMIC PARTITION PRUNING — serve never re-assigns corpus vectors",
    "q_ml_train_predict_ext" -> "external-storage fit happens during construction; the served face is the scored scan",
    "q_ml_early_stop"    -> "fit + best-round truncation happen during construction; the served face is the 1-row witness",
    "q_ml_warm_start"    -> "continued fit happens during construction; the served face is the scored scan",
    "q_pipeline_persist" -> "save/load round-trip runs eagerly; the result is the collected 1-row witness (LocalTableScan)",
    "q_stream_semantic_dedup" -> "CDC loop runs eagerly (append-only state deltas); the result face reads the verdict sink")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outFile = args.lift(1).getOrElse("PLANS.md")
    // shared session config (incl. typed-aggregate fallback threshold):
    // GraftSession, pinned by SessionConfigSpec
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of the headline queries\n\n")
    sb.append(s"Generated by `graft.Plans` on `$sfDir`. The properties each plan\n")
    sb.append("must exhibit are asserted in `PlanSpec`; this file makes them\n")
    sb.append("reviewable. Regenerate: `sbt \"runMain graft.Plans\"`.\n")
    // Redact giant binary literals (e.g. the serialized Bloom filter
    // inside might_contain — ~12 KB of hex per occurrence) so the
    // dossier stays reviewable; the length note keeps the evidence that
    // a real filter was inlined.
    val hugeHex = "0x[0-9A-Fa-f]{257,}".r
    def redact(plan: String): String =
      hugeHex.replaceAllIn(plan,
        m => s"0x…<${(m.matched.length - 2) / 2} bytes redacted>")
    Headline.foreach { case (name, why) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      sb.append(s"\n## $name — $why\n\n```\n${redact(plan)}```\n")
    }
    // Collapse tier comparison (VERDICT r16 #2): ONE collapse-first query
    // explained under both tiers, so the adaptive bypass's plan delta is
    // reviewable — `always` carries the digest aggregate + mapping joins
    // (with the ReusedExchange pin), `never` is the identity tier the
    // measured ~all-distinct fixtures actually run (zero mapping
    // shuffles). Output row-identity between the tiers is pinned by
    // CollapseTierQuerySpec over every collapse consumer.
    sb.append("\n# Collapse tier comparison — q_dup_gram_coverage\n")
    // restore (not unset) any caller-set mode afterwards — unsetting
    // clobbered a pre-existing override for the rest of the plans run
    // (ADVICE r17 #5)
    val priorMode = spark.conf.getOption(graft.operators.Dedup.CollapseModeConf)
    try {
      for ((mode, note) <- Seq(
          "always" -> "collapsed tier: ONE fp digest aggregate, ReusedExchange, class mapping joins",
          "never" -> "identity tier (measured duplication < 1.05): mapping gone, doc-level plan")) {
        spark.conf.set(graft.operators.Dedup.CollapseModeConf, mode)
        val df = SparkEntry.queries("q_dup_gram_coverage")(spark, sfDir)
        val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        sb.append(s"\n## collapse.mode=$mode — $note\n\n```\n${redact(plan)}```\n")
      }
    } finally priorMode match {
      case Some(m) => spark.conf.set(graft.operators.Dedup.CollapseModeConf, m)
      case None => spark.conf.unset(graft.operators.Dedup.CollapseModeConf)
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"wrote $outFile (${Headline.size} plans)")
    spark.stop()
  }
}

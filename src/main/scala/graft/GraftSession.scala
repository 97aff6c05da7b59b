package graft

import org.apache.spark.sql.SparkSession

/** The ONE place graft sessions are configured. Every entry point
  * (Bench, Verify, RunOne, Plans) and the test session route through
  * [[builder]] — SessionConfigSpec pins both the routing and the live
  * values, because the failure mode of forgetting a knob here is not
  * wrongness but a silent order-of-magnitude slowdown (see below).
  */
object GraftSession {

  /** ObjectHashAggregate (every TypedImperativeAggregate: bounded top-k,
    * sketches) falls back to SORT-based aggregation once a partition
    * sees this many distinct keys. The stock default (128) turned
    * q_label_consistency's 200k-group bounded-top-k cut into a full
    * sort of its ~5e9 candidate rows at the 100× fixture — a silent 36×
    * slowdown, not an error.
    *
    * Sizing assumption this threshold ENCODES (it is session-global and
    * applies to every ObjectHashAggregate, not just bounded top-k — it
    * removes the sort-fallback memory safety valve for all typed
    * aggregates): hashed buffers must stay ~100 B/group, so 4M groups is
    * ~400 MB worst case per task, ~13 GB across 32 local tasks. The
    * repo's typed buffers fit (top-k holds k≤100 (value,id) pairs; the
    * KLL/CPC sketch buffers are KB-sized but their group counts are
    * small). A future aggregate with BOTH wide buffers AND millions of
    * groups must size its own threshold down — README documents the
    * deployment knob. */
  val FallbackThreshold: Int = 4194304

  /** Shared builder: master + shuffle partitions vary per entry point,
    * everything else is common. Callers may stack more `.config` on the
    * returned builder but must not rebuild from SparkSession.builder()
    * directly (SessionConfigSpec pins this structurally). */
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      // ANSI mode PINNED, not inherited: every oracle row and every
      // kernel-vs-composed parity pin was taken under ANSI semantics
      // (Spark 4's default), and a deployment overriding the default
      // would silently change cast/overflow/divide behavior out from
      // under them. The vector kernels themselves are ANSI-IMMUNE by
      // construction (native expressions, IEEE arithmetic: NaN/Inf
      // propagate, 0/0 → NaN, never an error) — that is their documented
      // special-value contract, and their composed parity references are
      // written ANSI-safe (nullif'd divisors, nanvl before int casts) so
      // KernelFuzzSpec proves the equivalence under THIS mode, not a
      // test-local one. See COVERAGE.md "ANSI & special-value semantics".
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        FallbackThreshold.toString)
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Data-layout operators: multi-dimensional clustering (Z-order) for
  * file skipping, and Bloom-filter runtime join pruning.
  *
  * Both address the same 100 TB problem from different ends: a scan
  * should never read bytes the query can prove irrelevant. Z-ordering
  * makes min/max file statistics selective on MORE THAN ONE column at
  * write time; the Bloom prefilter drops probe-side rows before the
  * join shuffle at read time (the manual form of Spark's runtime
  * row-level filtering, but with an exactness guarantee because the
  * real join runs after it).
  */
object Layout {

  /** The probe predicate as Spark's own codegen'd
    * `BloomFilterMightContain` Catalyst expression — the same expression
    * Spark's runtime row-level filtering injects — over a `Literal` of
    * the filter's serialized byte format (`writeTo`/`readFrom` round-
    * trip; the expression deserializes once per task). A Scala UDF here
    * broke whole-stage codegen in the probe-side scan and paid boxing +
    * null-handling per probed row — pure overhead at 100 TB probe-side
    * row counts. Null keys evaluate to null → WHERE drops them, exactly
    * the plain join's semantics. */
  private def bloomMightContain(filterBytes: Array[Byte], key: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(
          filterBytes, org.apache.spark.sql.types.BinaryType),
        org.apache.spark.sql.graftshim.ColumnBridge.expression(key)))

  /** Z-value (Morton code) of two dimensions, each first bucketed into
    * [0, 2^bits): interleaves the bits so that sorting by the result
    * orders data along a space-filling curve. A file range [min_z,
    * max_z] then bounds BOTH dimensions, so min/max parquet stats prune
    * on either predicate — a linear sort gives selectivity on the
    * leading column only.
    *
    * Built from shiftleft/shiftright/bitwise-and/or only, so the whole
    * thing is one codegen'd expression tree (no UDF) and — deliberately
    * — replayable verbatim in ANSI SQL for the oracle.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of range")
    (0 until bits).map { i =>
      val xb = shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
      val yb = shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xb.bitwiseOR(yb)
    }.reduce(_.bitwiseOR(_))
  }

  /** The matching SQL fragment (DuckDB / ANSI bit operators) for
    * [[zValue]] — generated from the same loop so the two can't drift. */
  def zValueSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"(((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1}))"
    }.mkString("(", " | ", ")")

  /** Cluster a table by the z-order of two bucketed dimensions and report
    * per-file min/max ranges: each row is assigned to the file holding its
    * z-value range (`file_id = zval >> fileShift` — a fixed z-extent per
    * file, the map-side-pure alternative to fixed-row-count files), and
    * each file's min/max on both dimensions is returned — exactly the
    * parquet footer stats a scan would prune with.
    *
    * Deliberately NO global sort/window: the file assignment is computed
    * per-row, so the whole operator is one map + one aggregation shuffle
    * of |files| rows. The 100 TB write-side form is
    * `repartitionByRange($"zval").sortWithinPartitions($"zval")` followed
    * by a partitioned write; this query materializes the clustering
    * QUALITY (how tight each file's per-dimension ranges are) as a
    * checkable result rather than an opaque side effect.
    */
  def zorderFileStats(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int,
      fileShift: Int): DataFrame = {
    val z = zValue(col(xCol), col(yCol), bits)
    df.select(col(xCol), col(yCol))
      .withColumn("file_id", shiftright(z, fileShift).cast("long"))
      .groupBy(col("file_id"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col(xCol)).as("min_x"), max(col(xCol)).as("max_x"),
        min(col(yCol)).as("min_y"), max(col(yCol)).as("max_y"))
  }

  /** Bloom-prefiltered equi-join: build a Bloom filter over the build
    * side's keys (one small aggregation), broadcast it into a filter on
    * the probe side, then run the EXACT join on the survivors. False
    * positives cost nothing but a little shuffle; false negatives are
    * impossible, so the result is byte-identical to the plain join — but
    * the probe side's shuffle carries only ~selectivity × |probe| rows.
    *
    * This is Spark's runtime row-level-filtering / Bloom join rewrite
    * made explicit (and usable when the optimizer's heuristics decline
    * it). At 100 TB with a 1% selective build side it is the difference
    * between shuffling 100 TB and shuffling 1 TB.
    */
  def bloomPrefilteredJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      expectedKeys: Long,
      fpp: Double = 0.01): DataFrame = {
    // The prefilter probes with mightContainLong, so a non-integral key
    // would cast to NULL and silently drop every probe row. Fail loudly
    // instead: the operator's contract is byte-identical to the plain
    // join, and that only holds for integral keys.
    def integral(df: DataFrame, k: String): Boolean =
      df.schema(k).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
    require(integral(probe, probeKey) && integral(build, buildKey),
      s"bloomPrefilteredJoin requires integral join keys; got " +
        s"$probeKey: ${probe.schema(probeKey).dataType.simpleString}, " +
        s"$buildKey: ${build.schema(buildKey).dataType.simpleString}")
    // An EMPTY build side yields an uninitialized BloomFilterImpl (its bit
    // array is null and serialization NPEs) — and the join result is empty
    // regardless, so skip the prefilter. isEmpty is a limit(1) probe on
    // the small side, negligible next to the bloomFilter aggregation.
    if (build.isEmpty) return probe.join(build, col(probeKey) === col(buildKey))
    val bloom = build.stat.bloomFilter(buildKey, expectedKeys, fpp)
    // Ship the filter via its OWN byte format: BloomFilterImpl's Java
    // serialization does not survive the closure/broadcast path (its bit
    // array arrives null), so the literal carries the bytes and the
    // expression deserializes once per task, lazily.
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    probe
      .where(bloomMightContain(bos.toByteArray, col(probeKey).cast("long")))
      .join(build, col(probeKey) === col(buildKey))
  }

  /** Small-files compaction planning — the OPTIMIZE step every 100 TB
    * lake runs: given one row per input shard/file with its row count,
    * assign shards to merge groups of ~`targetRows` each. The policy is
    * SIZE-ORDERED CONTIGUOUS packing: sort shards by (rows desc, id),
    * take the running total, and cut a group boundary each time it
    * crosses a multiple of the target — deterministic, one window over
    * the SHARD table (whose size is the file count, not the row count;
    * the single-partition window is over metadata, by construction tiny),
    * and exactly replayable in SQL, unlike first-fit-decreasing's
    * sequential bin state. Returns the input plus `grp`. */
  def compactionPlan(shards: DataFrame, idCol: String, rowsCol: String,
      targetRows: Long): DataFrame = {
    require(targetRows > 0, s"targetRows must be positive, got $targetRows")
    val w = Window.orderBy(col(rowsCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    shards
      .withColumn("cum_before", coalesce(sum(col(rowsCol)).over(w), lit(0L)))
      .withColumn("grp", expr(s"cum_before div ${targetRows}L"))
      .drop("cum_before")
  }
}

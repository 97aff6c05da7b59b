package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality constraint checks — the validation pass a training
  * pipeline runs before it trusts a new dataset drop (the Deequ/
  * expectations pattern re-expressed as plain aggregations).
  *
  * Every check is a conditional COUNT, so an arbitrary list of checks
  * over one table compiles to a SINGLE scan with map-side partial
  * aggregation — adding a constraint costs one column, not one pass.
  * Cross-table checks (referential integrity) are left-anti joins.
  */
object Constraints {

  /** One named constraint: `violations` must count the BAD rows. */
  final case class Check(name: String, violations: Column)

  /** Not-null constraint. */
  def notNull(c: String): Check =
    Check(s"not_null($c)", count(when(col(c).isNull, 1)))

  /** Range constraint (inclusive lower bound). */
  def atLeast(c: String, lower: Double): Check =
    Check(s"min($c)>=$lower", count(when(col(c) < lower, 1)))

  /** Set-membership constraint. */
  def isIn(c: String, allowed: Seq[String]): Check =
    Check(s"in_set($c)", count(when(!col(c).isin(allowed: _*), 1)))

  /** Uniqueness is not a conditional count — it needs its own grouped
    * pass — so it reports (duplicate keys) separately and unions in. */
  def evaluate(df: DataFrame, checks: Seq[Check],
      uniqueKey: Option[String] = None): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val scan = df.agg(
      checks.head.violations.as(checks.head.name),
      checks.tail.map(c => c.violations.as(c.name)): _*)
    // one row per check: stack the single-row agg into (name, violations).
    // Check names contain dots/parens, so references must be backtick-
    // quoted or col() parses them as nested-field paths.
    val stacked = scan.select(explode(map(
      checks.flatMap(c => Seq(lit(c.name), col(s"`${c.name}`").cast("long"))): _*))
      .as(Seq("constraint", "violations")))
    val withUnique = uniqueKey.fold(stacked) { k =>
      val dups = df.groupBy(col(k)).count().where(col("count") > 1)
        .agg(coalesce(count(lit(1)), lit(0L)).as("violations"))
        .select(lit(s"unique($k)").as("constraint"), col("violations"))
      stacked.unionByName(dups)
    }
    withUnique.withColumn("passed", col("violations") === 0L)
  }

  /** Exact two-sample Kolmogorov–Smirnov statistic in the level-based
    * form (the numeric-distribution cousin of [[histogramDrift]], with
    * no binning choice to defend): rows reduce to distinct VALUE levels
    * with per-sample counts (one map-side-combinable shuffle), then
    * D = max over levels of |cumA/nA − cumB/nB| folds over the tiny
    * level table — the only windows run over levels, never the rows.
    * Arithmetic is integer cumsums with ONE division pair per level, so
    * both engines compute identical doubles. Returns one row:
    * (n_a, n_b, ks). */
  def ksStatistic(df: DataFrame, value: Column, inA: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lv = df.select(value.as("v"), inA.cast("long").as("a"))
      .groupBy(col("v"))
      .agg(sum(col("a")).as("ca"), sum(lit(1L) - col("a")).as("cb"))
    val upto = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val whole = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    lv.select(
        sum(col("ca")).over(upto).as("cuma"), sum(col("cb")).over(upto).as("cumb"),
        sum(col("ca")).over(whole).as("ta"), sum(col("cb")).over(whole).as("tb"))
      .agg(max(col("ta")).as("n_a"), max(col("tb")).as("n_b"),
        // the divide guard must sit INSIDE the aggregate: ANSI mode
        // raises on the per-row division before any outer when() runs
        round(max(when(col("ta") > 0 && col("tb") > 0,
          abs(col("cuma").cast("double") / col("ta")
            - col("cumb").cast("double") / col("tb")))), 6).as("ks"))
  }

  /** Distribution-drift detection between two dataset versions: fixed-
    * width histogram both sides, then the per-bin chi-square contribution
    * `(observed - expected)^2 / expected` against the pooled no-drift
    * expectation. The monitoring check that catches a silently shifted
    * feature before it reaches training.
    *
    * Chi-square instead of the usual PSI/KL deliberately: every term is
    * +,-,*,/ over exact counts (one IEEE rounding per op, same result in
    * any engine), where PSI's `ln` would hang correctness on math-library
    * ulp differences. Plan shape: two scan+group passes (one per side),
    * a full-outer join of ~nBins rows, and a broadcast of the two totals.
    */
  def histogramDrift(ref: DataFrame, cur: DataFrame, valueCol: String,
      binWidth: Double, nBins: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(binWidth > 0 && nBins > 1, s"bad binning: width=$binWidth n=$nBins")
    // A side with no non-NULL values makes t_ref or t_cur 0, and the
    // chi-square expectations divide by them — the result would be
    // NaN/Infinity rows, not a drift verdict. Drift against an empty side
    // is undefined; fail loudly like the module's other guards. The
    // isEmpty probes are limit-1 scans, negligible next to the two
    // full histogram passes.
    require(!ref.where(col(valueCol).isNotNull).isEmpty,
      s"histogramDrift: reference side has no non-NULL '$valueCol' values")
    require(!cur.where(col(valueCol).isNotNull).isEmpty,
      s"histogramDrift: current side has no non-NULL '$valueCol' values")
    // clamp BOTH ends so signed features keep the [0, nBins) contract,
    // and drop NULLs (a histogram over present values, like any profiler)
    def hist(df: DataFrame, n: String) =
      df.where(col(valueCol).isNotNull)
        .groupBy(greatest(least(floor(col(valueCol) / binWidth), lit(nBins - 1)), lit(0))
          .cast("long").as("bin"))
        .agg(count(lit(1)).as(n))
    val j = hist(ref, "n_ref").alias("r")
      .join(hist(cur, "n_cur").alias("c"), col("r.bin") === col("c.bin"), "full_outer")
      .select(coalesce(col("r.bin"), col("c.bin")).as("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    // totals via a global window over the HISTOGRAM (≤ nBins rows, so the
    // single-partition window is free) — an agg + crossJoin would plan
    // the two hist subtrees twice, doubling the input scans
    val w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val t = j.withColumn("t_ref", sum(col("n_ref")).over(w))
      .withColumn("t_cur", sum(col("n_cur")).over(w))
    val eRef = (col("n_ref") + col("n_cur")) * col("t_ref") / (col("t_ref") + col("t_cur"))
    val eCur = (col("n_ref") + col("n_cur")) * col("t_cur") / (col("t_ref") + col("t_cur"))
    t.select(col("bin"), col("n_ref"), col("n_cur"),
      (((col("n_ref") - eRef) * (col("n_ref") - eRef)) / eRef +
        ((col("n_cur") - eCur) * (col("n_cur") - eCur)) / eCur).as("chi2"))
  }

  /** Referential-integrity check: rows of `child` whose `fk` has no match
    * in `parent.pk` (NULL fks are orphans too unless filtered upstream).
    * A broadcast/shuffled left-anti join — one pass over the child. */
  def referential(child: DataFrame, fk: String,
      parent: DataFrame, pk: String): DataFrame = {
    val orphans = child.join(parent, col(fk) === col(pk), "left_anti")
      .agg(coalesce(count(lit(1)), lit(0L)).as("violations"))
    orphans.select(lit(s"ref($fk->$pk)").as("constraint"), col("violations"))
      .withColumn("passed", col("violations") === 0L)
  }
}

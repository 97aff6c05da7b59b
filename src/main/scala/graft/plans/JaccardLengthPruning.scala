package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType}
import graft.functions.KernelExpressions.JaccardSorted

/** Catalyst optimizer rule: derive cheap length bounds from Jaccard
  * threshold predicates.
  *
  * For distinct-element sets, `J(a,b) = |a∩b| / |a∪b| ≤ min(|a|,|b|) /
  * max(|a|,|b|)`, so `jaccard_sorted(a,b) >= t` (t > 0) implies
  * `size(a) >= t*size(b) AND size(b) >= t*size(a)`. Injecting those
  * bounds next to the threshold lets wildly-different-length pairs fail
  * on two array-length reads instead of running the O(|a|+|b|) merge
  * kernel — and, unlike the kernel call, the bounds are ordinary
  * comparisons Catalyst can reorder or push further down on its own.
  * Semantics-preserving: rows pruned by a bound would have been pruned
  * by the threshold (a null array nulls both predicates alike).
  *
  * Registered either via [[GraftExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftExtensions`) or
  * [[JaccardLengthPruning.install]] on a live session. The optimizer
  * runs its batch to fixpoint, so the rule skips filters that already
  * carry the bounds (idempotent).
  */
object JaccardLengthPruning extends Rule[LogicalPlan] {

  private def bounds(js: JaccardSorted, t: Double): Seq[Expression] = {
    def side(x: Expression, y: Expression) =
      GreaterThanOrEqual(
        Cast(Size(x), DoubleType),
        Multiply(Literal(t, DoubleType), Cast(Size(y), DoubleType)))
    Seq(side(js.left, js.right), side(js.right, js.left))
  }

  /** Idempotence guard, robust to later normalization of the injected
    * expressions (e.g. timezone tagging on Cast breaking semanticEquals):
    * the filter counts as already-bounded only when conjuncts read Size
    * of BOTH jaccard arguments — a user's one-sided `size(a) > 5`
    * pre-filter must not suppress the injection. */
  private def hasSizeOf(conjuncts: Seq[Expression], arg: Expression): Boolean =
    conjuncts.exists(_.exists {
      case s: Size => s.child.semanticEquals(arg)
      case _ => false
    })

  private def alreadyBounded(conjuncts: Seq[Expression], js: JaccardSorted): Boolean =
    hasSizeOf(conjuncts, js.left) && hasSizeOf(conjuncts, js.right)

  /** Bounds derivable from the conjuncts of a predicate (empty if none
    * apply or they are already present). */
  private def derive(conjuncts: Seq[Expression]): Seq[Expression] =
    conjuncts.flatMap {
        case GreaterThanOrEqual(js: JaccardSorted, Literal(t: Double, DoubleType))
            if t > 0 && t <= 1 && !alreadyBounded(conjuncts, js) => bounds(js, t)
        case GreaterThan(js: JaccardSorted, Literal(t: Double, DoubleType))
            if t > 0 && t <= 1 && !alreadyBounded(conjuncts, js) => bounds(js, t)
        case LessThanOrEqual(Literal(t: Double, DoubleType), js: JaccardSorted)
            if t > 0 && t <= 1 && !alreadyBounded(conjuncts, js) => bounds(js, t)
        // the verification filters round before comparing
        // (`round(jaccard_sorted(a,b), d) >= t`): round-half-up at scale
        // d means the raw score can sit up to 0.5·10^-d below t, so the
        // bounds hold at the RELAXED threshold t − 10^-d (conservative by
        // another half-ulp) — still a useful prune at d = 4, t >= 0.5.
        // All three comparison spellings the bare kernel supports.
        case GreaterThanOrEqual(r: Round, Literal(t: Double, DoubleType))
            if t > 0 && t <= 1 => roundedBounds(conjuncts, r, t)
        case GreaterThan(r: Round, Literal(t: Double, DoubleType))
            if t > 0 && t <= 1 => roundedBounds(conjuncts, r, t)
        case LessThanOrEqual(Literal(t: Double, DoubleType), r: Round)
            if t > 0 && t <= 1 => roundedBounds(conjuncts, r, t)
        case _ => Nil
      }

  private def roundedBounds(conjuncts: Seq[Expression], r: Round,
      t: Double): Seq[Expression] = r.child match {
    case js: JaccardSorted if !alreadyBounded(conjuncts, js) =>
      r.scale match {
        case Literal(d: Int, IntegerType) if t - math.pow(10, -d) > 0 =>
          bounds(js, t - math.pow(10, -d))
        case _ => Nil
      }
    case _ => Nil
  }

  /** Injects into BOTH predicate homes: Filter conditions, and Join
    * conditions — the main optimizer pushes a post-join threshold filter
    * INTO the join (PushPredicateThroughJoin) before this extra batch
    * runs, and the join is exactly where the merge kernel would
    * otherwise run once per candidate pair. */
  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val derived = derive(conjuncts)
      if (derived.isEmpty) f
      else Filter((derived ++ conjuncts).reduce(And), child)
    case j @ Join(_, _, _, Some(cond), _) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val derived = derive(conjuncts)
      if (derived.isEmpty) j
      else j.copy(condition = Some((derived ++ conjuncts).reduce(And)))
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
    case other => Seq(other)
  }

  /** Adds the rule to a live session's experimental optimizations
    * (no-op if already installed) — the path the registered queries use,
    * since the driver's Verify/Bench sessions are built without the
    * extensions config. */
  def install(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(this)) spark.experimental.extraOptimizations = cur :+ this
  }
}

/** `spark.sql.extensions` entry point for cluster deployments. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => JaccardLengthPruning)
}

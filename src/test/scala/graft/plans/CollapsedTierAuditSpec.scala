package graft.plans

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Collapse-first audit (VERDICT r12 #4): where a collapsed tier of a
  * pair-emitting operator exists, REGISTERED queries must call it — the
  * row/pair forms stay as API faces for bounded callers, but a registered
  * query is what the round driver scales to 100×, and round 12 showed a
  * pair-form on that path is a quadratic time bomb the sf0.1 gate cannot
  * see (q_label_consistency: 345 s honest at 100× before the collapse).
  *
  * The pin is structural (source scan of graft/queries/), matching
  * SessionConfigSpec's style: plan-shape checks for the collapsed forms
  * themselves live in PlanSpec/IvfServePlanSpec/JoinsSpec; this spec only
  * guards the ROUTING so a future query can't quietly reach for the
  * pair-form face.
  *
  * Inventory of pair-form faces and their collapsed tiers:
  *   - Joins.rangeJoinAgg            → rangeJoinAggCollapsed
  *   - Joins.intervalOverlapSelfJoin → intervalOverlapCountsCollapsed
  *   - Similarity.ivfScreen (direct) → ivfScreenAuto (guarded selector;
  *     also covers the ivfProbe fallback for unbounded distinct counts)
  *   - Similarity.bruteForceTopK / ivfProbe — allowed ONLY with a bounded
  *     query side (the queriesSlice fixture face); a full-corpus query
  *     side must use ivfScreenAuto.
  */
class CollapsedTierAuditSpec extends AnyFunSuite {

  private def querySources: Seq[(String, String)] = {
    val dir = Paths.get("src/main/scala/graft/queries")
    assert(Files.isDirectory(dir), s"queries dir moved: $dir — update this spec")
    Files.walk(dir).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .map(p => p.toString -> new String(Files.readAllBytes(p), "UTF-8"))
      .toSeq
  }

  test("no registered query calls a pair-form face that has a collapsed tier") {
    // word-boundary + open-paren so rangeJoinAggCollapsed( doesn't match
    val banned = Seq(
      "\\brangeJoinAgg\\(" ->
        "Joins.rangeJoinAgg — use rangeJoinAggCollapsed (R² pair fan-out)",
      "\\bintervalOverlapSelfJoin\\(" ->
        "Joins.intervalOverlapSelfJoin — use intervalOverlapCountsCollapsed",
      "\\bivfScreen\\(" ->
        "Similarity.ivfScreen direct — use ivfScreenAuto (broadcast guard)")
    for ((path, src) <- querySources; (pat, why) <- banned) {
      val hits = pat.r.findAllIn(src).size
      assert(hits == 0, s"$path calls a pair-form face ($hits×): $why")
    }
  }

  test("bounded-query-side faces (bruteForceTopK, ivfProbe) only appear with " +
      "the bounded queriesSlice fixture face") {
    val boundedOnly = Seq("bruteForceTopK\\(", "ivfProbe\\(")
    for ((path, src) <- querySources; pat <- boundedOnly) {
      pat.r.findAllMatchIn(src).foreach { m =>
        val window = src.substring(m.start, math.min(src.length, m.start + 220))
        assert(window.contains("queriesSlice"),
          s"$path calls ${m.matched.dropRight(1)} without a bounded query " +
            s"side (queriesSlice) — a full-corpus query side must route " +
            s"through ivfScreenAuto:\n$window")
      }
    }
  }
}

package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Pins that the generated DuckDB oracle SQL stays in sync with the
  * kernel's seeded permutation constants — the property that makes the
  * generated-not-hand-written design safe against seed or K changes.
  */
class MinhashOracleSpec extends AnyFunSuite {

  test("candidate SQL embeds every permutation constant, unsigned") {
    val sql = MinhashOracle.candidatesSql
    val a = graft.functions.Kernels.minhashPermA
    val b = graft.functions.Kernels.minhashPermB
    assert(a.length == 64 && b.length == 64)
    (a ++ b).foreach { v =>
      val u = java.lang.Long.toUnsignedString(v)
      assert(sql.contains(s"'$u'"), s"constant $u missing from generated SQL")
    }
  }

  test("verified SQL extends the same core with the jaccard tail") {
    val cand = MinhashOracle.candidatesSql
    val ver = MinhashOracle.verifiedSql
    // same core CTE chain (perm table identical)
    assert(ver.contains("perm(j, pa, pb)") && cand.contains("perm(j, pa, pb)"))
    assert(ver.contains("list_intersect") && ver.contains(">= 0.5"))
    assert(cand.contains("est_jaccard") && ver.contains("jaccard"))
  }

  test("generated SQL is balanced (no truncated expansion)") {
    for (sql <- Seq(MinhashOracle.candidatesSql, MinhashOracle.verifiedSql)) {
      assert(sql.count(_ == '(') == sql.count(_ == ')'))
      assert(sql.count(_ == '\'') % 2 == 0)
    }
  }
}

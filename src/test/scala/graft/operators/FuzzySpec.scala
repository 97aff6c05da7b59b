package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edit-distance self-join vs the brute-force all-pairs answer on a
  * corpus CONSTRUCTED to stress the filter: planted 1/2-edit variants,
  * duplicate strings (distance 0), strings below the count-filter minimum
  * (short tier), and a pair that shares NO q-gram yet is within distance
  * ("ab" vs "cd" at k=2 — the case a pure gram join silently misses).
  */
class FuzzySpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private val corpus = Seq(
    1L -> "kitten", 2L -> "mitten", 3L -> "sitting", 4L -> "kitten",
    5L -> "red widget", 6L -> "rad widget", 7L -> "red widgets",
    8L -> "blue anvil", 9L -> "cold plate", 10L -> "old plate",
    11L -> "ab", 12L -> "cd", 13L -> "abc", 14L -> "xyzzy",
    15L -> "a", 16L -> "")

  private def df = corpus.toDF("id", "s")

  private def brute(k: Int): Set[(Long, Long, Int)] = {
    val rows = for {
      (ia, sa) <- corpus; (ib, sb) <- corpus if ia < ib
      d = levDist(sa, sb) if d <= k
    } yield (ia, ib, d)
    rows.toSet
  }

  private def levDist(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  private def run(k: Int): Set[(Long, Long, Int)] =
    Fuzzy.editDistanceSelfJoin(df, "id", "s", maxDist = k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("k=2 join equals brute force (recall 1.0, precision exact)") {
    assert(run(2) == brute(2))
  }

  test("k=1 join equals brute force") {
    assert(run(1) == brute(1))
  }

  test("no-shared-gram pair within distance is still found (short tier)") {
    assert(run(2).contains((11L, 12L, 2)))
  }

  test("duplicate strings pair at distance 0") {
    assert(run(1).contains((1L, 4L, 0)))
  }

  test("k=3 catches kitten~sitting, still equals brute force") {
    val got = run(3)
    assert(got.contains((1L, 3L, 3)))
    assert(got == brute(3))
  }
}

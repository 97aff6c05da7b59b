package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench output contract that broke three rounds in a row: the
  * stdout line must stay far below the round driver's ~2 KB stdout-tail
  * window (sbt's trailing "[success] ..." line also lives in that
  * window), must parse as JSON, and must keep the slowest queries.
  */
class BenchLineSpec extends AnyFunSuite {

  private def results(n: Int): Map[String, Either[String, Double]] =
    (0 until n).map { i =>
      f"q_some_rather_long_query_name_$i%03d" -> (Right(i * 0.137): Either[String, Double])
    }.toMap

  test("compact line stays under 1.3 KB even for huge suites") {
    for (n <- Seq(0, 1, 73, 500)) {
      val (_, compact) = Bench.lines(results(n), "/root/testdata/sf0.1")
      assert(compact.length < 1300, s"n=$n line is ${compact.length} bytes")
    }
  }

  test("compact line is valid JSON-shaped and keeps the slowest queries first") {
    val (_, compact) = Bench.lines(results(200), "/x")
    // balanced braces and quotes — a truncated map would break both
    assert(compact.count(_ == '{') == compact.count(_ == '}'))
    assert(compact.count(_ == '"') % 2 == 0)
    assert(compact.contains("\"metric\":\"total\""))
    assert(compact.contains("\"nqueries\":200"))
    // slowest query (highest index) must be in the kept map
    assert(compact.contains("q_some_rather_long_query_name_199"))
  }

  test("full line carries every query and the error marker form") {
    val rs = results(73) + ("q_broken" -> (Left("Boom: it \"failed\"\nbadly"): Either[String, Double]))
    val (full, compact) = Bench.lines(rs, "/x")
    assert(rs.keys.forall(k => full.contains("\"" + k + "\"")))
    assert(full.contains("\"errors\":1") && compact.contains("\"errors\":1"))
    // escaped quote and newline must not break the JSON line
    assert(!full.contains("\n"))
  }
}

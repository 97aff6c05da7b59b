package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the declared-refusal contract between the engine and the scale
  * gate (VERDICT r17 #7): `dev/bench_diff.py` accepts a both-sides
  * error for `q_dedup_embedding` ONLY while the error message still
  * contains its EXPECTED_REFUSALS fragment. A reworded requirement in
  * [[Dedup.exactEmbeddingTopPairs]] would flip the 100× gate from
  * "declared pass" to FAIL — safe but noisy, and adjudicated hours
  * later at record time instead of seconds later in `sbt test`. This
  * spec parses the fragment out of the gate script and asserts the
  * thrown message (as Bench formats it, 120-char truncation included)
  * still carries it. */
class RefusalMessageSyncSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def gateFragment: String = {
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("dev/bench_diff.py")),
      java.nio.charset.StandardCharsets.UTF_8)
    // EXPECTED_REFUSALS = { "q_dedup_embedding": "<fragment>", }
    val m = """"q_dedup_embedding":\s*"([^"]+)"""".r.findFirstMatchIn(src)
    assert(m.isDefined,
      "dev/bench_diff.py no longer declares q_dedup_embedding in " +
        "EXPECTED_REFUSALS — update this spec alongside the gate")
    m.get.group(1)
  }

  test("the row-cap refusal message still carries the gate's declared " +
      "fragment, inside Bench's 120-char error truncation") {
    val frag = gateFragment
    val df = (0L until 6L).map(i => (i, Array(1.0, 0.0))).toDF("vec_id", "embedding")
    val prev = spark.conf.getOption("spark.graft.dedup.exactPairsMaxRows")
    spark.conf.set("spark.graft.dedup.exactPairsMaxRows", "5")
    try {
      val e = intercept[IllegalArgumentException] {
        Dedup.exactEmbeddingTopPairs(df, "vec_id", "embedding", 10).collect()
      }
      // exactly what the gate sees: Bench records
      // "<SimpleName>: <message.take(120)>"
      val recorded =
        s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}"
      assert(recorded.contains(frag),
        s"gate fragment '$frag' not in the recorded error '$recorded' — " +
          "the refusal message and dev/bench_diff.py EXPECTED_REFUSALS " +
          "have drifted apart")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.graft.dedup.exactPairsMaxRows", v)
      case None => spark.conf.unset("spark.graft.dedup.exactPairsMaxRows")
    }
  }
}

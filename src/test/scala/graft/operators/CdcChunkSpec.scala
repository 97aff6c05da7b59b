package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** [[Curation.contentDefinedChunks]] semantics on constructed token
  * streams: boundary placement, the empty-tail rule, and the property
  * CDC exists for — boundaries re-synchronize after an insertion, so
  * shared suffixes fingerprint identically at different offsets. */
class CdcChunkSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  // local FNV-1a (public algorithm) to pick anchor/non-anchor words —
  // must match the Fnv64 kernel byte-for-byte on ASCII
  private def fnv(s: String): Long = {
    var h = 0xcbf29ce484222325L
    s.getBytes("US-ASCII").foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
    h
  }
  private val D = 8
  private val words = (1 to 2000).map(i => s"w$i")
  private val anchor = words.find(w => math.floorMod(fnv(w), D) == 0).get
  private val plain = words.filter(w => math.floorMod(fnv(w), D) != 0)

  private def chunksOf(rows: (Long, String)*): Map[Long, Seq[(Int, Int, Long)]] =
    Curation.contentDefinedChunks(
        rows.toDF("doc_id", "text"), "doc_id", "text", D)
      .collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getLong(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap

  test("a chunk ends at each anchor token; the remainder forms the tail chunk") {
    val text = Seq(plain(0), plain(1), anchor, plain(2), plain(3)).mkString(" ")
    val got = chunksOf(1L -> text)(1L)
    assert(got.map(c => (c._1, c._2)) === Seq((1, 3), (2, 2)))
  }

  test("a trailing anchor produces no empty chunk") {
    val got = chunksOf(1L -> Seq(plain(0), anchor).mkString(" "))(1L)
    assert(got.map(c => (c._1, c._2)) === Seq((1, 2)))
  }

  test("boundaries re-sync: different-length prefixes, identical suffix chunks") {
    val suffix = Seq(plain(10), plain(11), anchor, plain(12), plain(13), plain(14))
    val a = (Seq(plain(0), anchor) ++ suffix).mkString(" ")
    val b = (Seq(plain(1), plain(2), plain(3), anchor) ++ suffix).mkString(" ")
    val got = chunksOf(1L -> a, 2L -> b)
    // after each doc's first anchor the streams are identical, so every
    // post-prefix chunk fingerprint must agree despite the offset shift
    val fpA = got(1L).drop(1).map(_._3)
    val fpB = got(2L).drop(1).map(_._3)
    assert(fpA.nonEmpty && fpA === fpB)
  }

  test("a fixed-width chunker would NOT re-sync on the same input (control)") {
    // the same two docs chunked at fixed width 4 share no chunk after the
    // insertion — the failure mode CDC removes
    val suffix = Seq(plain(10), plain(11), anchor, plain(12), plain(13), plain(14))
    val a = Seq(plain(0), anchor) ++ suffix
    val b = Seq(plain(1), plain(2), plain(3), anchor) ++ suffix
    def fixed(t: Seq[String]) = t.grouped(4).map(_.mkString(" ")).toSet
    assert((fixed(a) intersect fixed(b)).isEmpty)
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Reference Morton interleave, bit by bit. */
  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zValue matches the reference interleave on the full 4-bit grid") {
    val rows = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val got = rows.toDF("x", "y")
      .select($"x", $"y", Layout.zValue($"x", $"y", 4).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    rows.foreach { case (x, y) =>
      assert(got((x, y)) === mortonRef(x, y, 4), s"x=$x y=$y")
    }
  }

  test("zValue is monotone on the diagonal and bounded by 2^(2*bits)") {
    val df = (0L until 256L).map(v => (v, v)).toDF("x", "y")
      .select(Layout.zValue($"x", $"y", 8).as("z"))
    val zs = df.collect().map(_.getLong(0))
    assert(zs.forall(z => z >= 0 && z < (1L << 16)))
    assert(zs.sorted.sameElements(zs)) // diag z = bit-doubled v, monotone
  }

  test("zValueSql replays zValue exactly (evaluated by Spark SQL)") {
    val rows = Seq((5L, 9L), (0L, 0L), (255L, 255L), (170L, 85L), (1L, 254L))
    val sql = Layout.zValueSql("x", "y", 8)
    val df = rows.toDF("x", "y")
      .select(Layout.zValue($"x", $"y", 8).as("z_col"), expr(sql).as("z_sql"))
    df.collect().foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("zorderFileStats bounds both dimensions per file and partitions all rows") {
    val n = 4096
    val df = (0 until n).map(i => ((i * 37L) % 256L, (i * 101L) % 256L)).toDF("xb", "yb")
    val stats = Layout.zorderFileStats(df, "xb", "yb", bits = 8, fileShift = 10).collect()
    assert(stats.map(_.getAs[Long]("n_rows")).sum === n.toLong)
    stats.foreach { r =>
      val fid = r.getAs[Long]("file_id")
      assert(fid >= 0 && fid < 64)
      // a 10-bit z-extent constrains each 8-bit dim to a 32-wide band:
      // z >> 10 fixes bits 10..15, i.e. x bits 5..7 and y bits 5..7.
      assert(r.getAs[Long]("max_x") - r.getAs[Long]("min_x") < 32)
      assert(r.getAs[Long]("max_y") - r.getAs[Long]("min_y") < 32)
    }
  }

  test("bloomPrefilteredJoin equals the plain join exactly") {
    val probe = (1L to 5000L).map(k => (k % 97L, k)).toDF("pk", "payload")
    val build = Seq(3L, 7L, 11L, 96L).toDF("bk")
    val got = Layout.bloomPrefilteredJoin(probe, build, "pk", "bk", expectedKeys = 100)
      .select($"pk", $"payload").orderBy($"pk", $"payload")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = probe.join(build, $"pk" === $"bk")
      .select($"pk", $"payload").orderBy($"pk", $"payload")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sameElements(want))
    assert(got.nonEmpty)
    // the probe predicate must be Spark's codegen'd BloomFilterMightContain
    // expression, never a ScalaUDF (which breaks whole-stage codegen in
    // the probe-side scan). Assert on the ANALYZED plan: over this
    // local-relation fixture ConvertToLocalRelation evaluates the
    // expression at optimize time and the filter vanishes from the
    // physical plan entirely — something a ScalaUDF can't do at all
    val qe = Layout.bloomPrefilteredJoin(probe, build, "pk", "bk",
      expectedKeys = 100).queryExecution
    assert(qe.analyzed.toString.contains("might_contain"),
      qe.analyzed.toString.take(2000))
    assert(!qe.analyzed.toString.contains("UDF")
      && !qe.executedPlan.toString.contains("UDF"),
      "bloom probe must not be a ScalaUDF")
  }

  test("bloomPrefilteredJoin tolerates null probe keys (dropped, like the join)") {
    val probe = Seq[(java.lang.Long, Long)]((3L, 1L), (null, 2L), (5L, 3L)).toDF("pk", "payload")
    val build = Seq(3L, 5L).toDF("bk")
    val got = Layout.bloomPrefilteredJoin(probe, build, "pk", "bk", expectedKeys = 10)
    assert(got.count() === 2)
  }

  test("bloomPrefilteredJoin rejects non-integral join keys loudly") {
    // a string key would cast to NULL in the long-probe and silently drop
    // every row — the operator must fail instead of returning wrong results
    val probe = Seq(("a", 1L), ("b", 2L)).toDF("pk", "payload")
    val build = Seq("a").toDF("bk")
    val e = intercept[IllegalArgumentException] {
      Layout.bloomPrefilteredJoin(probe, build, "pk", "bk", expectedKeys = 10)
    }
    assert(e.getMessage.contains("integral"))
    // integral-but-mixed widths stay allowed (int probe, long build)
    val probeInt = Seq((3, 1L), (5, 2L)).toDF("pk", "payload")
    val buildLong = Seq(3L).toDF("bk")
    assert(Layout.bloomPrefilteredJoin(probeInt, buildLong, "pk", "bk",
      expectedKeys = 10).count() === 1)
  }

  test("compaction plan: size-ordered contiguous packing, hand-computed groups") {
    val shards = Seq(("a", 10L), ("b", 7L), ("c", 5L), ("d", 3L), ("e", 1L))
      .toDF("shard", "rows")
    val got = Layout.compactionPlan(shards, "shard", "rows", targetRows = 12L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // cum-before in (rows desc, shard) order: a=0, b=10, c=17, d=22, e=25
    assert(got === Map("a" -> 0L, "b" -> 0L, "c" -> 1L, "d" -> 1L, "e" -> 2L))
    // every group except possibly the last stays below target + largest member
    val grpRows = Layout.compactionPlan(shards, "shard", "rows", 12L)
      .groupBy("grp").sum("rows").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(grpRows(0L) === 17L && grpRows(1L) === 8L && grpRows(2L) === 1L)
  }
}

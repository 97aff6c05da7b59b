package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TopKByValue.top_k_by

/** The bounded-heap aggregate must equal the window-rank idiom under
  * every partial/merge split Spark throws at it. */
class TopKSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  test("BoundedTopK keeps the k best with deterministic tie-break") {
    val b = new BoundedTopK(3)
    Seq((1.0, 10L), (5.0, 3L), (5.0, 1L), (2.0, 7L), (9.0, 4L)).foreach {
      case (v, id) => b.add(v, id)
    }
    val got = (0 until b.size).map(i => (b.values(i), b.ids(i)))
    assert(got == Seq((9.0, 4L), (5.0, 1L), (5.0, 3L)))
  }

  test("aggregate equals window row_number <= k across partitionings") {
    val n = 5000
    val df = (0 until n).map { i =>
      (i.toLong, s"g${i % 7}", ((i * 31) % 101).toDouble) // many exact ties
    }.toDF("id", "g", "v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"v".desc, $"id".asc)
    val expected = df.withColumn("rk", row_number().over(w))
      .where($"rk" <= 10).select($"g", $"rk", $"id", $"v")
      .collect().map(_.toString).sorted.toSeq
    for (parts <- Seq(1, 3, 17)) {
      val got = df.repartition(parts)
        .groupBy($"g").agg(top_k_by($"v", $"id", 10).as("top"))
        .select($"g", posexplode($"top"))
        .select($"g", ($"pos" + 1).as("rk"), $"col.id".as("id"), $"col.value".as("v"))
        .collect().map(_.toString).sorted.toSeq
      assert(got == expected, s"parts=$parts")
    }
  }

  test("serialize/deserialize round-trips the buffer") {
    import org.apache.spark.sql.graftshim.ColumnBridge
    val agg = TopKByValue(
      ColumnBridge.expression(lit(0.0)), ColumnBridge.expression(lit(0L)), 4)
    val b = new BoundedTopK(4)
    Seq((3.5, 2L), (1.0, 9L), (7.25, 11L)).foreach { case (v, id) => b.add(v, id) }
    val rt = agg.deserialize(agg.serialize(b))
    assert((0 until rt.size).map(i => (rt.values(i), rt.ids(i))) ==
      (0 until b.size).map(i => (b.values(i), b.ids(i))))
  }

  test("NULL values are skipped (the documented contract)") {
    val df = Seq[(Long, String, java.lang.Double)](
      (1L, "a", 3.0), (2L, "a", null), (3L, "a", 1.0), (4L, "b", null)
    ).toDF("id", "g", "v")
    val got = df.groupBy($"g").agg(top_k_by($"v", $"id", 5).as("top"))
      .select($"g", size($"top").as("n")).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("a" -> 2, "b" -> 0), s"got $got")
  }

  test("groups smaller than k emit all their rows") {
    val df = Seq((1L, "a", 2.0), (2L, "a", 1.0), (3L, "b", 5.0)).toDF("id", "g", "v")
    val got = df.groupBy($"g").agg(top_k_by($"v", $"id", 10).as("top"))
      .select($"g", size($"top").as("n")).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("a" -> 2, "b" -> 1))
  }
}

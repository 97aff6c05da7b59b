package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SynthSourceSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def read(rows: Long, parts: Int) =
    spark.read.format("graft-synth")
      .option("rows", rows).option("partitions", parts).load()

  test("row range is exact and split across the requested partitions") {
    val df = read(1000, 7)
    assert(df.rdd.getNumPartitions == 7)
    assert(df.count() == 1000)
    assert(df.agg(min($"id"), max($"id")).as[(Long, Long)].head() == (0L, 999L))
    // ranges partition the id space without overlap
    assert(df.select($"id").distinct().count() == 1000)
  }

  test("generation is deterministic and matches the documented rule") {
    val r = read(500, 3).where($"id" === 123L).head()
    assert(r.getAs[Int]("bucket") == (123 % 16))
    assert(r.getAs[Double]("val") == ((123L * 2654435761L) % 1000000L) / 1e6)
    assert(r.getAs[String]("text") == s"tok${123 % 101} tok${123 % 97} tok${123 % 89}")
  }

  test("column pruning reaches the connector (unrequested fields not generated)") {
    val scan = read(10, 1).select($"id", $"bucket").queryExecution
      .executedPlan.toString
    assert(scan.contains("ReadSchema") || scan.contains("graft_synth"), scan)
    val pruned = read(10, 1).select($"id", $"bucket").queryExecution
      .optimizedPlan.schema.fieldNames.toSet
    assert(pruned == Set("id", "bucket"))
    // and the physical scan's output carries only the pruned columns
    val leaves = read(10, 1).select($"id", $"bucket").queryExecution
      .executedPlan.collectLeaves()
    assert(leaves.exists(_.output.map(_.name).toSet == Set("id", "bucket")),
      leaves.map(_.output.map(_.name)).toString)
  }

  test("id-range filters push into the source: rows outside are never generated") {
    val df = read(1000, 4).where($"id" >= 200L && $"id" < 700L)
    // the clamped generation range is visible in the scan description...
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("range=[200,700)"), plan)
    // ...and the partition split covers exactly the clamped range
    assert(df.count() === 500)
    assert(df.agg(min($"id"), max($"id")).as[(Long, Long)].head() == (200L, 699L))
    // a non-range filter stays a residual; result is still exact
    val mixed = read(1000, 4).where($"id" >= 900L && $"bucket" === 5)
    assert(plan != null && mixed.collect().forall { r =>
      r.getAs[Long]("id") >= 900L && r.getAs[Int]("bucket") == 5
    })
    assert(mixed.count() ===
      (900L until 1000L).count(id => id % 16 == 5).toLong)
    // contradictory range clamps to empty, not negative
    assert(read(1000, 2).where($"id" > 800L && $"id" < 100L).count() === 0)
  }

  test("empty source (rows=0) yields an empty, correctly-typed frame") {
    val df = read(0, 4)
    assert(df.count() == 0)
    assert(df.schema == SynthSource.schema)
  }
}

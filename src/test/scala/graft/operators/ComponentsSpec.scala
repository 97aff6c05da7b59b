package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Connected components on constructed graphs — pins the min-label
  * propagation semantics that q_dedup_clusters builds on. */
class ComponentsSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  /** Both execution paths must agree: driver union-find (small graphs)
    * and the distributed min-label loop (forced via driverMaxEdges=0). */
  private def cc(edges: Seq[(Long, Long)], distributed: Boolean): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("u", "v"), "u", "v",
        driverMaxEdges = if (distributed) 0L else Components.DriverUnionFindMaxEdges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  for (distributed <- Seq(false, true)) {
    val path = if (distributed) "distributed min-label" else "driver union-find"

    test(s"[$path] two disjoint components get distinct min labels") {
      val m = cc(Seq((1L, 2L), (2L, 3L), (10L, 11L)), distributed)
      assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    }

    test(s"[$path] chain longer than one hop converges (diameter > 1)") {
      // 7-node path: label 1 must travel 6 hops
      val edges = (1L to 6L).map(i => (i, i + 1))
      val m = cc(edges, distributed)
      assert(m.values.toSet == Set(1L), s"labels: $m")
      assert(m.keySet == (1L to 7L).toSet)
    }

    test(s"[$path] transitive near-dup shape: a~b, b~c, no a~c edge → one cluster") {
      val m = cc(Seq((5L, 9L), (9L, 2L)), distributed)
      assert(m == Map(2L -> 2L, 5L -> 2L, 9L -> 2L))
    }

    test(s"[$path] cycle plus bridge merges into one component") {
      val m = cc(Seq((3L, 4L), (4L, 5L), (5L, 3L), (5L, 20L), (20L, 21L)), distributed)
      assert(m.values.toSet == Set(3L))
    }

    test(s"[$path] self-loop and duplicate edges are harmless") {
      val m = cc(Seq((7L, 7L), (7L, 8L), (8L, 7L), (7L, 8L)), distributed)
      assert(m == Map(7L -> 7L, 8L -> 7L))
    }
  }

  test("both paths agree on a random 200-node graph") {
    val rng = new scala.util.Random(7)
    val edges = Seq.fill(150)((rng.nextInt(200).toLong, rng.nextInt(200).toLong))
    assert(cc(edges, distributed = false) == cc(edges, distributed = true))
  }
}

package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Triangle counting on CONSTRUCTED graphs with known answers: K4 (every
  * node in 3 triangles), a triangle plus pendant path (pendant nodes in
  * none), and input-noise canonicalization (duplicate, reversed, and
  * self-loop edges must not change counts).
  */
class GraphSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def counts(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.triangleCorners(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("K4: four triangles, each node in exactly 3") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    assert(counts(k4) == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("triangle with pendant path counts only the triangle") {
    val g = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L, 4L -> 5L)
    assert(counts(g) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("duplicate, reversed, and self-loop edges are canonicalized away") {
    val noisy = Seq(1L -> 2L, 2L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 1L,
      1L -> 3L, 2L -> 2L)
    assert(counts(noisy) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangle-free bipartite graph yields no rows") {
    val g = for (i <- 0L to 2L; j <- 10L to 12L) yield (i, j)
    assert(counts(g).isEmpty)
  }

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.pagerankFixedPoint(edges.toDF("a", "b"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("pagerank on a regular graph (cycle) is the exact fixed point at every iteration") {
    // deg=2 everywhere: contrib = r div 2 from both neighbors, so
    // r' = 150000 + 85*1000000 div 100 = 1000000 exactly — stationary.
    val cycle = (0L until 5L).map(i => i -> ((i + 1) % 5))
    for (it <- Seq(1, 3)) {
      val got = ranks(cycle, it)
      assert(got == (0L until 5L).map(_ -> 1000000L).toMap, s"iters=$it: $got")
    }
  }

  test("pagerank on a star: hand-computed integer recurrence after 2 iterations") {
    // center 0, leaves 1..4. i1: center = 150000 + 85*4000000 div 100 =
    // 3550000; leaf = 150000 + 85*(1000000 div 4) div 100 = 362500.
    // i2: center = 150000 + 85*(4*362500) div 100 = 1382500;
    // leaf = 150000 + 85*(3550000 div 4) div 100 = 904375.
    val star = (1L to 4L).map(0L -> _)
    val got = ranks(star, 2)
    assert(got(0L) == 1382500L)
    assert((1L to 4L).forall(got(_) == 904375L), got.toString)
  }

  test("pagerank canonicalizes duplicate/reversed/self-loop edges") {
    val clean = ranks(Seq(1L -> 2L, 2L -> 3L), 3)
    val noisy = ranks(Seq(1L -> 2L, 2L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 3L), 3)
    assert(clean == noisy)
  }

  test("two skewed hubs sharing all leaves: counts match the closed form") {
    // hubs 100, 101 connected to each other and to 30 shared leaves:
    // every leaf closes exactly one triangle through the hub edge.
    val leaves = (0L until 30L)
    val g = Seq(100L -> 101L) ++ leaves.map(100L -> _) ++ leaves.map(101L -> _)
    val c = counts(g)
    assert(c(100L) == 30L && c(101L) == 30L)
    assert(leaves.forall(l => c(l) == 1L))
  }
}

package graft.operators

import graft.SparkSpec

/** Pins [[Graph.kCore]] against hand-known coreness: a K4 clique
  * (coreness 3), a triangle (2), and a pendant path (1), in one graph.
  * Also pins the h-operator's monotone convergence: extra rounds
  * never change the fixed point. */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  // K4 on 1-4, path 4-5-6, triangle 7-8-9
  private val edges = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
    (4L, 5L), (5L, 6L),
    (7L, 8L), (8L, 9L), (9L, 7L)).toDF("src", "dst")

  private def run(n: Int): Map[Long, Long] =
    Graph.kCore(edges, nIter = n).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("coreness")).toMap

  test("kCore: clique 3, triangle 2, pendant path 1") {
    val c = run(8)
    assert(Seq(1L, 2L, 3L, 4L).forall(c(_) == 3L), c)
    assert(Seq(7L, 8L, 9L).forall(c(_) == 2L), c)
    assert(c(5L) == 1L && c(6L) == 1L, c)
  }

  test("kCore: fixed point is stable under extra rounds") {
    assert(run(8) == run(12))
  }

  test("kCore: duplicate/self/reversed edges are cleaned") {
    val noisy = edges.union(Seq((2L, 1L), (1L, 1L), (1L, 2L)).toDF("src", "dst"))
    assert(Graph.kCore(noisy, nIter = 8).collect().map(r =>
      r.getAs[Long]("node") -> r.getAs[Long]("coreness")).toMap == run(8))
  }
}

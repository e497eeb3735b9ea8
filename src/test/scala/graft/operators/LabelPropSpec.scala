package graft.operators

import graft.SparkSpec

/** Pins [[Graph.labelPropagation]]: two dense cliques joined by one
  * bridge edge stay two communities (where components would merge
  * them), the min-label tie-break, and synchronous-update semantics. */
class LabelPropSpec extends SparkSpec {
  import spark.implicits._

  private def communities(edges: Seq[(Long, Long)], nIter: Int) =
    Graph.labelPropagation(edges.toDF("src", "dst"), nIter).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("label")).toMap

  test("two cliques with one bridge resolve to two communities") {
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) :+ (4L -> 10L)
    val lbl = communities(edges, nIter = 4)
    assert(Seq(1L, 2L, 3L, 4L).map(lbl).distinct.size == 1)
    assert(Seq(10L, 11L, 12L, 13L).map(lbl).distinct.size == 1)
    assert(lbl(1L) != lbl(10L)) // components would merge through 4-10
  }

  test("label-frequency ties break to the smallest label") {
    // node 3's neighbors 1 and 2 start with distinct labels, one vote
    // each → 3 adopts min(1,2)=1 after one round
    val lbl = communities(Seq((1L, 3L), (2L, 3L)), nIter = 1)
    assert(lbl(3L) == 1L)
  }

  test("updates are synchronous: one round swaps a 2-cycle's labels") {
    // in round 1 each endpoint sees only the OTHER's round-0 label;
    // an asynchronous sweep would instead converge to one label
    val lbl = communities(Seq((1L, 2L)), nIter = 1)
    assert(lbl(1L) == 2L && lbl(2L) == 1L)
  }

  test("self-edges and duplicate/reverse edges are ignored") {
    val lbl = communities(
      Seq((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L)), nIter = 1)
    // 2's neighbors {1,3}: tie → min label 1; 1 and 3 adopt 2
    assert(lbl(1L) == 2L && lbl(2L) == 1L && lbl(3L) == 2L)
  }
}

package graft.operators

import graft.SparkSpec

class TriangleSpec extends SparkSpec {
  import spark.implicits._

  test("triangle census: known graph, duplicate/reversed edges collapse") {
    // 1-2-3 closed triangle plus pendant 3-4; duplicates and reversals
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L),
      (2L, 1L), (3L, 1L), (3L, 3L)).toDF("src", "dst")
    val out = Graph.triangleStats(edges).collect().head
    assert(out.getAs[Long]("n_nodes") == 4L)
    assert(out.getAs[Long]("n_edges") == 4L) // canonical distinct, no self
    assert(out.getAs[Long]("n_triangles") == 1L)
    // degrees 2,2,3,1 → wedges 1+1+3+0 = 5; clustering = 3·1/5
    assert(out.getAs[Long]("n_wedges") == 5L)
    assert(out.getAs[Double]("clustering") == 0.6)
  }

  test("triangle-free graph reports zero without dividing by zero") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val out = Graph.triangleStats(path).collect().head
    assert(out.getAs[Long]("n_triangles") == 0L)
    assert(out.getAs[Double]("clustering") == 0.0)
    val single = Seq((1L, 2L)).toDF("src", "dst") // no wedges at all
    assert(Graph.triangleStats(single).collect()
      .head.getAs[Double]("clustering") == 0.0)
  }

  test("each triangle counts exactly once (K4 has 4)") {
    val k4 = (for {
      a <- 1L to 4L; b <- 1L to 4L if a < b
    } yield (a, b)).toDF("src", "dst")
    val out = Graph.triangleStats(k4).collect().head
    assert(out.getAs[Long]("n_triangles") == 4L)
    assert(out.getAs[Long]("n_wedges") == 12L) // 4 nodes × C(3,2)
    assert(out.getAs[Double]("clustering") == 1.0)
  }
}

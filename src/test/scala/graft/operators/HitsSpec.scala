package graft.operators

import graft.SparkSpec

class HitsSpec extends SparkSpec {
  import spark.implicits._

  test("pure hubs and pure authorities separate; scores rescale to 1e6") {
    // 1,2 are directories linking to destinations 10,11,12
    val edges = Seq((1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 10L), (2L, 11L), (2L, 12L)).toDF("src", "dst")
    val out = Graph.hitsInt(edges, nIter = 2).collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("auth_ppm"), r.getAs[Long]("hub_ppm"))).toMap
    Seq(10L, 11L, 12L).foreach { n =>
      assert(out(n) == ((1000000L, 0L))) // authority, never a hub
    }
    Seq(1L, 2L).foreach { n =>
      assert(out(n) == ((0L, 1000000L))) // hub, never an authority
    }
  }

  test("asymmetric in-links rank authorities; exact integer rescale") {
    // 10 is linked by 2 hubs, 11 by only one → auth(11) = 1e6 div 2
    val edges = Seq((1L, 10L), (2L, 10L), (1L, 11L)).toDF("src", "dst")
    val out = Graph.hitsInt(edges, nIter = 1).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("auth_ppm")).toMap
    assert(out(10L) == 1000000L)
    assert(out(11L) == 500000L)
  }

  test("self-loops and duplicate edges are dropped") {
    val edges = Seq((1L, 1L), (1L, 2L), (1L, 2L)).toDF("src", "dst")
    val out = Graph.hitsInt(edges, nIter = 1).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("auth_ppm")).toMap
    assert(out(2L) == 1000000L && out(1L) == 0L)
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmeansIvfSpec extends SparkSpec {
  import spark.implicits._

  // 4 well-separated clusters x 40 vectors, dim 8, deterministic floats
  private lazy val embs = (0 until 160).map { i =>
    val c = i % 4
    val base = Array.tabulate(8)(d => if (d == c * 2) 1.0f else 0.05f)
    val jit = Array.tabulate(8)(d => ((i * 7 + d * 3) % 13 - 6) * 0.004f)
    (i.toLong, base.zip(jit).map { case (a, b) => a + b })
  }.toDF("vec_id", "embedding")

  test("centroid training is deterministic and keeps exactly k cells") {
    val c1 = Ann.kmeansCentroids(embs, k = 4, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Long]](1).toSeq)
      .sortBy(_._1)
    val c2 = Ann.kmeansCentroids(embs, k = 4, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Long]](1).toSeq)
      .sortBy(_._1)
    assert(c1.length == 4 && c1.sameElements(c2))
  }

  test("trained cells recover the planted clusters") {
    // every planted cluster's members should land in ONE cell after
    // training (separation >> jitter)
    val cents = Ann.kmeansCentroids(embs, k = 4, iters = 4)
    val dims = 8
    val c = cents.collect().map(r =>
      r.getLong(0) -> r.getAs[scala.collection.Seq[Long]](1).toSeq)
    assert(c.length == 4)
    // cluster centers of the planted data, micro-quantized
    val planted = (0 until 4).map { cl =>
      Array.tabulate(dims)(d => if (d == cl * 2) 1.0 else 0.05)
    }
    // each planted center must be close to exactly one trained centroid
    val matched = planted.map { p =>
      c.minBy { case (_, cq) =>
        cq.zip(p).map { case (q, x) => math.pow(q / 1e6 - x, 2) }.sum
      }._1
    }
    assert(matched.distinct.length == 4, s"cells collapsed: ${matched.mkString(",")}")
  }

  test("empty cells keep their previous centroid (k survives)") {
    // k=6 over 4 tight clusters: at least 2 cells go empty yet remain
    val cents = Ann.kmeansCentroids(embs, k = 6, iters = 3)
    assert(cents.count() == 6)
  }

  test("IVF top-k recall vs brute force is high on clustered data") {
    val queries = embs.filter($"vec_id" < 12)
    val ivf = Ann.kmeansIvfTopK(embs, queries, k = 5, kCells = 4, iters = 3, nProbe = 2)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Ann.bruteForceTopK(embs, queries, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall")
  }
}

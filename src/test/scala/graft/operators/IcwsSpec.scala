package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Dedup.icwsSignatures]] + [[Dedup.idfWeights]]: exact
  * idf-micro weights, the identity/disjoint signature extremes, and
  * the unbiased-estimator property at K=256 on a hand pair. */
class IcwsSpec extends SparkSpec {
  import spark.implicits._

  test("idfWeights: exact smoothed idf micros") {
    // 3 docs; 'a' in all 3 → idfm = rha(ln(4/3)·1e6) = 287682;
    // 'z' in one → rha(ln(4)·1e6) = 1386294; w = tf·idfm
    val docs = Seq((1L, "a a z"), (2L, "a"), (3L, "a")).toDF("doc_id", "text")
    val w = Dedup.idfWeights(docs).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("tok")) -> r.getAs[Long]("w"))
      .toMap
    assert(w(1L -> "a") == 2 * 287682L)
    assert(w(1L -> "z") == 1386294L)
    assert(w(2L -> "a") == 287682L)
  }

  private def est(a: String, b: String, k: Int): Double = {
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val sig = Dedup.icwsSignatures(Dedup.idfWeights(docs), k)
    sig.filter(col("id") === 1).as("x")
      .join(sig.filter(col("id") === 2).as("y"), Seq("k"))
      .agg(avg(when(col("x.s_tok") === col("y.s_tok") &&
        col("x.s_tk") === col("y.s_tk"), 1.0).otherwise(0.0)))
      .collect()(0).getDouble(0)
  }

  test("identical docs agree on every slot; disjoint docs on none") {
    assert(est("a a b c", "a a b c", 32) == 1.0)
    assert(est("a b", "x y z", 32) == 0.0)
  }

  test("K=256 estimate lands near the exact weighted Jaccard") {
    // equal idf (both tokens in both docs) → J_w = (1+1)/(2+2) = 0.5
    val e = est("a a b", "a b b", 256)
    assert(math.abs(e - 0.5) < 0.2, s"est $e far from 0.5")
  }

  test("icwsNearDups: identical docs always collide; emitted pairs are true >= tau") {
    val docs = Seq((1L, "alpha beta gamma alpha"), (2L, "alpha beta gamma alpha"),
      (3L, "zeta eta theta")).toDF("doc_id", "text")
    val out = Dedup.icwsNearDups(docs, threshold = 0.7).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("wjaccard")))
    assert(out.toSeq == Seq((1L, 2L, 1.0))) // all 8 bands match; 3 never pairs
  }
}

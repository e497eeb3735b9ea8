package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[QualityDistill]]: the exact-integer GD trace on a
  * hand-replayed 1-dim problem (every truncating div verified by
  * hand), intercept rows for empty docs, and score monotonicity. */
class QualityDistillSpec extends SparkSpec {
  import spark.implicits._

  test("trainHardSigmoidLr: exact hand-replayed weight trace") {
    // dims=1: x = 1,2,4,5 with y = 0,0,1,1; eta_micro=1000, 3 rounds.
    // Hand replay (all divs truncating): r1 g0=3e6 -> w=(750,0);
    // r2 g0=2991378 -> +747, g1=-2249 -> +0; r3 g0=2982787 -> +745,
    // g1=-4490 -> -1. Final w = (2242, -1).
    val feats = Seq((1L, 0L, 1L), (2L, 0L, 2L), (3L, 0L, 4L), (4L, 0L, 5L),
      (1L, 1L, 1L), (2L, 1L, 1L), (3L, 1L, 1L), (4L, 1L, 1L))
      .toDF("id", "dim", "x")
    val labels = Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L)).toDF("id", "y")
    val w = QualityDistill.trainHardSigmoidLr(feats, labels, dims = 1)
      .collect().map(r => r.getAs[Long]("dim") -> r.getAs[Long]("w_micro"))
      .toMap
    assert(w == Map(0L -> 2242L, 1L -> -1L), w)

    val sc = QualityDistill.scoreHardSigmoid(feats,
        Seq((0L, 2242L), (1L, -1L)).toDF("dim", "w_micro"))
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("z_micro"), r.getAs[Long]("score_micro"))).toMap
    assert(sc(1L) == (2241L, 500560L), sc) // 2242*1 - 1
    assert(sc(4L) == (11209L, 502802L), sc) // 2242*5 - 1
    assert(sc(1L)._2 < sc(2L)._2 && sc(2L)._2 < sc(3L)._2 &&
      sc(3L)._2 < sc(4L)._2)
  }

  test("tracinInfluence: exact hand-replayed round-1 contributions") {
    // same 1-dim problem, val = train: round 1 residuals r =
    // (-5e5,-5e5,5e5,5e5); mean val gradient u = (3e6 div 4, 0 div 4)
    // = (750000, 0); dots = 750000*x; infl = (r div 1000)*(dot div 1000)
    val feats = Seq((1L, 0L, 1L), (2L, 0L, 2L), (3L, 0L, 4L), (4L, 0L, 5L),
      (1L, 1L, 1L), (2L, 1L, 1L), (3L, 1L, 1L), (4L, 1L, 1L))
      .toDF("id", "dim", "x")
    val labels = Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L)).toDF("id", "y")
    val infl = QualityDistill.tracinInfluence(feats, labels, labels,
        dims = 1, nIter = 1)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("infl")).toMap
    assert(infl == Map(1L -> -375000L, 2L -> -750000L,
      3L -> 1500000L, 4L -> 1875000L), infl)
  }

  test("tracinInfluence: repartition-invariant over full training") {
    val feats = Seq((1L, 0L, 1L), (2L, 0L, 2L), (3L, 0L, 4L), (4L, 0L, 5L),
      (1L, 1L, 1L), (2L, 1L, 1L), (3L, 1L, 1L), (4L, 1L, 1L))
      .toDF("id", "dim", "x")
    val labels = Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L)).toDF("id", "y")
    val a = QualityDistill.tracinInfluence(feats, labels, labels)
      .orderBy("id").collect().toSeq
    assert(a == QualityDistill.tracinInfluence(feats.repartition(5),
      labels.repartition(3), labels).orderBy("id").collect().toSeq)
  }

  test("hashedFeatures: intercept row for every doc, counts for tokens") {
    val docs = Seq((1L, "a b a"), (2L, "")).toDF("doc_id", "text")
    val fx = QualityDistill.hashedFeatures(docs, dims = 8).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("dim"), r.getAs[Long]("x")))
    // doc 2 is empty: intercept only
    assert(fx.filter(_._1 == 2L).toSeq == Seq((2L, 8L, 1L)))
    // doc 1: token dims in [0,8), x totals 3, plus the intercept
    val d1 = fx.filter(_._1 == 1L)
    assert(d1.count(_._2 == 8L) == 1)
    assert(d1.filter(_._2 < 8L).map(_._3).sum == 3L)
    assert(d1.forall(f => f._2 >= 0L && f._2 <= 8L))
  }
}

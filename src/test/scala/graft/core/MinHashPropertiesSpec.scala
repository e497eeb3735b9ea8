package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Property-style checks of the sketch algebra (seeded random cases) —
  * the laws every distributed/streamed/incremental path relies on.
  */
class MinHashPropertiesSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(7)
  private def randomSet(): List[String] =
    List.fill(rnd.nextInt(60))(
      rnd.alphanumeric.take(rnd.nextInt(8) + 1).mkString)

  test("sketch of a union == slot-min merge of sketches (100 random splits)") {
    for (_ <- 1 to 100) {
      val (a, b) = (randomSet(), randomSet())
      val merged = MinHash.mergeInto(MinHash.sketch(a).clone(), MinHash.sketch(b))
      assert(merged.sameElements(MinHash.sketch(a ++ b)))
    }
  }

  test("merge is commutative and idempotent") {
    for (_ <- 1 to 100) {
      val (sa, sb) = (MinHash.sketch(randomSet()), MinHash.sketch(randomSet()))
      val ab = MinHash.mergeInto(sa.clone(), sb)
      val ba = MinHash.mergeInto(sb.clone(), sa)
      assert(ab.sameElements(ba))
      assert(MinHash.mergeInto(ab.clone(), ab).sameElements(ab))
    }
  }

  test("sketch is order- and duplicate-insensitive (set semantics)") {
    for (_ <- 1 to 100) {
      val a = randomSet()
      val noisy = scala.util.Random.shuffle(a ++ a.take(3))
      assert(MinHash.sketch(noisy.distinct.toSet.toList)
        .sameElements(MinHash.sketch(a.distinct)))
    }
  }

  test("identical sets -> jaccard estimate 1; disjoint sets low") {
    val a = (1 to 200).map(i => s"val$i")
    val b = (1000 to 1200).map(i => s"val$i")
    val (sa, sb) = (MinHash.sketch(a), MinHash.sketch(b))
    def est(x: Array[Long], y: Array[Long]) =
      x.zip(y).count { case (p, q) => p == q }.toDouble / x.length
    assert(est(sa, MinHash.sketch(a)) == 1.0)
    assert(est(sa, sb) < 0.15)
  }
}

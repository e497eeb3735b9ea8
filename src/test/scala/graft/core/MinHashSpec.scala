package graft.core

import org.scalatest.funsuite.AnyFunSuite

class MinHashSpec extends AnyFunSuite {

  test("xxhash32 is deterministic and 32-bit unsigned") {
    val h1 = MinHash.xxhash32("hello")
    val h2 = MinHash.xxhash32("hello")
    assert(h1 == h2)
    assert(h1 >= 0 && h1 <= MinHash.MaxHash)
    assert(MinHash.xxhash32("hello") != MinHash.xxhash32("world"))
  }

  test("md5Low32/md5Low64 match DuckDB md5_number_lower (cross-engine oracle)") {
    // expected values computed with DuckDB 1.0:
    //   SELECT md5_number_lower(s) & 4294967295, md5_number_lower(s)
    val expected = Seq(
      ("hello", 2443014585L, java.lang.Long.parseUnsignedLong("10575884659879408057")),
      ("abc", 2101319382L, java.lang.Long.parseUnsignedLong("8250560606382298838")),
      ("", 2550759657L, java.lang.Long.parseUnsignedLong("9098107892288553193")),
      ("1", 2588986381L, java.lang.Long.parseUnsignedLong("11206210894995442701")),
      ("héllo wörld", 2253486130L, java.lang.Long.parseUnsignedLong("4071543494652557362")),
      ("42.5", 2633199707L, java.lang.Long.parseUnsignedLong("8987335677875286107")))
    for ((s, lo32, lo64) <- expected) {
      assert(MinHash.md5Low32(s) == lo32, s"md5Low32($s)")
      assert(MinHash.md5Low64(s) == lo64, s"md5Low64($s)")
    }
  }

  test("digest shape and range") {
    val d = MinHash.sketch(Seq("a", "b", "c"))
    assert(d.length == MinHash.NumPerm)
    assert(d.forall(v => v >= 0 && v <= MinHash.MaxHash))
  }

  test("sketch is set-semantics (duplicates don't change digest)") {
    val d1 = MinHash.sketch(Seq("a", "b", "c"))
    val d2 = MinHash.sketch(Seq("a", "a", "b", "b", "c", "c", "c"))
    assert(d1.sameElements(d2))
  }

  test("identical sets give jaccard 1, disjoint sets give ~0") {
    val a = MinHash.sketch((1 to 200).map("x" + _))
    val b = MinHash.sketch((1 to 200).map("x" + _))
    val c = MinHash.sketch((1 to 200).map("y" + _))
    assert(MinHash.jaccard(a, b) == 1.0)
    assert(MinHash.jaccard(a, c) < 0.15)
  }

  test("merge equals sketch of union") {
    val a = MinHash.sketch((1 to 100).map("v" + _))
    val b = MinHash.sketch((50 to 150).map("v" + _))
    val u = MinHash.sketch((1 to 150).map("v" + _))
    val merged = MinHash.mergeInto(a.clone(), b)
    assert(merged.sameElements(u))
  }

  test("merge is commutative and associative (randomized property)") {
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 50) {
      def randSet() = Seq.fill(rng.nextInt(30))(rng.nextInt(100).toString)
      val (xs, ys, zs) = (randSet(), randSet(), randSet())
      val (a, b, c) = (MinHash.sketch(xs), MinHash.sketch(ys), MinHash.sketch(zs))
      val ab_c = MinHash.mergeInto(MinHash.mergeInto(a.clone(), b), c)
      val a_bc = MinHash.mergeInto(a.clone(), MinHash.mergeInto(b.clone(), c))
      val ba = MinHash.mergeInto(b.clone(), a)
      assert(ab_c.sameElements(a_bc))
      assert(MinHash.mergeInto(a.clone(), b).sameElements(ba))
      // merge == sketch of union
      assert(MinHash.mergeInto(a.clone(), b).sameElements(MinHash.sketch(xs ++ ys)))
    }
  }

  test("jaccard estimate within tolerance of true jaccard") {
    // |A| = 1000, |B| = 1000, overlap 500 => true J = 500/1500 = 1/3
    val a = MinHash.sketch((1 to 1000).map("k" + _))
    val b = MinHash.sketch((501 to 1500).map("k" + _))
    val est = MinHash.jaccard(a, b)
    // std err ~ sqrt(J(1-J)/100) ~ 0.047; allow 3 sigma
    assert(math.abs(est - 1.0 / 3.0) < 0.15, s"estimate $est too far from 1/3")
  }

  test("containment estimator sane") {
    // A subset of B: containment(A in B) should be near 1
    val a = MinHash.sketch((1 to 300).map("k" + _))
    val b = MinHash.sketch((1 to 1200).map("k" + _))
    val j = MinHash.jaccard(a, b) // true 300/1200 = .25
    val c = MinHash.containment(j, 300, 1200)
    // J est std err ~ sqrt(.25*.75/100) ≈ .043 → containment noise ~.17
    assert(c > 0.6, s"containment $c should be near 1")
  }

  test("different seeds give different perms") {
    val d0 = MinHash.sketch(Seq("a", "b"), seed = 0)
    val d1 = MinHash.sketch(Seq("a", "b"), seed = 1)
    assert(!d0.sameElements(d1))
  }
}

class SimHashSpec extends AnyFunSuite {
  test("identical token streams -> identical simhash") {
    assert(SimHash.simhash(Seq("a", "b", "c")) == SimHash.simhash(Seq("a", "b", "c")))
  }
  test("near-identical docs -> small hamming distance; unrelated -> large") {
    val base = (1 to 200).map("tok" + _)
    val near = base.updated(5, "changed")
    val far = (1 to 200).map("other" + _)
    val d1 = SimHash.hammingDistance(SimHash.simhash(base), SimHash.simhash(near))
    val d2 = SimHash.hammingDistance(SimHash.simhash(base), SimHash.simhash(far))
    assert(d1 < 12, s"near docs hamming $d1")
    assert(d2 > 20, s"far docs hamming $d2")
  }
}

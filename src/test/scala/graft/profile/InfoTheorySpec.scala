package graft.profile

import graft.SparkSpec

class InfoTheorySpec extends SparkSpec {
  import spark.implicits._

  private val EPS = 1e-4 // micro-nat quantization + 6-dp ln rounding

  test("entropy: uniform ln(k), constant 0, key-like ln(n)") {
    val df = (0 until 64).map(i => (i, i % 4, 7)).toDF("id", "quad", "const")
    val h = InfoTheory.columnEntropy(df, Seq("id", "quad", "const"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(math.abs(h("id").getAs[Double]("entropy") - math.log(64)) < EPS)
    assert(h("id").getAs[Long]("n_distinct") == 64L)
    assert(math.abs(h("quad").getAs[Double]("entropy") - math.log(4)) < EPS)
    assert(h("const").getAs[Double]("entropy") == 0.0)
    assert(h("const").getAs[Long]("n_rows") == 64L)
  }

  test("MI: identical columns give mi = h and nmi = 1") {
    val df = (0 until 60).map(i => (i % 3, i % 3)).toDF("a", "b")
    val r = InfoTheory.mutualInformation(df, "a", "b").collect().head
    val hA = r.getAs[Double]("h_a")
    assert(math.abs(hA - math.log(3)) < EPS)
    assert(math.abs(r.getAs[Double]("mi") - hA) < EPS)
    assert(math.abs(r.getAs[Double]("nmi") - 1.0) < EPS)
  }

  test("MI: independent columns give mi ~ 0") {
    // i%2 and i%3 are independent over a full 6-cycle
    val df = (0 until 60).map(i => (i % 2, i % 3)).toDF("a", "b")
    val r = InfoTheory.mutualInformation(df, "a", "b").collect().head
    assert(math.abs(r.getAs[Double]("mi")) < EPS)
    assert(math.abs(r.getAs[Double]("nmi")) < EPS)
  }

  test("MI against a constant column is 0 with nmi pinned to 0") {
    val df = (0 until 20).map(i => (i % 4, 1)).toDF("a", "b")
    val r = InfoTheory.mutualInformation(df, "a", "b").collect().head
    assert(r.getAs[Double]("h_b") == 0.0)
    assert(r.getAs[Double]("mi") == 0.0)
    assert(r.getAs[Double]("nmi") == 0.0)
  }

  test("fdScan: exact FD scores 0, violations score the removal fraction") {
    // id → grp exact; grp → flag holds except one violating row of 10
    val df = Seq(
      (1, "a", "x"), (2, "a", "x"), (3, "a", "x"), (4, "a", "x"), (5, "a", "y"),
      (6, "b", "z"), (7, "b", "z"), (8, "b", "z"), (9, "b", "z"), (10, "b", "z")
    ).toDF("id", "grp", "flag")
    val out = InfoTheory.fdScan(df, Seq("id", "grp", "flag"), epsilon = 0.15)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out(("id", "grp")).getAs[Double]("g3_error") == 0.0)
    assert(out(("id", "grp")).getAs[Boolean]("holds"))
    assert(out(("id", "grp")).getAs[Long]("n_lhs_groups") == 10L)
    // grp→flag: keep max per grp = 4 ('x') + 5 ('z') = 9 → error 0.1
    assert(out(("grp", "flag")).getAs[Double]("g3_error") == 0.1)
    assert(out(("grp", "flag")).getAs[Boolean]("holds")) // 0.1 <= 0.15
    // flag→grp: 'x'(4)+'y'(1)+'z'(5) all single-grp → exact
    assert(out(("flag", "grp")).getAs[Double]("g3_error") == 0.0)
    // grp→id: max 1 per grp → error 1 - 2/10 = 0.8
    assert(out(("grp", "id")).getAs[Double]("g3_error") == 0.8)
    assert(!out(("grp", "id")).getAs[Boolean]("holds"))
    assert(out.size == 6)
  }

  test("keyDiscovery: singles and pairs, exact uniqueness, null rows count") {
    val df = Seq[(Integer, String)]((1, "x"), (2, "x"), (2, "y"), (null, "y"))
      .toDF("a", "b")
    val out = InfoTheory.keyDiscovery(df, Seq("a", "b"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.size == 3) // a, b, a+b
    assert(out("a").getAs[Long]("n_distinct") == 3L) // 1, 2, null
    assert(out("a").getAs[Double]("uniqueness") == 0.75)
    assert(!out("a").getAs[Boolean]("is_key"))
    assert(out("b").getAs[Long]("n_distinct") == 2L)
    assert(out("a+b").getAs[Long]("n_distinct") == 4L)
    assert(out("a+b").getAs[Boolean]("is_key"))
  }

  test("indScan: FK fully contained in PK scores 1.0, reverse is partial") {
    val pk = (1 to 10).map(i => i).toDF("id")
    val fk = Seq(1, 2, 3, 1, 2).toDF("ref") // 3 distinct, all in pk
    val out = InfoTheory.indScan(
      Seq(("dim", pk, "id"), ("fact", fk, "ref")), minContainment = 0.0)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val fwd = out(("fact.ref", "dim.id"))
    assert(fwd.getAs[Long]("n_src") == 3L)
    assert(fwd.getAs[Long]("n_common") == 3L)
    assert(fwd.getAs[Double]("containment") == 1.0)
    assert(out(("dim.id", "fact.ref")).getAs[Double]("containment") == 0.3)
    // threshold filters the weak direction
    val strict = InfoTheory.indScan(
      Seq(("dim", pk, "id"), ("fact", fk, "ref")), minContainment = 0.95)
      .collect()
    assert(strict.length == 1 && strict.head.getString(0) == "fact.ref")
  }

  test("nulls count as a value") {
    val df = Seq[(Integer, Integer)]((1, 1), (null, 1), (null, 1), (2, 1))
      .toDF("a", "b")
    val h = InfoTheory.columnEntropy(df, Seq("a")).collect().head
    assert(h.getAs[Long]("n_distinct") == 3L) // 1, 2, null
    // p = (1/4, 1/4, 1/2) → H = 1.5 ln 2... in nats: 0.25ln4+0.25ln4+0.5ln2
    val expected = 0.5 * math.log(4) + 0.5 * math.log(2)
    assert(math.abs(h.getAs[Double]("entropy") - expected) < EPS)
  }
}

package graft.operators

import graft.SparkSpec

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // (zip, age) quasi-identifiers; disease sensitive
  private def table = Seq(
    ("10001", 30, "flu"), ("10001", 30, "flu"), ("10001", 30, "cold"),
    ("10002", 40, "flu"), ("10002", 40, "flu"),
    ("10003", 50, "cancer") // singleton, l-diversity 1
  ).toDF("zip", "age", "disease")

  test("equivalence classes carry size and sensitive-value diversity") {
    val cls = Privacy.equivalenceClasses(table, Seq("zip", "age"), "disease")
      .collect().map(r => (r.getString(0),
        r.getAs[Long]("class_size"), r.getAs[Long]("l_diversity"))).toSet
    assert(cls == Set(("10001", 3L, 2L), ("10002", 2L, 1L), ("10003", 1L, 1L)))
  }

  test("report: k-anonymity is the min class size; rows below k counted") {
    val r = Privacy.kAnonymityReport(table, Seq("zip", "age"), "disease", k = 3)
      .collect().head
    assert(r.getAs[Long]("n_rows") == 6L)
    assert(r.getAs[Long]("n_classes") == 3L)
    assert(r.getAs[Long]("k_anonymity") == 1L)
    assert(r.getAs[Long]("n_singletons") == 1L)
    assert(r.getAs[Long]("rows_below_k") == 3L) // the 2-class + the 1-class
    assert(r.getAs[Double]("share_below_k") == 0.5)
    assert(r.getAs[Long]("min_l_diversity") == 1L)
  }
}

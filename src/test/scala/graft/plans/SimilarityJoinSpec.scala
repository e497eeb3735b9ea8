package graft.plans

import graft.SparkSpec
import graft.functions.SketchFunctions._
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class SimilarityJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again today"),
    (3L, "the quick brown fox jumps over the lazy dog again and again tonight"),
    (4L, "completely different content about spark sql engines and columnar formats"),
    (5L, "yet another unrelated string with its own vocabulary entirely")
  ).toDF("doc_id", "text")

  private def naiveJoin() = {
    val sk = Dedup.docSketches(docs)
    val a = sk.select(col("doc_id").as("id_a"), col("mh").as("mh_a"))
    val b = sk.select(col("doc_id").as("id_b"), col("mh").as("mh_b"))
    a.crossJoin(b)
      .filter(minhash_jaccard(col("mh_a"), col("mh_b")) >= 0.5 && col("id_a") < col("id_b"))
      .select("id_a", "id_b")
  }

  test("rule rewrites jaccard-threshold cross join to banded equi-join, same results") {
    // expected without the rule
    spark.experimental.extraOptimizations = Nil
    val expected = naiveJoin().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.contains((1L, 2L)))
    // with the rule installed
    spark.experimental.extraOptimizations = Seq(SimilarityJoinRewrite())
    try {
      val df = naiveJoin()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
        s"expected banded equi-join, got:\n$plan")
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"got $got expected $expected")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("native minhash_jaccard matches core estimator") {
    val a = graft.core.MinHash.sketch((1 to 300).map("x" + _))
    val b = graft.core.MinHash.sketch((151 to 450).map("x" + _))
    val df = Seq((a, b)).toDF("a", "b")
    val j = df.select(minhash_jaccard(col("a"), col("b"))).collect()(0).getDouble(0)
    assert(j == graft.core.MinHash.jaccard(a, b))
  }

  test("rule leaves sub-threshold and non-similarity joins untouched") {
    spark.experimental.extraOptimizations = Seq(SimilarityJoinRewrite())
    try {
      val sk = Dedup.docSketches(docs)
      val a = sk.select(col("doc_id").as("id_a"), col("mh").as("mh_a"))
      val b = sk.select(col("doc_id").as("id_b"), col("mh").as("mh_b"))
      // threshold below minJaccard -> untouched (still a nested-loop join)
      val low = a.crossJoin(b)
        .filter(minhash_jaccard(col("mh_a"), col("mh_b")) >= 0.01)
      val planLow = low.queryExecution.executedPlan.toString
      assert(planLow.contains("CartesianProduct") || planLow.contains("BroadcastNestedLoop"))
      // equi-join untouched and correct
      val eq = a.join(b, col("id_a") === col("id_b")).count()
      assert(eq == 5)
    } finally spark.experimental.extraOptimizations = Nil
  }
}

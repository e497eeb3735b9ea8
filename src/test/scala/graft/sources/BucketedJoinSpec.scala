package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join with ZERO exchanges (co-located SMJ)") {
    val facts = (1 to 2000).map(i => (i.toLong % 97, s"f$i")).toDF("k", "payload")
    val dims = (0L to 96L).map(i => (i, s"d$i")).toDF("k", "attr")
    Bucketing.writeBucketed(facts, "b_facts", "k", nBuckets = 8)
    Bucketing.writeBucketed(dims, "b_dims", "k", nBuckets = 8)
    // force SMJ so the assertion is about bucketing, not broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_facts", "b_dims", "k", "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"expected shuffle-free plan, got:\n$plan")
      assert(joined.count() == 2000)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("aggregation on the bucket key is also shuffle-free") {
    val agg = spark.table("b_facts").groupBy("k").agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), s"plan:\n$plan")
    assert(agg.count() == 97)
  }
}
